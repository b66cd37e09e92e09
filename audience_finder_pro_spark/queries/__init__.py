"""Declared query registry — the driver/judge contract surface.

Every implemented operator from SURVEY.md §2 appears here as a named
query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) a DuckDB oracle SQL string producing identical rows,
column names, and values. ``__spark_entry__.py`` re-exports these.

Canonicalization contract (FIXTURES.md §3): every float rounded to 4 dp,
timestamps serialized as strings, arrays sorted before joining, and
column names aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from audience_finder_pro_spark.queries import golden, llm, relational, streaming

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Plans whose construction eagerly materializes localCheckpoint state
# (minhash signatures, the pruned shingle index, CC iterations, the
# quarantined-scan cache). Callers are entitled to free that state via
# caching.free_checkpoint after consuming the result, so these must
# rebuild per invocation — everything else is a pure logical plan and
# gets the prepared-plan treatment below.
_STATEFUL_PLANS = {
    "dedup_minhash_lsh",
    "dedup_simhash",
    "incremental_dedup",
    "corpus_dedup",
    "source_overlap",  # ngram_jaccard_pairs checkpoints the shingle index at build
    "similarity_pagerank",  # rank iterates localCheckpoint at build
    "dedup_ngram_jaccard",
    "dedup_cc_clusters",
    "quarantine_report",
    "split_leakage",  # builds ngram_jaccard_pairs (checkpointed shingle index)
    "dedup_triangles",  # builds ngram_jaccard_pairs (checkpointed shingle index)
    "dedup_kcore",  # jaccard pairs + its own eager peel-sweep checkpoints
    # validate_corpus left this set in r11: the 'leak' leg (and its
    # checkpointed jaccard build) was demoted by the carrier-economics
    # rule, so the carrier is a pure 4-leg plan again
    "doc_communities",  # jaccard pairs + LP's own eager label checkpoints
    # the three below collect bounded model state at BUILD time (sketch
    # frames / quantile frames / PQ codebooks — the IVF-centroid
    # precedent); memoized, passes 2+ would time only the tail of the
    # pipeline and the bench row would be a fiction (the doc_communities
    # 0.018s lesson)
    "audience_overlap",
    "audience_retention",  # collects the per-period sketch state at build
    "diverse_eval_sample",  # collects the greedy k-center sample at build
    "mad_outliers",
    "pq_search",
    "ivfpq_search",
}


def _plan_cached(name: str, fn: QueryFn) -> QueryFn:
    """Prepared-plan cache, keyed per (session, query, sf_dir).

    The reference app caches whole query *results* per input
    (@st.cache_data, app.py:54) — our S8 analogue. This is the weaker,
    always-safe form: repeat invocations of the same declared query on the
    same session and data reuse the analyzed DataFrame instead of paying
    plan reconstruction (measured 0.1–0.5s of driver-side Py4J work per
    build at any SF — pure fixed overhead that would otherwise be paid per
    interactive call). Execution itself is untouched: DataFrames are
    immutable and lazily re-executed per action. The memo lives on the
    session object, so a foreign session (the correctness driver's) starts
    clean and it all dies with the session.
    """

    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        memo = getattr(spark, "_afp_plan_memo", None)
        if memo is None:
            memo = {}
            spark._afp_plan_memo = memo
        key = (name, sf_dir.rstrip("/"))
        if key not in memo:
            memo[key] = fn(spark, sf_dir)
        return memo[key]

    wrapper.__name__ = fn.__name__
    wrapper.__doc__ = fn.__doc__
    wrapper.__wrapped__ = fn  # cache-bypass hook (plan-shape tests)
    return wrapper


def _register(name: str, fn: QueryFn) -> None:
    QUERIES[name] = fn if name in _STATEFUL_PLANS else _plan_cached(name, fn)


# Registration order matters: the driver verifies queries in declaration
# order and may cap how many it checks. Register every oracle-backed query
# first (so each gets a hard rows+schema+hash CORRECTNESS row) and push the
# approximate/no-oracle queries (checked rows-only) to the very end.
_MODULES = (relational, streaming, golden, llm)

for _mod in _MODULES:
    for _name, _fn in _mod.QUERIES.items():
        if _mod.ORACLES.get(_name) is not None:
            _register(_name, _fn)
            ORACLES[_name] = _mod.ORACLES[_name]

for _mod in _MODULES:
    for _name, _fn in _mod.QUERIES.items():
        if _mod.ORACLES.get(_name) is None:
            _register(_name, _fn)

__all__ = ["QUERIES", "ORACLES", "QueryFn"]
