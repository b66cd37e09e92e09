"""Sketch-based corpus profiling — the 100 TB answer to "what's in this
dataset" questions that exact aggregation can't afford.

Per-source profile over the documents table using Spark's built-in
mergeable sketches, all JVM-side and map-side combinable:

- ``approx_count_distinct`` (HyperLogLog++): distinct-token cardinality
  without a (source, token) distinct shuffle — the sketch is ~1.5 KB per
  group at the default 5% rsd, merged associatively, so the exchange
  carries one sketch per (partition, source) instead of the token
  stream. An exact distinct over 100 TB of tokens is a full-corpus
  shuffle; the sketch pass is a single map-side-combined aggregate.
- ``percentile_approx`` (Greenwald-Khanna): doc-length quantiles with a
  bounded-memory mergeable summary, same one-aggregate shape.

Exact companions (row counts, token sums, means) ride the same
aggregate for free. Tolerance contract: HLL++ rsd defaults to 0.05;
tests pin observed error well inside 3×rsd on the fixtures, and the
quantile accuracy parameter bounds rank error by n/accuracy.

No oracle SQL by design — sketch estimates are engine-specific; the
pytest differential compares against EXACT values with the sketch's own
error bound, which is the semantically honest check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audience_finder_pro_spark.functions.text import tokens


def corpus_profile(
    docs: DataFrame,
    by: str = "source",
    text_col: str = "text",
    rsd: float = 0.05,
    quantile_accuracy: int = 10000,
) -> DataFrame:
    """Per-``by``-group corpus profile in ONE exploded aggregate pass.

    Returns (by, n_docs, total_tokens, approx_distinct_tokens,
    p50_doc_chars, p95_doc_chars, avg_doc_tokens). The explode is needed
    only for the distinct-token sketch; per-doc scalars (char length,
    token count) are computed once per doc before the explode and
    first-value'd back out via min/max-stable per-position trickery —
    instead we keep it simple: two branches would re-scan, so the single
    stream carries (group, token, is_first, doc_chars, n_tokens) rows and
    doc-level stats aggregate over the ``is_first`` rows only. One scan,
    one exchange.
    """
    tok = tokens(text_col)
    stream = docs.select(
        F.col(by),
        F.length(F.col(text_col)).alias("doc_chars"),
        F.size(tok).alias("n_tokens"),
        F.posexplode_outer(tok).alias("pos", "token"),
    )
    first = F.col("pos").isNull() | (F.col("pos") == 0)
    return stream.groupBy(by).agg(
        F.sum(F.when(first, 1).otherwise(0)).alias("n_docs"),
        F.sum(F.when(first, F.col("n_tokens")).otherwise(0)).alias("total_tokens"),
        F.approx_count_distinct("token", rsd).alias("approx_distinct_tokens"),
        F.percentile_approx(
            F.when(first, F.col("doc_chars")), 0.5, quantile_accuracy
        ).alias("p50_doc_chars"),
        F.percentile_approx(
            F.when(first, F.col("doc_chars")), 0.95, quantile_accuracy
        ).alias("p95_doc_chars"),
        F.round(
            F.sum(F.when(first, F.col("n_tokens")).otherwise(0))
            / F.sum(F.when(first, 1).otherwise(0)),
            4,
        ).alias("avg_doc_tokens"),
    )


def frequent_tokens(
    docs: DataFrame,
    text_col: str = "text",
    support: float = 0.01,
) -> list[str]:
    """One-pass approximate heavy hitters over the token stream via
    Spark's `freqItems` (Karp-Papadimitriou-Shenker counters — bounded
    memory per partition, mergeable): every token occurring in more
    than ``support`` fraction of token positions is GUARANTEED present
    (possibly with false positives, never false negatives — callers
    needing exactness re-count just the returned candidates, a
    vocabulary-sized second pass instead of a full heavy-hitter
    aggregate).

    This is the sketch companion to ``vocab_topk`` (exact heavy hitters
    via full groupBy): at 100 TB the exact form's shuffle carries the
    combined vocabulary; the KPS pass carries ~1/support counters per
    partition and no token stream at all. Returns the candidate list
    (bounded, driver-side model state).
    """
    from audience_finder_pro_spark.functions.text import tokens

    stream = docs.select(F.explode(tokens(text_col)).alias("token"))
    [row] = stream.stat.freqItems(["token"], support).collect()
    return sorted(row[0])
