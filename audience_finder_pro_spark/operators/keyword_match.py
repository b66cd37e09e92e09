"""Keyword-set × corpus theta-join — the reference's core analytic.

The reference matches a keyword list against post/comment text
row-at-a-time in Python (/root/reference/app.py:96-98 posts,
app.py:132-142 comments). Spark-first re-expression (SURVEY §2.3 J1/J2):

- J1: ``corpus CROSS JOIN broadcast(keywords)`` filtered on
  case-insensitive substring containment → BroadcastNestedLoopJoin.
  The keyword side is tiny (tens of rows) and explicitly broadcast, so
  at 100 TB this is a narrow scan-side map with NO shuffle: each
  executor tests its corpus partition against the in-memory keyword
  table inside codegen.
- J2 (first-match-wins, ref ``break`` at app.py:142): rank keywords by
  their input position and keep row_number()==1 per probe row.
- A3 (all-matches, ref app.py:98 set-comprehension): groupBy probe key +
  collect_set, serialized sorted (canonicalization per app.py:68).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from audience_finder_pro_spark.functions.text import norm_ws


def keyword_theta_join(
    corpus: DataFrame,
    keywords: DataFrame,
    text_col: str = "text",
    kw_col: str = "keyword",
) -> DataFrame:
    """All (row, keyword) pairs where lower(text) contains lower(keyword).

    Keyword side is broadcast — no shuffle of the (huge) corpus side.
    """
    matched = corpus.crossJoin(F.broadcast(keywords))
    return matched.filter(F.contains(F.lower(norm_ws(text_col)), F.lower(F.col(kw_col))))


def first_match_wins(
    pairs: DataFrame,
    probe_key: str,
    order_col: str = "kw_pos",
) -> DataFrame:
    """Keep only the first-matching keyword per probe row (ref app.py:142).

    The reference's semantics depend on Python list order; the engine pins
    it with an explicit keyword-position rank (SURVEY §7.4 quirk 2).
    """
    w = Window.partitionBy(probe_key).orderBy(F.col(order_col).asc())
    return (
        pairs.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def all_matches_expr(text: Column, keywords: list[str]) -> Column:
    """Sorted, comma-joined set of every keyword contained in ``text``
    (case-insensitive) — the plan-time-constant form of J1+A3.

    When the keyword set is known when the plan is built (the reference's
    case: a UI-entered list, app.py:98), the broadcast theta-join +
    groupBy collapses to a pure projection over a literal array: zero
    joins, zero shuffles, evaluated inside whole-stage codegen. Use
    keyword_theta_join + all_matches_agg when keywords are a table.
    """
    kws = F.array(*[F.lit(k) for k in keywords])
    hit = F.filter(kws, lambda k: F.contains(F.lower(text), F.lower(k)))
    return F.array_join(F.array_sort(hit), ", ")


def first_match_expr(text: Column, keywords: list[str]) -> Column:
    """First keyword (in list order) contained in ``text``, else NULL — the
    plan-time-constant form of J1+J2 (ref ``break`` at app.py:142).

    ``coalesce`` evaluates in argument order, which IS first-match-wins;
    no join, no window, no shuffle. Use keyword_theta_join +
    first_match_wins when keywords are a table.
    """
    return F.coalesce(
        *[F.when(F.contains(F.lower(text), F.lower(F.lit(k))), F.lit(k)) for k in keywords],
        F.lit(None).cast("string"),
    )


def all_matches_agg(
    pairs: DataFrame,
    probe_keys: list[str],
    kw_col: str = "keyword",
    out_col: str = "matched_keywords",
) -> DataFrame:
    """Per-probe-row sorted, comma-joined set of every matching keyword.

    Ref builds an (unsorted) set at app.py:98 and joins at app.py:102; the
    engine canonicalizes with array_sort like the ref does for tags at
    app.py:68, so output is deterministic under parallelism.
    """
    return pairs.groupBy(*probe_keys).agg(
        F.array_join(F.array_sort(F.collect_set(kw_col)), ", ").alias(out_col)
    )
