"""Per-group top-k (SURVEY §2.5 W1).

Models the reference's API-delegated top-k scans and Python slices
(/root/reference/app.py:83 ``subreddit.top(limit=k)``, app.py:56,116
``comments.list()[:k]``) as a window rank.

Scale note: row_number over (partitionBy g orderBy keys) is a single
shuffle on g; with AQE skew-join/partition-coalescing a hot group is
split automatically. For global top-k use orderBy(...).limit(k), which
Spark executes as TakeOrderedAndProject (per-partition heap + driver
merge — no full sort, no full shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the top-k rows per group under a total order.

    ``order_cols`` must end in a unique tiebreak key for determinism
    (SURVEY §7.4 canonicalization).
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    ranked = df.withColumn("_rn", F.row_number().over(w))
    out = ranked.filter(F.col("_rn") <= k)
    if rank_col is None:
        return out.drop("_rn")
    return out.withColumnRenamed("_rn", rank_col)
