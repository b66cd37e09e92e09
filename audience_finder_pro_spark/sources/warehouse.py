"""Bucketed warehouse tables — co-located joins without a shuffle.

The 100 TB join-strategy ladder is: broadcast the small side; else
shuffle both sides (SortMergeJoin); else PRE-shuffle once at write time
and join shuffle-free forever after. This module is that third rung:
``write_bucketed`` persists a DataFrame hash-clustered (and optionally
sorted) on its join key, so every later equi-join between two tables
bucketed the same way on the same key runs with ZERO Exchange on the
bucketed sides — the per-round fact-to-fact join (events×events,
lineitem×orders at matching bucket counts) stops paying the dominant
shuffle entirely. The zero-exchange property is plan-asserted in
tests/test_sources.py, not just claimed.

Spark specifics encoded here:

- Bucketing only exists through the session catalog (``saveAsTable``,
  hive-style layout under spark.sql.warehouse.dir) — ``parquet(path)``
  writes ignore ``bucketBy``.
- Both join sides must have the SAME bucket count (or a divisor — Spark
  4 can coalesce bucket scans, ``spark.sql.bucketing.coalesceBucketsInJoin``)
  and the join keys must cover the bucket spec.
- ``sortBy`` additionally pre-orders within buckets so the SortMergeJoin
  reads sorted runs straight off parquet (no per-task sort at all when
  the sort columns cover the join keys).
- One file per bucket per write task: writers should ``repartition``
  on the bucket key first (done here) so each bucket is a single file —
  unrepartitioned writes emit tasks×buckets small files, the classic
  bucketing foot-gun.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 16,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table hash-bucketed on ``bucket_cols``.

    The pre-write ``repartition`` on the bucket columns makes each
    bucket one file (bucket pruning + co-located joins stay effective;
    without it every write task emits a file per bucket).
    """
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    if isinstance(sort_cols, str):
        sort_cols = [sort_cols]
    writer = (
        df.repartition(n_buckets, *bucket_cols)
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed catalog table (scan reports its bucket spec, which
    is what lets the planner elide the join exchange)."""
    return spark.table(table)


def is_exchange_free_join(joined: DataFrame) -> bool:
    """True iff the physical plan of ``joined`` contains no shuffle
    Exchange — the co-location payoff, used by tests and by callers that
    want to ASSERT a join was bucket-aligned rather than silently pay a
    shuffle (broadcast exchanges don't count: they're not a
    repartitioning of the fact table).

    Call this INSIDE the conf scope you care about: ``executedPlan()``
    derives lazily from the session conf at access time, so e.g.
    restoring autoBroadcastJoinThreshold before inspecting silently
    replans a small join as broadcast and the check passes vacuously."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan and "Exchange rangepartitioning" not in plan
