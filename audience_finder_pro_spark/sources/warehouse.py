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
    path: str | None = None,
) -> None:
    """Persist ``df`` as a catalog table hash-bucketed on ``bucket_cols``.

    The pre-write ``repartition`` on the bucket columns makes each
    bucket one file (bucket pruning + co-located joins stay effective;
    without it every write task emits a file per bucket).

    ``path`` makes it an EXTERNAL table at that location — for callers
    whose session warehouse defaults to a non-writable cwd (the
    ivf_build_index precedent in queries/llm.py).
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
    if path is not None:
        writer = writer.option("path", path)
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


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bounds: dict[str, tuple[float, float]],
    n_bits: int = 10,
    out_col: str = "_zorder",
):
    """Morton (Z-order) interleave key over 2+ numeric columns (E53) —
    the multi-dimensional data-skipping layout bucketing can't give.

    A single-column sort makes parquet min/max stats selective on ONE
    predicate column; a 100 TB table queried by (time AND user), or
    (score AND length), needs file pruning on BOTH. The space-filling
    curve answer: quantize each column to ``n_bits`` levels, interleave
    the bits, and lay the data out in curve order — every file then
    covers a small HYPER-RECTANGLE of the key space, so any conjunctive
    range predicate overlaps few files (the Delta/Iceberg OPTIMIZE
    ZORDER technique, built from plain Spark expressions).

    Quantization is fixed-range ``clamp(floor((v-lo)/(hi-lo)*2^bits))``
    — the E42 histogram rule: ``bounds`` are declared model state
    (derive them from a stats pass and persist alongside the layout).
    Uniform bins degrade on heavy skew; feed pre-transformed columns
    (log, rank) when the raw distribution is pathological. The
    interleave is a pure bit-op expression tree (n_bits x n_cols
    shift/and/or terms), whole-stage-codegen'd, NULLs clamp to bin 0.
    """
    from pyspark.sql import functions as F

    if len(cols) < 2:
        raise ValueError("zorder_key needs >= 2 columns (sort for 1)")
    if not 1 <= n_bits * len(cols) <= 62:
        raise ValueError(f"n_bits={n_bits} x {len(cols)} cols exceeds long range")
    levels = (1 << n_bits) - 1
    bins = []
    for c in cols:
        if c not in bounds:
            raise ValueError(f"zorder_key: no bounds declared for column {c!r}")
        lo, hi = bounds[c]
        if not hi > lo:
            raise ValueError(f"zorder_key: bounds for {c!r} need hi > lo")
        scaled = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(
            float(hi - lo)
        ) * F.lit(float(levels + 1))
        bins.append(
            F.coalesce(
                F.least(F.greatest(F.floor(scaled), F.lit(0)), F.lit(levels)),
                F.lit(0),
            ).cast("long")
        )
    z = F.lit(0).cast("long")
    for b in range(n_bits):
        for i, bin_col in enumerate(bins):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bin_col, b).bitwiseAND(F.lit(1)),
                    b * len(bins) + i,
                )
            )
    return df.withColumn(out_col, z)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bounds: dict[str, tuple[float, float]],
    n_files: int = 32,
    n_bits: int = 10,
) -> None:
    """Write ``df`` laid out along the Z-curve of ``cols``: range-
    partition on the Morton key into ``n_files`` write tasks, sort
    within each, drop the key, write parquet. Each emitted file then
    holds one contiguous curve segment — a bounded box in every
    quantized dimension — which is exactly the min/max footprint
    parquet scan pruning consumes. Effectiveness is measured, not
    assumed: tests/test_sources.py counts per-file bounding boxes
    overlapping a square probe and asserts the curve layout touches a
    fraction of the files a single-column sort does."""
    from pyspark.sql import functions as F

    keyed = zorder_key(df, cols, bounds, n_bits=n_bits)
    (
        keyed.repartitionByRange(n_files, F.col("_zorder"))
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .parquet(path)
    )
