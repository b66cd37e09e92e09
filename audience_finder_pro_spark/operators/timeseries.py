"""Time-series regularization: bucketed rollup with a dense time spine
and forward fill (gap-fill) — the hypertable/`time_bucket_gapfill`
operation Spark has no built-in for.

Monitoring and feature pipelines need "one row per (key, bucket), gaps
filled" before any rolling computation; a plain groupBy silently drops
empty buckets and every downstream moving window is then wrong.

Scale shape (pure DataFrame, zero UDFs):

1. bucketed aggregate — map-side-combined groupBy on (key, bucket);
2. per-key dense spine — min/max bucket per key (rides the same
   aggregate's partitioning) exploded through ``sequence()``: spine
   rows are data-proportional (sum over keys of that key's span), never
   a cartesian of keys × global range — a key active for one hour costs
   one hour of rows even in a year-long table;
3. left join spine ⋈ aggregate on (key, bucket) — shuffle hash join on
   a high-cardinality composite key, AQE-splittable;
4. forward fill — ``last(value, ignorenulls=True)`` over
   (key, ORDER BY bucket, ROWS UNBOUNDED PRECEDING..CURRENT): per-key
   window over high-cardinality keys, no skew concentration; Spark
   evaluates the running last in one pass per partition.

Determinism: bucket boundaries are integer epoch arithmetic; the fill
is a running expression over a total order — same data, same result,
any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(ts: Column | str, step_seconds: int) -> Column:
    """Epoch-aligned bucket start (timestamp) for ``ts``."""
    t = F.col(ts) if isinstance(ts, str) else ts
    epoch = F.unix_timestamp(t)
    return F.timestamp_seconds((epoch - F.pmod(epoch, F.lit(step_seconds))))


def gapfill_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    step_seconds: int = 3600,
    fill: str = "forward",
) -> DataFrame:
    """(key, bucket, n_events, sum_value, filled_sum) with one row per
    key per ``step_seconds`` bucket between that key's first and last
    event — empty buckets present with n_events=0 and, under
    ``fill='forward'``, ``filled_sum`` carrying the last seen sum
    (``fill='zero'`` writes 0.0; ``fill='none'`` leaves NULL)."""
    if fill not in ("forward", "zero", "none"):
        raise ValueError(f"unknown fill mode {fill!r}")
    bucket = time_bucket(ts_col, step_seconds)
    agg = (
        df.select(F.col(key_col).alias("key"), bucket.alias("bucket"), F.col(value_col))
        .groupBy("key", "bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
    )
    spine = (
        agg.groupBy("key")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "key",
            F.explode(
                F.sequence(
                    "lo", "hi", F.expr(f"INTERVAL {int(step_seconds)} SECONDS")
                )
            ).alias("bucket"),
        )
    )
    dense = spine.join(agg, ["key", "bucket"], "left").withColumn(
        "n_events", F.coalesce("n_events", F.lit(0))
    )
    if fill == "forward":
        w = (
            Window.partitionBy("key")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = F.last("sum_value", ignorenulls=True).over(w)
    elif fill == "zero":
        filled = F.coalesce("sum_value", F.lit(0.0))
    else:
        filled = F.col("sum_value")
    return dense.withColumn("filled_sum", filled)


def rolling_anomaly(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    step_seconds: int = 86400,
    window: int = 7,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Rolling z-score anomaly detection over bucketed event counts (E40).

    The monitoring staple on top of a rollup: per key, each bucket's
    event count is scored against the mean/std of the previous
    ``window`` OBSERVED buckets (ROWS frame ``-window .. -1`` — prior
    buckets only, so today's spike can't dilute its own baseline;
    compose with ``gapfill_rollup`` first when empty buckets should
    count as zeros). Buckets whose baseline has fewer than 2 points or
    zero variance get a NULL z (never a division: ±Infinity strings
    don't round-trip identically across engines).

    Scale shape: ONE map-side-combined (key, bucket) count aggregate,
    then ONE pass of per-key windows ordered by bucket — partitions are
    per key and bucket counts are tiny (days per key), so the window
    stage is bounded by distinct keys, not event volume; no join, no
    second scan.

    Determinism (the float-drift rule from NOTES): the rolling
    mean/std are NOT stddev_samp — they are derived from integer
    ``sum`` / ``sum of squares`` window sums (exact in both engines),
    combined in one explicit all-double formula, so Spark and DuckDB
    fold bit-identical doubles; ``z`` is signed, so the rounded value
    carries the ``+ 0.0`` signed-zero normalizer. ``is_anomaly``
    compares the UNROUNDED z — both engines see the same double, same
    verdict. Returns (key, bucket, n, baseline_mean, z, is_anomaly).
    """
    bucketed = (
        df.select(F.col(key_col).alias("key"), time_bucket(ts_col, step_seconds).alias("bucket"))
        .groupBy("key", "bucket")
        .agg(F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(-window, -1)
    )
    s = F.sum("n").over(w).cast("double")
    sq = F.sum(F.col("n") * F.col("n")).over(w).cast("double")
    c = F.count("n").over(w).cast("double")
    mean = s / c
    var = (sq - s * s / c) / (c - 1.0)
    std = F.sqrt(var)
    z = (F.col("n").cast("double") - mean) / std
    ok = (c >= 2.0) & (var > 0.0)
    return bucketed.select(
        "key",
        "bucket",
        "n",
        F.when(ok, F.round(mean, 4)).alias("baseline_mean"),
        F.when(ok, F.round(z, 4) + 0.0).alias("z"),
        F.when(ok & (F.abs(z) > F.lit(z_thresh)), 1)
        .when(ok, 0)
        .alias("is_anomaly"),
    )


def seasonal_decompose(
    series: DataFrame,
    key_col: str = "key",
    bucket_col: str = "bucket",
    value_col: str = "n",
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition (E54) of a DENSE
    per-key integer series: value = trend + seasonal + residual — the
    moving-average STL-lite every metrics pipeline runs on its daily
    counts (is Monday always low, or is today actually anomalous?).
    Feed it ``gapfill_rollup`` output (or any gap-free spine); gaps
    would silently shift the centered window.

    Per (key, bucket): trend is the centered ``period``-wide moving
    average (NULL where the window is incomplete at the edges);
    seasonal is the per-position mean deviation from trend
    (position = 0-based rank within key, mod period); residual is the
    remainder. rank-based positions make the contract purely ordinal —
    no calendar assumptions beyond the spine's own spacing.

    Cross-engine float discipline (the E40 rule): every AGGREGATE here
    is an integer sum — the centered window sum, and the seasonal
    numerator sum of ``period*value - window_sum`` (an integer by
    construction: the detrended deviation scaled by period). Floats
    appear only in per-row divisions of those exact integers, in a
    fixed expression shape, so the DuckDB oracle reproduces every
    trend/seasonal/residual bit before the final round(4). One window
    + one bounded aggregate (keys x period rows) + one broadcast
    join-back; raw rows shuffle once for the window.

    Returns (key_col, bucket_col, pos, value, trend, seasonal,
    residual), trend/seasonal/residual rounded 4dp, NULL where trend
    is undefined."""
    if period < 2 or period % 2 == 0:
        raise ValueError("seasonal_decompose needs an odd period >= 3")
    half = period // 2
    wk = Window.partitionBy(key_col).orderBy(bucket_col)
    w = wk.rowsBetween(-half, half)
    v = F.col(value_col).cast("long")
    base = series.select(
        F.col(key_col),
        F.col(bucket_col),
        v.alias("value"),
        (F.row_number().over(wk) - 1).alias("_rk"),
        F.when(F.count(value_col).over(w) == period, F.sum(v).over(w)).alias(
            "_wsum"
        ),
    ).withColumn("pos", F.col("_rk") % period)
    # integer detrended deviation, scaled by period: period*v - sum_p
    base = base.withColumn(
        "_d", F.lit(period) * F.col("value") - F.col("_wsum")
    )
    seas = base.groupBy(key_col, "pos").agg(
        F.sum("_d").alias("_s_num"),
        (F.lit(period) * F.count("_d")).alias("_s_den"),
    )
    out = base.join(F.broadcast(seas), [key_col, "pos"])
    trend = F.col("_wsum") / F.lit(float(period))
    seasonal = F.when(
        F.col("_s_den") > 0, F.col("_s_num") / F.col("_s_den").cast("double")
    )
    residual = F.col("value") - trend - seasonal
    return out.select(
        key_col,
        bucket_col,
        "pos",
        "value",
        F.round(trend, 4).alias("trend"),
        F.round(seasonal, 4).alias("seasonal"),
        F.round(residual, 4).alias("residual"),
    )


def scd2_history(
    updates: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change log (E76):
    the warehouse staple that turns "every update we ever received for
    this entity" into versioned validity intervals — the table an as-of
    join (J7) probes to answer "what was this user's segment WHEN the
    order happened". Semantics:

    1. Per key, updates order by (ts asc, id asc) — the id breaks
       same-timestamp ties deterministically.
    2. An update that changes NO tracked attribute vs the previous
       surviving update is collapsed (no new version for re-asserted
       values; comparison is null-safe, so NULL→NULL is "unchanged" and
       NULL→value is a change).
    3. Each surviving update opens a version: valid_from = its ts,
       valid_to = the next version's ts (NULL on the current version),
       version = 1-based per key, is_current on the open row.

    Scale shape: two windows over the same (key × ts) ordering — Spark
    plans ONE sort+exchange and runs both window functions in it — and
    nothing else; the log is scanned once. At 100 TB the change log is
    the small derivative of the fact stream, and the output is bounded
    by the number of VALUE CHANGES, not updates. Fully SQL-replayable
    (lag/lead/row_number over the same ordering)."""
    if not attr_cols:
        raise ValueError("scd2_history needs at least one tracked attribute")
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    prev_same = None
    for a in attr_cols:
        same = F.col(a).eqNullSafe(F.lag(a).over(w))
        prev_same = same if prev_same is None else (prev_same & same)
    changed = F.lag(ts_col).over(w).isNull() | ~prev_same
    kept = (
        updates.select(key_col, *attr_cols, ts_col, id_col)
        .withColumn("_chg", changed)
        .filter(F.col("_chg"))
    )
    w2 = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    return kept.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )
