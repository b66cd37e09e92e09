"""As-of and range/interval joins (SURVEY §2.3 J7).

Spark has no native ASOF JOIN; a per-group ``pd.merge_asof`` would drag
the big side through Python. Instead:

- ``asof_join``: the union + last(..., ignoreNulls) window pattern —
  tag both sides, union, one window sort per partition key, carry the
  latest right-side values forward onto left rows. One shuffle on the
  partition keys, all JVM-side, scales to any size on both sides.
- ``range_join``: interval join via coarse-bucket equi-join + residual
  filter. Without the bucket key, a non-equi join is a nested-loop —
  fine when one side broadcasts, quadratic otherwise. Bucketing turns
  it into a standard shuffle-hash/sort-merge equi-join on
  (keys..., bucket), which survives the 100× scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    partition_keys: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with ts <= left ts
    (backward; ``forward`` = earliest right row with ts >= left ts).

    Left columns are all preserved; ``value_cols`` arrive from the right
    side (null when no right row qualifies).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)

    l_tag = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    for c in value_cols:
        l_tag = l_tag.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    left_cols = [c for c in left.columns]
    r_tag = right.select(
        *partition_keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *value_cols,
    )
    for c in left_cols:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tag.select(*left_cols, "_ts", "_side", *value_cols).unionByName(
        r_tag.select(*left_cols, "_ts", "_side", *value_cols)
    )

    if direction == "backward":
        # right rows (_side=0) sort before left rows at equal ts → `<=` semantics
        w = (
            Window.partitionBy(*partition_keys)
            .orderBy(F.col("_ts").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = unioned.select(
            *left_cols,
            "_side",
            *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
        )
    else:
        w = (
            Window.partitionBy(*partition_keys)
            .orderBy(F.col("_ts").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = unioned.select(
            *left_cols,
            "_side",
            *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
        )
    return filled.filter(F.col("_side") == 1).drop("_side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    range_start: str,
    range_end: str,
    bucket_width_expr: str | None = None,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """left.point ∈ [right.start, right.end) interval join.

    With ``bucket_width_expr`` (a SQL interval/numeric literal, e.g.
    ``"3600"`` seconds), both sides get coarse bucket keys and join on
    bucket equality first — the scalable path. Intervals spanning
    multiple buckets are exploded on the right side (sequence()), which
    assumes bounded interval width; pick the bucket ≥ max interval width
    to keep the explode factor ≤ 2.
    """
    extra_keys = extra_keys or []
    residual = (F.col(point_col) >= F.col(range_start)) & (F.col(point_col) < F.col(range_end))
    eq = [left[k] == right[k] for k in extra_keys]
    if bucket_width_expr is None:
        cond = residual
        for e in eq:
            cond = cond & e
        return left.join(right, cond)

    wexpr = F.expr(bucket_width_expr).cast("long")
    lb = left.withColumn("_bkt", (F.unix_timestamp(point_col) / wexpr).cast("long"))
    rb = right.withColumn(
        "_bkts",
        F.sequence(
            (F.unix_timestamp(range_start) / wexpr).cast("long"),
            ((F.unix_timestamp(range_end) - 1) / wexpr).cast("long"),
        ),
    ).withColumn("_bkt", F.explode("_bkts")).drop("_bkts")
    cond = lb["_bkt"] == rb["_bkt"]
    for k in extra_keys:
        cond = cond & (lb[k] == rb[k])
    return lb.join(rb, cond & residual).drop("_bkt")
