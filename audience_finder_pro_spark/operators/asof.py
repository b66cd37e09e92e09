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
from pyspark.sql.types import StructField, StructType


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
    (backward; ``forward`` = earliest right row with ts >= left ts;
    ``nearest`` = whichever of the two is closer in time, ties backward —
    pandas merge_asof's direction semantics).

    Left columns are all preserved; ``value_cols`` arrive from the right
    side (null when no right row qualifies).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(direction)
    reserved = {"_ts", "_side", "_vals", "_rts"}
    clash = (
        (reserved & set(left.columns))
        | (reserved & set(right.columns))
        | (reserved & set(value_cols))
    )
    if clash:
        raise ValueError(f"asof_join: input columns clash with reserved names {sorted(clash)}")

    # Pack value_cols into ONE struct carried whole: per-column
    # last(ignorenulls) would mix columns from different right rows when a
    # right row holds NULL in some value col — merge_asof/ASOF semantics
    # are whole-row. The matched right timestamp rides inside the struct
    # (_rts) so 'nearest' can compare the two candidates' distances.
    vstruct = StructType(
        [
            StructField("_rts", right.schema[right_ts].dataType),
            *[StructField(c, right.schema[c].dataType) for c in value_cols],
        ]
    )
    left_cols = [c for c in left.columns]
    out_left = [c for c in left_cols if c not in value_cols]

    l_tag = left.select(
        *left_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(vstruct).alias("_vals"),
    )
    r_tag = right.select(
        *partition_keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(F.col(right_ts).alias("_rts"), *value_cols).alias("_vals"),
    )
    for c in left_cols:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    cols = [*left_cols, "_ts", "_side", "_vals"]
    unioned = l_tag.select(*cols).unionByName(r_tag.select(*cols))

    def fill(order):
        # right rows (_side=0) sort before left rows at equal ts → inclusive
        w = (
            Window.partitionBy(*partition_keys)
            .orderBy(order, F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return F.last("_vals", ignorenulls=True).over(w)

    if direction != "nearest":
        order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
        filled = unioned.select(*left_cols, "_side", fill(order).alias("_vals"))
        return filled.filter(F.col("_side") == 1).select(
            *out_left, *[F.col("_vals")[c].alias(c) for c in value_cols]
        )

    # nearest: both directional fills in one pass (same partition exchange,
    # two in-partition sorts), then choose the closer candidate per row
    filled = unioned.select(
        *left_cols,
        "_side",
        "_ts",
        fill(F.col("_ts").asc()).alias("_b"),
        fill(F.col("_ts").desc()).alias("_f"),
    ).filter(F.col("_side") == 1)
    d_b = F.col("_ts").cast("double") - F.col("_b")["_rts"].cast("double")
    d_f = F.col("_f")["_rts"].cast("double") - F.col("_ts").cast("double")
    chosen = (
        F.when(F.col("_f").isNull(), F.col("_b"))
        .when(F.col("_b").isNull(), F.col("_f"))
        .when(d_b <= d_f, F.col("_b"))  # tie → backward, pandas convention
        .otherwise(F.col("_f"))
    )
    return filled.select(
        *out_left, *[chosen[c].alias(c) for c in value_cols]
    )


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

    # Fractional-epoch bucketing: cast(timestamp as double) keeps sub-second
    # precision (unix_timestamp truncates to seconds) and floor() rounds
    # toward -inf (cast('long') truncates toward zero, wrong pre-1970).
    # Last right bucket = ceil(end/w)-1: the greatest bucket containing any
    # point < end, whether or not end lies on a bucket boundary. greatest()
    # keeps the sequence ascending for empty/degenerate intervals.
    wexpr = F.expr(bucket_width_expr).cast("double")
    lb = left.withColumn("_bkt", F.floor(F.col(point_col).cast("double") / wexpr))
    start_bkt = F.floor(F.col(range_start).cast("double") / wexpr)
    end_bkt = F.greatest(F.ceil(F.col(range_end).cast("double") / wexpr) - 1, start_bkt)
    rb = right.withColumn("_bkts", F.sequence(start_bkt, end_bkt)).withColumn(
        "_bkt", F.explode("_bkts")
    ).drop("_bkts")
    cond = lb["_bkt"] == rb["_bkt"]
    for k in extra_keys:
        cond = cond & (lb[k] == rb[k])
    return lb.join(rb, cond & residual).drop("_bkt")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str] | None,
    bucket_width: int,
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Interval OVERLAP join (E77): every (left, right) pair of
    half-open integer intervals [s, e) with max(s_l, s_r) < min(e_l,
    e_r) — the interval×interval complement of `range_join`'s
    point-in-interval probe (concurrent sessions, overlapping
    maintenance windows, co-active experiments). A non-equi overlap
    join is a nested loop unless one side broadcasts; the scalable form
    replicates each interval to the fixed-width buckets it covers and
    equi-joins on (keys..., bucket), turning it into a standard
    shuffle-hash/sort-merge join.

    De-duplication without a second shuffle: an overlapping pair
    co-occurs in every bucket both cover, so the join keeps only the
    bucket equal to ``greatest(floor(s_l/w), floor(s_r/w))`` — the
    first bucket both intervals inhabit (overlap means max(s) <
    min(e), so both sides replicated a copy there) — and each pair
    emits exactly once, with no distinct step.

    Contract: starts/ends are INTEGERS (epoch days/seconds/micros —
    cast dates/timestamps first; integer bucket arithmetic is exact
    cross-engine where fractional epochs are not), intervals are
    half-open, and empty intervals (e <= s) never match.
    ``bucket_width`` is the declared layout model: an interval spanning
    B buckets replicates B times, so pick the width near the TYPICAL
    interval length (replication ≈ 2×) — a long-tail interval still
    joins correctly, it just replicates more.

    Returns left columns suffixed ``suffixes[0]`` + right columns
    suffixed ``suffixes[1]`` (keys unsuffixed, once). Self-joins: pass
    the same frame twice and filter the output on an id ordering."""
    if bucket_width < 1:
        raise ValueError("interval_join needs bucket_width >= 1")
    keys = keys or []

    def prep(df, start, end, suffix):
        out = df
        for c in df.columns:
            if c not in keys:
                out = out.withColumnRenamed(c, c + suffix)
        s, e = F.col(start + suffix).cast("long"), F.col(end + suffix).cast("long")
        return (
            out.filter(e > s)
            .withColumn("_sb" + suffix, F.floor(s / F.lit(bucket_width)))
            .withColumn(
                "_bkt",
                F.explode(
                    F.sequence(
                        F.col("_sb" + suffix),
                        F.floor((e - 1) / F.lit(bucket_width)),
                    )
                ),
            )
        )

    lb = prep(left, left_start, left_end, suffixes[0])
    rb = prep(right, right_start, right_end, suffixes[1])
    sl, el = F.col(left_start + suffixes[0]), F.col(left_end + suffixes[0])
    sr, er = F.col(right_start + suffixes[1]), F.col(right_end + suffixes[1])
    joined = lb.join(rb, [*keys, "_bkt"]).filter(
        (F.greatest(sl, sr) < F.least(el, er))
        & (
            F.col("_bkt")
            == F.greatest(
                F.col("_sb" + suffixes[0]), F.col("_sb" + suffixes[1])
            )
        )
    )
    return joined.drop("_bkt", "_sb" + suffixes[0], "_sb" + suffixes[1])
