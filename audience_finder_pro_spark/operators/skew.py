"""Skew-resistant aggregation (SURVEY §4.3 / 100 TB discipline).

A plain ``groupBy(keys)`` hash-partitions rows by key: at 100 TB a hot
key (one returnflag value, one mega-community) lands its entire row
volume on a single reducer. Salting splits each key into ``salt``
synthetic sub-keys, aggregates the sub-groups in parallel, then merges
the (tiny) per-sub-key partials — two shuffles, but the first one is
uniform by construction.

Only algebraic aggregates decompose this way (sum/count/min/max, and
avg as sum÷count); holistic ones (exact median, collect_set of huge
sets) need different machinery. Spark's own AQE skew-join splitting
covers *joins*; this operator covers *aggregation* skew, which AQE does
not rebalance (SPARK-35725 tracks it).

The result is bit-identical to the unsalted groupBy for integer/long
aggregates, and equal up to float-summation reassociation otherwise —
the engine's canonicalization (round 4 dp) absorbs that, so the
operator IS DuckDB-oracle-checkable against the plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (partial agg on salted groups, final merge of partials)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs`` maps output column name → (input column, fn) with fn in
    {sum, count, min, max, avg}; ``'*'`` as input column with fn=count
    counts rows. avg decomposes into sum+count partials.
    """
    plan: dict[str, tuple[str, str]] = {}
    finals: list = []
    for out, (col, fn) in aggs.items():
        if fn == "avg":
            plan[f"__{out}_sum"] = (col, "sum")
            plan[f"__{out}_cnt"] = (col, "count")
            finals.append((F.col(f"__{out}_sum") / F.col(f"__{out}_cnt")).alias(out))
        elif fn in _ALGEBRAIC:
            plan[f"__{out}"] = (col, fn)
            finals.append(F.col(f"__{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")

    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt)))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _ALGEBRAIC[fn][0](F.lit(1) if col == "*" else F.col(col)).alias(name)
            for name, (col, fn) in plan.items()
        ]
    )
    merged = partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](F.col(name)).alias(name)
            for name, (col, fn) in plan.items()
        ]
    )
    return merged.select(*keys, *finals)


def exact_group_quantiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    qs: list[float],
) -> DataFrame:
    """Exact per-key discrete quantiles WITHOUT sorting any key's rows
    onto one task (E50) — the holistic-aggregate machinery the
    ``salted_agg`` docstring declares out of algebraic scope.

    The naive exact median shuffles every row of a key to one reducer
    and sorts — the hot-key death at 100 TB. This form never moves raw
    rows: (1) ONE map-side-combined count per (keys, value) — the wire
    carries the DISTINCT-VALUE frame, bounded by |keys x distinct
    values|, not row volume; (2) a per-key cumulative window over that
    frame (a 50-row window per key for a 1-50 discrete measure, however
    many billions of rows back it); (3) per q, the smallest value whose
    cumulative count reaches the target rank.

    Rank rule: ``max(ceil(q*n), 1)`` — pinned empirically to DuckDB's
    ``quantile_disc`` (verified n=4/5 across q=0,.25,.5,.75,.9,1), so
    the operator is hash-gateable against the exact SQL oracle. Use
    exact-binary-fraction q (0.25, 0.5, 0.75...) for cross-engine ceil
    stability; q like 0.9 multiplies inexactly and may ceil differently
    at adversarial n. NULLs are dropped (both engines' aggregate rule).

    Scale contract: exactness costs a frame proportional to DISTINCT
    values per key — the right tool for discrete/low-cardinality
    measures (quantities, ratings, bucketed latencies). For continuous
    measures where every value is distinct, use the mergeable sketch
    tier (operators/incremental histogram_state / kll_state) instead.
    Returns (keys..., q, quantile)."""
    if not qs:
        raise ValueError("exact_group_quantiles needs at least one q")
    if any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in [0, 1]: {qs}")
    from pyspark.sql import Window

    vc = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    wk = Window.partitionBy(*keys)
    cum = vc.withColumn(
        "_cum", F.sum("_c").over(wk.orderBy(value_col).rowsBetween(
            Window.unboundedPreceding, 0))
    ).withColumn("_tot", F.sum("_c").over(wk))
    # ALL quantiles in one pass: a per-q filtered-leg union would rescan
    # the input and rebuild the window once per q — conditional mins over
    # the shared cumulative frame read every q from a single aggregate.
    picked = cum.groupBy(*keys).agg(
        *[
            F.min(
                F.when(
                    F.col("_cum")
                    >= F.greatest(
                        F.ceil(F.lit(float(q)) * F.col("_tot")), F.lit(1)
                    ),
                    F.col(value_col),
                )
            ).alias(f"_q{i}")
            for i, q in enumerate(qs)
        ]
    )
    stack_expr = "stack({n}, {args}) as (q, quantile)".format(
        n=len(qs),
        args=", ".join(
            f"CAST({float(q)} AS DOUBLE), _q{i}" for i, q in enumerate(qs)
        ),
    )
    return picked.select(*keys, F.expr(stack_expr))
