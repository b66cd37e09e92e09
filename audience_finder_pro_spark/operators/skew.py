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

    if "__salt" in df.columns:
        raise ValueError(
            "salted_agg: input already carries a '__salt' column — "
            "rename or drop it before salting"
        )
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


def grouped_mad(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    z_thresh: float = 3.5,
) -> DataFrame:
    """Robust per-key outlier profile via median absolute deviation
    (E55): (keys..., n, median, mad, n_outliers) — the
    Iglewicz-Hoaglin modified z-score rule (|0.6745*(v-median)/MAD| >
    3.5), the outlier detector that, unlike E40's mean/std z-scores,
    a few extreme values cannot drag (median and MAD have 50%
    breakdown; one bad ingest day can't hide itself by inflating the
    baseline it's judged against).

    Built on ``exact_group_quantiles``' two-phase machinery — both
    medians are PICKED VALUES, never float aggregates, and the modified
    z is per-row IEEE arithmetic in a fixed shape, so every count is
    reproducible bit-for-bit by the SQL oracle. Two passes over the
    input (median, then deviation median) by necessity; each shuffles
    only the distinct-value frame, and the per-key model frames join
    back broadcast. Same scale contract as E50: priced by DISTINCT
    values per key. MAD=0 (a majority-constant key) yields
    n_outliers=0 and NULL-free output — the degenerate case is pinned
    in tests, not left to 1/0."""
    v = F.col(value_col)
    clean = df.filter(v.isNotNull())
    spark = df.sparkSession

    def _as_model(frame):
        # the per-key quantile frames are bounded model state (|keys|
        # rows). Left lazy, every downstream branch referencing them
        # re-executes their full upstream scan — collect once and
        # re-plan from the local relation (the IVF-centroid
        # precedent), so the input is scanned exactly 3 times total
        # (median pass, MAD pass, scoring pass — the textbook minimum
        # for exact MAD), not once per plan branch.
        return spark.createDataFrame(frame.collect(), frame.schema)

    med = _as_model(
        exact_group_quantiles(clean, keys, value_col, [0.5]).select(
            *keys, F.col("quantile").alias("_med")
        )
    )
    dev = clean.join(F.broadcast(med), keys).withColumn(
        "_ad", F.abs(v - F.col("_med"))
    )
    mad = _as_model(
        exact_group_quantiles(dev, keys, "_ad", [0.5]).select(
            *keys, F.col("quantile").alias("_mad")
        )
    )
    scored = dev.join(F.broadcast(mad), keys).withColumn(
        "_m",
        F.when(
            F.col("_mad") > 0,
            F.lit(0.6745) * (v - F.col("_med")) / F.col("_mad"),
        ),
    )
    return scored.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("_med"), 4).alias("median"),
        F.round(F.min("_mad"), 4).alias("mad"),
        F.sum(
            F.when(F.abs(F.col("_m")) > F.lit(float(z_thresh)), 1).otherwise(0)
        ).cast("long").alias("n_outliers"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join (E60): salt the BIG side into ``salt``
    synthetic sub-keys and replicate the SMALL side once per salt value,
    joining on (keys + salt) — a hot join key's row volume then spreads
    across ``salt`` reducers by construction instead of landing on one.
    The aggregation-side sibling is ``salted_agg``; together they are
    the manual skew toolkit SURVEY §4.3 calls for.

    Where this sits next to AQE: AQE's skew-join splitting rebalances a
    skewed SortMergeJoin at RUNTIME when a partition crosses its
    thresholds (5× median AND 256 MB by default) — the right default,
    and it is ON in this engine. Salting is the DECLARATIVE form for
    the cases AQE does not cover: shuffled-hash strategies, skew under
    the thresholds that still dominates a stage, bucketed scans where
    the exchange AQE would split never exists, and plans that must be
    reproducible across runs (AQE splits depend on observed sizes).

    Result ≡ the plain join: every big row carries exactly one salt and
    the small side is replicated for EVERY salt, so each big row meets
    each matching small row exactly once. ``how`` is limited to
    inner/left — the replicated small side makes right/full semantics
    ambiguous (an unmatched small row would surface ``salt`` times).

    Scale shape: the big side shuffles once on the uniform (keys, salt)
    — same volume as the plain join's exchange, minus the hot-reducer
    straggler; the small side pays a ``salt``× replication (explode of
    a literal array), the explicit price of uniformity — size salt so
    |small| × salt stays shuffle-friendly."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt < 2:
        raise ValueError("salted_join needs salt >= 2")
    if "__salt" in big.columns or "__salt" in small.columns:
        # withColumn would silently overwrite a caller's column (e.g. a
        # frame that came out of another salted op) and the final drop
        # would destroy it — refuse instead (r11 ADVICE)
        raise ValueError(
            "salted_join: an input already carries a '__salt' column — "
            "rename or drop it before salting"
        )
    keys = [on] if isinstance(on, str) else list(on)
    big_salted = big.withColumn(
        "__salt",
        F.pmod(
            F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt)
        ).cast("int"),
    )
    small_rep = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = big_salted.join(small_rep, keys + ["__salt"], how)
    return joined.drop("__salt")


def weighted_group_quantiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    weight_col: str,
    qs: list[float],
) -> DataFrame:
    """Exact per-key WEIGHTED discrete quantiles, no per-key row sort
    (E61) — ``exact_group_quantiles`` with each row counting
    ``weight_col`` times: "the document length below which half the
    TOKEN MASS sits", "the latency below which 95% of BYTES were
    served" — mixture/packing questions that doc-count quantiles answer
    wrongly when sizes vary by orders of magnitude.

    Same wire shape as E50: ONE map-side-combined weight sum per
    (keys, value) — the DISTINCT-VALUE frame rides the shuffle, never
    rows — then a per-key cumulative window and every q read from one
    conditional aggregate. Rank rule: the smallest value whose
    cumulative weight reaches ``max(ceil(q·W), 1)`` with W the key's
    total weight — the E50 rule generalized (weights of 1 reduce to it
    exactly). Integer weights keep every comparison exact and
    cross-engine deterministic (the gate's oracle replays the identical
    recurrence); use exact-binary-fraction q for ceil stability. NULL
    values and NULL weights are dropped."""
    if not qs:
        raise ValueError("weighted_group_quantiles needs at least one q")
    if any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in [0, 1]: {qs}")
    from pyspark.sql import Window

    vc = (
        df.filter(F.col(value_col).isNotNull() & F.col(weight_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.sum(F.col(weight_col).cast("bigint")).alias("_w"))
    )
    wk = Window.partitionBy(*keys)
    cum = vc.withColumn(
        "_cum",
        F.sum("_w").over(
            wk.orderBy(value_col).rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("_tot", F.sum("_w").over(wk))
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
