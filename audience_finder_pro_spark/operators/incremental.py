"""Incremental rollup maintenance: mergeable aggregate state (E41).

The daily-maintenance operation of every standing 100 TB pipeline: the
corpus-wide rollup (counts, sums, extrema per key/bucket) must absorb
today's delta WITHOUT rescanning yesterday's petabytes. The classic
answer is an algebraic/commutative-monoid aggregate state — per-group
partials that merge associatively, exactly the shape Spark's own
partial/final aggregation uses inside one job, lifted here across jobs
and days (the same contract as `operators/dedup.incremental_ingest`'s
cross-batch banding, applied to metrics instead of signatures).

The reference recomputes every dashboard count from scratch per request
(app.py:222-258, behind a 1-hour TTL cache); this is the operator that
makes the rollup incremental instead.

The tier's state catalog (every leg streams through the same
foreachBatch state_fn/merge_fn seam, streaming/jobs.py):

| leg | state | merge contract |
|---|---|---|
| E41 rollup_state        | n/sum/min/max (DECIMAL)   | EXACT monoid |
| E42 histogram_state     | integer bin counts        | EXACT monoid |
| E46 distinct_state      | HLL sketch                | bounded (±error; order-sensitive at estimate level — documented) |
| E48 theta_state         | Theta set sketch          | exact below 2^lg_k, bounded past (intersect/difference reads) |
| E51 kll_state           | KLL quantile sketch       | bounded rank error; n exact |
| E59 topk_state          | Misra-Gries counters      | exact below capacity; [w, w+base] containment past |
| E63 decayed_state       | power-of-two-weighted DECIMAL sums | EXACT monoid (ref_date rides the frame) |
| E64 trend_state         | regression sufficient stats | EXACT monoid (origin rides the frame) |
| (op/experiment.py E65)  | per-arm n/Σx/Σx²          | EXACT monoid |

Scale shape:
- `rollup_state` is ONE map-side-combined groupBy over the batch; the
  state frame is bounded by |keys × buckets| — orders of magnitude
  below event volume — and is what gets persisted.
- `merge_rollup_states` unions state frames and re-aggregates with the
  monoid ops (sum/sum/min/max). Merging N daily states shuffles only
  state rows, never raw events; the merge is associative AND
  commutative, so any grouping of days — pairwise, hierarchical,
  out of order — yields the identical frame.

Determinism (the float-sum rule from NOTES): the measure column is
summed as DECIMAL(18,4), never DOUBLE — decimal addition is exact and
order-independent, so incremental-vs-full equality holds bit-for-bit
at any partitioning and any merge order, and the DuckDB oracle (which
sums in one pass over the full table) hash-matches the two-pass merged
state exactly. count/min/max are trivially order-independent; derived
means are presentation-layer (round at read time), never part of the
persisted state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STATE_COLS = ("n", "sum_value", "min_value", "max_value")


def rollup_state(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    decimal_type: str = "decimal(18,4)",
) -> DataFrame:
    """Mergeable per-key aggregate state of one batch: (keys..., n,
    sum_value, min_value, max_value) with the sum carried as exact
    decimal so merge order can never change it.

    Input assumption: ``value_col`` is representable at ``decimal_type``
    scale (<= 4 decimal places by default). The merge-order guarantee is
    unconditional once values ARE decimal, but the initial double→decimal
    cast rounds, and engines may disagree on half-boundary doubles
    (Spark rounds the shortest decimal repr HALF_UP; others round the
    binary value) — e.g. x.00005 can land differently. Pre-round such
    measures identically in every engine before calling, or widen
    ``decimal_type``'s scale past the data's precision."""
    v = F.col(value_col).cast(decimal_type)
    return df.groupBy(*key_cols).agg(
        F.count("*").alias("n"),
        F.sum(v).alias("sum_value"),
        F.min(v).alias("min_value"),
        F.max(v).alias("max_value"),
    )


def merge_rollup_states(states: list[DataFrame]) -> DataFrame:
    """Merge any number of ``rollup_state`` frames into one equivalent
    state — associative and commutative, so daily states can fold in
    any order and still equal the full recompute."""
    if not states:
        raise ValueError("merge_rollup_states needs at least one state frame")
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    key_cols = [c for c in merged.columns if c not in STATE_COLS]
    return merged.groupBy(*key_cols).agg(
        F.sum("n").alias("n"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def histogram_state(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 32,
) -> DataFrame:
    """Mergeable per-key equi-width histogram of one batch (E42):
    (keys..., bin, bin_n) — the distribution-shaped sibling of
    ``rollup_state``. sum/min/max answer point questions; the standing
    100 TB pipeline also needs per-key DISTRIBUTIONS that absorb daily
    deltas — p50/p95 latency per source, quality-score shape per dump —
    without re-scanning history. Fixed integer bin counts are the
    classic mergeable answer (the same state streaming "approximate
    percentile" systems persist): counts are exact integers, merging is
    addition, and any quantile is a cumulative walk over ≤ ``n_bins``
    rows per key.

    Binning: ``bin = clamp(floor((v − lo) / w), 0, n_bins−1)`` with
    ``w = (hi − lo) / n_bins`` — out-of-range values clamp into the edge
    bins (a histogram must absorb anything the delta brings; resolution
    at the edges is the declared trade). NULL values are dropped. The
    per-row computation involves no float aggregation, so the bin id is
    deterministic cross-engine (identical IEEE ops in either engine);
    counts then aggregate exactly. Only (keys × bins) rows persist.

    Empty bins are NOT materialized (the state stays sparse —
    |keys × n_bins| is the upper bound, not the row count);
    ``quantiles_from_state`` treats absent bins as zero.
    """
    if not n_bins > 0:
        raise ValueError("histogram_state needs n_bins >= 1")
    if not hi > lo:
        raise ValueError("histogram_state needs hi > lo")
    w = (hi - lo) / n_bins
    bin_col = F.least(
        F.greatest(
            F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(w)),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    ).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*key_cols, bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("bin_n"))
    )


def merge_histogram_states(states: list[DataFrame]) -> DataFrame:
    """Merge ``histogram_state`` frames: per-(keys, bin) count addition —
    exact, associative, commutative, so any slicing of history yields
    the identical state (the E41 merge contract, on distributions)."""
    if not states:
        raise ValueError("merge_histogram_states needs at least one state frame")
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    key_cols = [c for c in merged.columns if c not in ("bin_n",)]
    return merged.groupBy(*key_cols).agg(F.sum("bin_n").alias("bin_n"))


def distinct_state(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable per-key distinct-count sketch state of one batch (E46):
    (keys..., sketch binary) via Spark's Datasketches HLL aggregate —
    the third leg of the incremental tier (E41 sums/extrema, E42
    distributions, E46 cardinalities). Exact per-key COUNT(DISTINCT) at
    100 TB pays a full expand shuffle EVERY day; the HLL sketch is the
    industry answer: fixed ~2^lg_k-byte state per key, union-mergeable
    across daily deltas, ~1.6% standard error at the default lg_k=12.

    NO SQL oracle by taxonomy (DuckDB's approx sketch is a different
    algorithm) — verified by error-bound, merge-algebra and streaming
    replay tests instead (the minhash/xxhash precedent)."""
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )


def merge_distinct_states(states: list[DataFrame]) -> DataFrame:
    """Union-merge ``distinct_state`` frames. The merge contract is
    BOUNDED, unlike the exact E41/E42 monoids: a fixed merge plan is
    deterministic (same slicing + order → identical result, replayable),
    but DIFFERENT merge orders/groupings may read back slightly
    different estimates (measured ±~1% on a 500-cardinality key —
    Datasketches sketch-mode promotion depends on insertion/merge
    history), all within the sketch's error bound of the true count.
    That is the approximate-sketch trade stated honestly; compare
    states via ``distinct_from_state`` against the bound, never by
    binary equality."""
    if not states:
        raise ValueError("merge_distinct_states needs at least one state frame")
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    key_cols = [c for c in merged.columns if c != "sketch"]
    return merged.groupBy(*key_cols).agg(
        F.hll_union_agg("sketch").alias("sketch")
    )


def distinct_from_state(state: DataFrame) -> DataFrame:
    """Read the per-key cardinality estimates off a (possibly merged)
    sketch state: (keys..., n_distinct)."""
    key_cols = [c for c in state.columns if c != "sketch"]
    return state.select(
        *key_cols, F.hll_sketch_estimate("sketch").alias("n_distinct")
    )


def quantiles_from_state(
    state: DataFrame,
    key_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 32,
) -> DataFrame:
    """Per-key quantile estimates from a (possibly merged) histogram
    state: for each q, the upper edge of the first bin whose cumulative
    count reaches ``q × total`` (the conservative step-CDF read — error
    bounded by one bin width, the histogram's declared resolution).
    One window over ≤ n_bins rows per key + one aggregate; never
    touches raw data. Returns (keys..., q, quantile).

    ``lo``/``hi``/``n_bins`` MUST be the values the state was built
    with — they are the binning model, and the state frame does not
    carry them (persist them alongside it, as any model registry
    would); a mismatch reads back silently wrong edges."""
    w = (hi - lo) / n_bins
    cum = state.withColumn(
        "_cum",
        F.sum("bin_n").over(
            Window.partitionBy(*key_cols).orderBy("bin").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    ).withColumn(
        "_tot", F.sum("bin_n").over(Window.partitionBy(*key_cols))
    )
    legs = [
        cum.filter(F.col("_cum") >= F.lit(q) * F.col("_tot"))
        .groupBy(*key_cols)
        .agg(F.min("bin").alias("_bin"))
        .select(
            *key_cols,
            F.lit(q).alias("q"),
            F.round(F.lit(lo) + (F.col("_bin") + 1) * F.lit(w), 4).alias("quantile"),
        )
        for q in qs
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def psi_from_histogram_states(
    state_a: DataFrame,
    state_b: DataFrame,
    n_bins: int,
    smoothing: float = 0.5,
) -> DataFrame:
    """Population Stability Index between two histogram STATES (E72):
    the standard drift gate a standing ingest runs between reference
    and current windows of every monitored measure — PSI < 0.1 stable,
    < 0.25 moderate, else drifted (the credit-scoring rule of thumb) —
    computed ENTIRELY from the E42 mergeable states: once the per-key
    histograms are maintained incrementally, drift between ANY two
    windows is a read over ≤ keys × n_bins persisted integer rows,
    never a re-scan of either window's raw data. That is the complement
    of `distribution_drift` (op/profile.py), which compares token
    distributions by scanning both corpus slices.

    PSI = Σ_bins (p_b − p_a)·ln(p_b/p_a) over the FULL bin skeleton
    0..n_bins−1 with Jeffreys smoothing p = (cnt + s) / (n + s·n_bins)
    (``smoothing`` = s): absent bins count 0, so a bin present on one
    side only contributes a finite, replayable term instead of ±inf.
    Both states must share key columns and binning geometry (``n_bins``
    is the binning model the state does not carry — the
    quantiles_from_state rule). Returns (keys..., n_a, n_b, psi,
    verdict), psi rounded to 4dp (sums of ≤ n_bins O(1)-magnitude
    terms — far inside round(4) cross-engine).

    Scale shape: one map-side-combined aggregate per side (the states
    are already aggregates; re-keying is a ≤ keys × n_bins frame), one
    join on (key, bin) over those bounded frames, one per-key regroup.
    No raw data is touched."""
    if n_bins < 1:
        raise ValueError("psi_from_histogram_states needs n_bins >= 1")
    if smoothing <= 0:
        raise ValueError(
            "psi_from_histogram_states needs smoothing > 0 (zero bins "
            "would read ln(0))"
        )
    key_cols = [c for c in state_a.columns if c not in ("bin", "bin_n")]
    if key_cols != [c for c in state_b.columns if c not in ("bin", "bin_n")]:
        raise ValueError("psi_from_histogram_states: key columns differ")
    spark = state_a.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    keys = (
        state_a.select(*key_cols)
        .unionByName(state_b.select(*key_cols))
        .distinct()
    )
    skeleton = keys.crossJoin(F.broadcast(bins))
    joined = (
        skeleton.join(
            state_a.withColumnRenamed("bin_n", "_ca"), [*key_cols, "bin"], "left"
        )
        .join(
            state_b.withColumnRenamed("bin_n", "_cb"), [*key_cols, "bin"], "left"
        )
        .select(
            *key_cols,
            "bin",
            F.coalesce("_ca", F.lit(0)).cast("long").alias("_ca"),
            F.coalesce("_cb", F.lit(0)).cast("long").alias("_cb"),
        )
    )
    s = float(smoothing)
    per_key = joined.groupBy(*key_cols).agg(
        F.sum("_ca").alias("n_a"),
        F.sum("_cb").alias("n_b"),
        # bin leads the struct so sort_array gives a CANONICAL fold order
        # (collect_list order is partition-dependent; the psi sum must be
        # bit-deterministic on our side)
        F.sort_array(F.collect_list(F.struct("bin", "_ca", "_cb"))).alias(
            "_cells"
        ),
    )
    # the smoothed shares need the key totals, so the psi sum runs as a
    # second pass over the collected ≤ n_bins cells per key (bounded
    # model state per row, the E42 read discipline) — an expression
    # aggregate, no UDF
    p = lambda c, n: (c.cast("double") + F.lit(s)) / (  # noqa: E731
        n.cast("double") + F.lit(s * n_bins)
    )
    term = lambda cell: (  # noqa: E731
        p(cell["_cb"], F.col("n_b")) - p(cell["_ca"], F.col("n_a"))
    ) * F.log(p(cell["_cb"], F.col("n_b")) / p(cell["_ca"], F.col("n_a")))
    psi = F.round(
        F.aggregate(
            "_cells", F.lit(0.0), lambda acc, cell: acc + term(cell)
        ),
        4,
    )
    return per_key.select(
        *key_cols,
        "n_a",
        "n_b",
        psi.alias("psi"),
        F.when(psi < 0.1, "stable")
        .when(psi < 0.25, "moderate")
        .otherwise("drifted")
        .alias("verdict"),
    )


def theta_state(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Mergeable per-key distinct-SET sketch state of one batch (E48):
    (keys..., sketch binary) via Spark's Datasketches Theta aggregate —
    the set-ALGEBRA leg of the incremental tier. E46's HLL answers "how
    many distinct"; Theta additionally supports INTERSECTION and
    DIFFERENCE between states, the operations audience analysis
    actually asks for ("users who did A and B", "today's audience not
    seen yesterday") that no cardinality-only sketch can answer and
    whose exact form costs a full distinct-expand shuffle per question
    at 100 TB. State size is bounded by ~2^lg_k hashes per key.

    Exactness contract: a Theta sketch is EXACT (it retains every
    distinct hash) while the per-key distinct count stays ≤ 2^lg_k
    nominal entries, and so are intersections/differences of exact
    sketches; past that it samples, and estimates carry the documented
    Datasketches error bound. The declared `audience_overlap` query
    runs in exact mode at every checked SF (≤1,500 users/type vs 2^14);
    the factor-50 stress leg exercises the sampled regime against the
    bound. NO SQL oracle for the state itself by taxonomy (sketch
    binaries are engine-internal) — but exact-mode READS are integers a
    SQL oracle reproduces, which is how `audience_overlap` is gated."""
    return df.groupBy(*key_cols).agg(
        F.theta_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )


def merge_theta_states(states: list[DataFrame], lg_k: int = 14) -> DataFrame:
    """Union-merge ``theta_state`` frames per key. ``lg_k`` bounds the
    MERGED sketch and must be >= the inputs' lg_k to preserve the
    exact-mode contract (a smaller union gate would downsample exact
    inputs — the measured theta_union default-size trap). The default
    matches ``theta_state``'s (both 14, the audience_overlap sizing),
    so states built with defaults merge exactly through the default
    path — r10's default of 12 silently downsampled default-14 inputs,
    the exact trap the docstring warns about (VERDICT r10 fix)."""
    if not states:
        raise ValueError("merge_theta_states needs at least one state frame")
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    key_cols = [c for c in merged.columns if c != "sketch"]
    return merged.groupBy(*key_cols).agg(
        F.theta_union_agg("sketch", F.lit(lg_k)).alias("sketch")
    )


def theta_estimate(state: DataFrame) -> DataFrame:
    """Per-key cardinality read of a (possibly merged) theta state:
    (keys..., n_distinct). Exact while in exact mode (see theta_state)."""
    key_cols = [c for c in state.columns if c != "sketch"]
    return state.select(
        *key_cols,
        F.theta_sketch_estimate("sketch").cast("long").alias("n_distinct"),
    )


def audience_overlap(
    df: DataFrame,
    group_col: str,
    id_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Pairwise audience overlap between groups (E48): for every group
    pair (a < b), the distinct-id counts of each side, their
    intersection, and the Jaccard similarity — the reference's core
    question ("which communities share an audience?", app.py's
    tag-scored discovery loop) asked of distinct user SETS.

    Shape: ONE map-side-combined theta-sketch aggregate over the raw
    events (ids never shuffle as rows — each partition contributes a
    bounded sketch partial), then an all-pairs join of |groups| sketch
    rows (broadcast — group count is small by construction; |groups|^2
    output rows). The exact form of this query is |groups| passes of
    COUNT(DISTINCT) plus a self-join of the (group, user) distinct
    expansion — at 100 TB that self-join alone shuffles the full
    distinct universe; here the wire carries |groups| sketches.

    The union size for Jaccard is read by inclusion-exclusion
    (n_a + n_b - n_overlap), NOT theta_union — union-by-sketch would
    re-gate at the union operator's own nominal size and downsample
    exact inputs (measured: exact 9,000-user union read 8,934 through
    the default gate). All counts are exact integers while every group
    stays <= 2^lg_k distinct ids; the single jaccard division is one
    IEEE op, deterministic cross-engine.

    Past exact mode, INTERSECTION error grows with the union/overlap
    ratio (the Datasketches contract), so size lg_k for the question:
    measured at 2M-id groups with a 10%-of-union overlap, lg_k=12 read
    6.8% off while lg_k=14 read every pair within 1.2% of the smaller
    set (scripts/scale_stress.py leg) — hence the 14 default."""
    return overlap_from_state(theta_state(df, [group_col], id_col, lg_k=lg_k))


def overlap_from_state(state: DataFrame) -> DataFrame:
    """The pairwise read half of ``audience_overlap``, over a (possibly
    merged) single-key ``theta_state`` frame — so a standing pipeline
    can answer overlap questions from persisted daily states without
    touching raw events. Columns: (group_a, group_b, n_a, n_b,
    n_overlap, jaccard) for every key pair a < b."""
    key_cols = [c for c in state.columns if c != "sketch"]
    if len(key_cols) != 1:
        raise ValueError("overlap_from_state needs exactly one key column")
    group_col = key_cols[0]
    # The state frame feeds BOTH sides of the pair join; left lazy, the
    # sketch aggregate's whole upstream plan would execute once per side
    # (the shuffle and broadcast exchanges don't unify under
    # ReuseExchange). The frame is bounded model state — |groups| rows
    # of <= 2^lg_k-byte sketches — so collect it once and re-plan both
    # sides from the local relation (the IVF-centroid precedent): raw
    # data is scanned exactly once however many sides read the state.
    spark = state.sparkSession
    proj = state.select(F.col(group_col).alias("g"), "sketch")
    sk = spark.createDataFrame(proj.collect(), proj.schema)
    a = sk.select(F.col("g").alias("group_a"), F.col("sketch").alias("_sa"))
    b = sk.select(F.col("g").alias("group_b"), F.col("sketch").alias("_sb"))
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    est = F.theta_sketch_estimate
    counted = pairs.select(
        "group_a",
        "group_b",
        est("_sa").cast("long").alias("n_a"),
        est("_sb").cast("long").alias("n_b"),
        est(F.theta_intersection("_sa", "_sb")).cast("long").alias("n_overlap"),
    )
    return counted.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        "n_overlap",
        F.round(
            F.col("n_overlap")
            / (F.col("n_a") + F.col("n_b") - F.col("n_overlap")).cast("double"),
            4,
        ).alias("jaccard"),
    )


def retention_from_state(state: DataFrame) -> DataFrame:
    """Period-over-period audience retention from a per-period
    ``theta_state`` frame (E58): for every period with a predecessor
    present in the state, the new / returning / churned user counts via
    theta set ALGEBRA — ``theta_difference`` (curr\\prev = new,
    prev\\curr = churned) and ``theta_intersection`` (returning). This
    is the weekly audience question the DIFFERENCE read exists for
    ("today's audience not seen yesterday") and the one read no
    cardinality-only sketch (E46's HLL) can answer; its exact form
    costs a full distinct-expand self-join of consecutive periods at
    100 TB, while here consecutive-period pairing happens on the
    bounded state frame (|periods| rows of <= 2^lg_k-byte sketches).

    The state frame is bounded model state, so it is collected once and
    re-planned locally (the overlap_from_state / IVF-centroid
    precedent); the lag-pairing window over |periods| rows is driver-
    scale by construction, never a data-scale single-partition window.

    Exactness: differences/intersections of exact sketches are exact
    (every distinct hash retained below 2^lg_k per period), so at
    fixture cardinalities every count is an integer a SQL
    EXCEPT/INTERSECT oracle reproduces — how the declared
    `audience_retention` query is gated. Columns: (period, prev_period,
    n_prev, n_curr, n_returning, n_new, n_churned)."""
    key_cols = [c for c in state.columns if c != "sketch"]
    if len(key_cols) != 1:
        raise ValueError("retention_from_state needs exactly one period column")
    period = key_cols[0]
    spark = state.sparkSession
    proj = state.select(F.col(period).alias("period"), "sketch")
    local = spark.createDataFrame(proj.collect(), proj.schema)
    w = Window.orderBy("period")
    paired = local.select(
        "period",
        "sketch",
        F.lag("period").over(w).alias("prev_period"),
        F.lag("sketch").over(w).alias("_prev"),
    ).filter(F.col("prev_period").isNotNull())
    est = F.theta_sketch_estimate
    return paired.select(
        "period",
        "prev_period",
        est("_prev").cast("long").alias("n_prev"),
        est("sketch").cast("long").alias("n_curr"),
        est(F.theta_intersection("sketch", "_prev")).cast("long").alias("n_returning"),
        est(F.theta_difference("sketch", "_prev")).cast("long").alias("n_new"),
        est(F.theta_difference("_prev", "sketch")).cast("long").alias("n_churned"),
    )


def audience_retention(
    df: DataFrame,
    time_col: str,
    id_col: str,
    period: str = "week",
    lg_k: int = 14,
) -> DataFrame:
    """Period-over-period new-vs-returning audience (E58): truncate
    ``time_col`` to ``period``, build one theta state per period (ONE
    map-side-combined sketch aggregate — ids never shuffle as rows),
    and read consecutive-period retention via ``retention_from_state``.
    A standing pipeline persists the per-period states and answers this
    from ``retention_from_state`` alone, absorbing each new period
    without rescanning history — the incremental-tier shape of the
    reference's recompute-per-request dashboard loop (app.py:222-258)."""
    bucketed = df.select(
        F.date_trunc(period, F.col(time_col)).cast("date").alias("period"),
        F.col(id_col),
    )
    return retention_from_state(theta_state(bucketed, ["period"], id_col, lg_k=lg_k))


def kll_state(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    k: int = 800,
) -> DataFrame:
    """Mergeable per-key quantile sketch state (E51): (keys..., sketch)
    via Spark's Datasketches KLL aggregate — the UNBOUNDED-range
    complement to E42's equi-width histogram. histogram_state needs a
    declared [lo, hi) binning model up front and clamps outliers into
    edge bins; KLL needs no range at all and bounds RANK error (~0.6%
    at k=800) wherever the distribution lands — the right state when
    tomorrow's delta can shift the support (latency spikes, new score
    regimes). Fixed ~k-value state per key, union-mergeable across
    daily deltas. Values are cast to double (the sketch's element
    type); NULLs are dropped by the aggregate.

    NO SQL oracle by taxonomy (engine-specific sketch binary) —
    verified by rank-error-bound, bounded-merge-algebra and streaming
    replay tests (the E46 precedent). The exact-answer alternative for
    discrete measures is operators/skew.exact_group_quantiles."""
    return df.groupBy(*key_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias(
            "sketch"
        )
    )


def merge_kll_states(states: list[DataFrame], k: int = 800) -> DataFrame:
    """Union-merge ``kll_state`` frames per key. The merge contract is
    BOUNDED, like E46's HLL and unlike the exact E41/E42 monoids: a
    fixed merge plan is replay-deterministic, but different slicings
    may read back slightly different estimates (compaction history
    differs), all within the sketch's rank-error bound — compare via
    ``kll_quantiles_from_state`` against the bound, never by binary
    equality. ``k`` must be >= the inputs' k (the theta lg_k rule)."""
    if not states:
        raise ValueError("merge_kll_states needs at least one state frame")
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    key_cols = [c for c in merged.columns if c != "sketch"]
    return merged.groupBy(*key_cols).agg(
        F.kll_merge_agg_double("sketch", F.lit(k)).alias("sketch")
    )


def kll_quantiles_from_state(
    state: DataFrame,
    qs: list[float],
) -> DataFrame:
    """Per-key quantile reads off a (possibly merged) KLL state:
    (keys..., q, quantile, n) — n is the exact retained-stream count
    (KLL tracks it losslessly, a free sanity column)."""
    if not qs:
        raise ValueError("kll_quantiles_from_state needs at least one q")
    key_cols = [c for c in state.columns if c != "sketch"]
    legs = [
        state.select(
            *key_cols,
            F.lit(float(q)).alias("q"),
            F.kll_sketch_get_quantile_double("sketch", F.lit(float(q))).alias(
                "quantile"
            ),
            F.kll_sketch_get_n_double("sketch").alias("n"),
        )
        for q in qs
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def topk_state(
    df: DataFrame,
    key_cols: list[str],
    item_col: str,
    capacity: int = 64,
) -> DataFrame:
    """Mergeable per-key heavy-hitters state of one batch (E59): the
    Misra-Gries summary — the FOURTH leg of the incremental tier
    (E41 sums/extrema, E42/E51 distributions, E46/E48 cardinalities &
    sets, this one FREQUENT ITEMS: "which domains/tokens/users dominate
    each source", absorbed daily without rescanning history).

    State: (keys..., item, w, base) — at most ``capacity`` item rows
    per key. ``w`` is the Misra-Gries counter, ``base`` the per-key
    accumulated decrement (identical on every row of a key): the true
    batch count of ANY item — present in the state or not — lies in
    ``[w, w + base]`` (absent ⇒ w = 0). The summary is built FROM the
    batch's exact (keys, item) counts (one map-side-combined groupBy —
    the same per-batch aggregate every tier leg pays) by the standard
    reduction: t = (capacity+1)-th largest count (0 when the key has
    ≤ capacity distinct items), keep items with count > t at
    w = count − t, base = t ≤ n_key/(capacity+1). What the tier buys is
    the BOUNDED PERSISTED STATE — capacity rows per key per day instead
    of the unbounded distinct-item frame.

    Degenerate-tie preservation (r11 ADVICE): when every one of a key's
    top capacity+1 counts ties at t, the reduction keeps NO item rows —
    the key-level decrement t would vanish with them and the [w, w+base]
    containment bound silently under-report. Such keys emit a SENTINEL
    row (item NULL, w 0, base t) so the base survives the state and
    every merge; NULL items never collide with data (the build filters
    NULL items on input) and reads skip them.

    Exactness contract (the theta_state precedent): while every key's
    distinct-item count stays ≤ capacity at build AND through every
    merge, base stays 0 and w IS the exact count — which is how the
    declared `heavy_hitters` query is SQL-oracle-gated. Past capacity
    the bounds degrade additively per merge (Agarwal et al. 2013,
    "Mergeable Summaries": merged error ≤ Σ nᵢ/(capacity+1)), asserted
    by the planted sampled-regime tests."""
    if capacity < 1:
        raise ValueError("topk_state needs capacity >= 1")
    counts = (
        df.filter(F.col(item_col).isNotNull())
        .groupBy(*key_cols, F.col(item_col).alias("item"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    w_rank = Window.partitionBy(*key_cols).orderBy(
        F.col("_n").desc(), F.col("item").asc()
    )
    # ONE rank<=capacity+1 filter on the window: the WindowGroupLimit
    # form — each map task pre-truncates its partition to capacity+1
    # rows BEFORE the per-key sort, so a key with a billion distinct
    # items ships n_partitions x (capacity+1) rows to its reducer, never
    # the full distinct-item frame (the same reason op/topk.py exists)
    top_plus = counts.withColumn("_r", F.row_number().over(w_rank)).filter(
        F.col("_r") <= capacity + 1
    )
    # Single-subtree reduction (r13 opt): t (the (capacity+1)-th largest
    # count, 0 if none) and the key's max count come from a SECOND,
    # unordered window over the SAME partitioning — no re-sort, no new
    # exchange — instead of a broadcast self-join + anti-join that
    # re-executed the count aggregate (and its scan) three more times.
    # Every output row then derives from one filter+CASE pass:
    #   kept row  ⟺ _r ≤ capacity AND _n > t       → (item, _n − t, t)
    #   sentinel  ⟺ _r = capacity+1 AND max(_n) = t → (NULL, 0, t)
    # (max(_n) = t means every top capacity+1 count tied at t, i.e. the
    # key kept no item rows — exactly the old anti-join's sentinel set,
    # and at most one row per key can satisfy _r = capacity+1.)
    w_key = Window.partitionBy(*key_cols)
    flagged = top_plus.withColumn(
        "_t", F.max(F.when(F.col("_r") == capacity + 1, F.col("_n"))).over(w_key)
    ).withColumn("_mx", F.max("_n").over(w_key))
    item_type = counts.schema["item"].dataType
    tz = F.coalesce(F.col("_t"), F.lit(0))
    return (
        flagged.filter(
            ((F.col("_r") <= capacity) & (F.col("_n") > tz))
            | ((F.col("_r") == capacity + 1) & (F.col("_mx") == F.col("_t")))
        )
        .select(
            *key_cols,
            F.when(F.col("_r") <= capacity, F.col("item"))
            .otherwise(F.lit(None).cast(item_type))
            .alias("item"),
            F.when(F.col("_r") <= capacity, F.col("_n") - tz)
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("w"),
            tz.cast("bigint").alias("base"),
        )
    )


def merge_topk_states(states: list[DataFrame], capacity: int = 64) -> DataFrame:
    """Merge ``topk_state`` frames: per-(keys, item) counter addition,
    per-key base addition (each input's base applies once per key —
    frames are tagged with their list index so bases are never
    double-counted through the union), then the same (capacity+1)-th-
    largest reduction re-bounds the merged state. Exact-mode inputs
    whose union stays ≤ capacity distinct items per key merge exactly
    (base stays 0); past that, bases add — the documented mergeable-
    summaries bound, honest like the theta/HLL contracts. Sentinel rows
    (item NULL — see ``topk_state``) contribute their base, never a
    counter, and keys that lose every item to a degenerate tie in THIS
    reduction re-emit a sentinel so the bound survives chained merges."""
    if not states:
        raise ValueError("merge_topk_states needs at least one state frame")
    if capacity < 1:
        raise ValueError("merge_topk_states needs capacity >= 1")
    tagged = [
        s.withColumn("_slice", F.lit(i)) for i, s in enumerate(states)
    ]
    merged = tagged[0]
    for s in tagged[1:]:
        merged = merged.unionByName(s)
    key_cols = [
        c for c in merged.columns if c not in ("item", "w", "base", "_slice")
    ]
    # per-key total base: one base value per (slice, key), summed across
    # slices (max() collapses the per-row replication inside a slice)
    bases = (
        merged.groupBy(*key_cols, "_slice")
        .agg(F.max("base").alias("_b"))
        .groupBy(*key_cols)
        .agg(F.sum("_b").alias("_base_in"))
    )
    # sentinels (item NULL) carry base only — they never count as items
    sums = (
        merged.filter(F.col("item").isNotNull())
        .groupBy(*key_cols, "item")
        .agg(F.sum("w").alias("_w"))
    )
    w_rank = Window.partitionBy(*key_cols).orderBy(
        F.col("_w").desc(), F.col("item").asc()
    )
    # the same WindowGroupLimit form as topk_state's build
    top_plus = sums.withColumn("_r", F.row_number().over(w_rank)).filter(
        F.col("_r") <= capacity + 1
    )
    # Single-subtree reduction (r13 opt, mirroring topk_state): t and the
    # key's max merged count via a second unordered window on the same
    # partitioning, then ONE right-outer join to `bases` — the complete
    # key universe (every input row, sentinel or item, lands in bases),
    # so keys whose rows were all sentinels surface as unmatched rows.
    # One filter+CASE then replaces the old t_per_key/bases broadcast
    # joins + kept.distinct() anti-join, each of which re-executed the
    # slice-state subtrees behind `merged`:
    #   kept      ⟺ _r ≤ capacity AND _w > t        → (item, _w−t, b+t)
    #   sentinel  ⟺ (_r = capacity+1 AND max(_w)=t)  → (NULL, 0, b+t)
    #               (degenerate reduction: every merged count tied at t)
    #   sentinel  ⟺ no item rows at all AND b > 0    → (NULL, 0, b)
    w_key = Window.partitionBy(*key_cols)
    flagged = top_plus.withColumn(
        "_t", F.max(F.when(F.col("_r") == capacity + 1, F.col("_w"))).over(w_key)
    ).withColumn("_mx", F.max("_w").over(w_key))
    item_type = merged.schema["item"].dataType
    tz = F.coalesce(F.col("_t"), F.lit(0))
    # _base_in is non-NULL today only because `bases` aggregates EVERY
    # merged row, so the right join matches every key in `sums`; coalesce
    # makes base robust to a future refactor of `bases` (e.g. filtering
    # zero bases) instead of leaning on that distant invariant (ADVICE r13)
    base = (F.coalesce(F.col("_base_in"), F.lit(0)) + tz).cast("bigint")
    return (
        flagged.join(bases, list(key_cols), "right")
        .filter(
            ((F.col("_r") <= capacity) & (F.col("_w") > tz))
            | ((F.col("_r") == capacity + 1) & (F.col("_mx") == F.col("_t")))
            | (F.col("_r").isNull() & (F.col("_base_in") > 0))
        )
        .select(
            *key_cols,
            F.when(F.col("_r") <= capacity, F.col("item"))
            .otherwise(F.lit(None).cast(item_type))
            .alias("item"),
            F.when(F.col("_r") <= capacity, F.col("_w") - tz)
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("w"),
            base.alias("base"),
        )
    )


def topk_from_state(state: DataFrame, k: int = 10) -> DataFrame:
    """Top-k heavy-hitter read off a (possibly merged) state:
    (keys..., item, rank, n_lower, n_upper) — n_lower = w (guaranteed
    floor), n_upper = w + base (ceiling; equal in exact mode).
    Deterministic total order (w desc, item asc). Sentinel rows (item
    NULL, base carriers for degenerate-tie keys) are not items and are
    skipped — a sentinel-only key reads as no known hitters, every
    candidate bounded above by its base."""
    if k < 1:
        raise ValueError("topk_from_state needs k >= 1")
    key_cols = [c for c in state.columns if c not in ("item", "w", "base")]
    w_rank = Window.partitionBy(*key_cols).orderBy(
        F.col("w").desc(), F.col("item").asc()
    )
    return (
        state.filter(F.col("item").isNotNull())
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select(
            *key_cols,
            "item",
            "rank",
            F.col("w").alias("n_lower"),
            (F.col("w") + F.col("base")).alias("n_upper"),
        )
    )


DECAY_HORIZON = 30  # halvings until a contribution quantizes to zero


def decayed_state(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    time_col: str,
    ref_date: str,
    half_life_days: int = 7,
) -> DataFrame:
    """Mergeable per-key TIME-DECAYED engagement state (E63): the
    recency-weighted score every audience dashboard wants ("hot
    communities now", the reference's interest-score loop made
    time-aware) as an EXACT integer-arithmetic monoid — the fifth leg
    of the incremental tier.

    The trick that keeps it exact: exponential decay is quantized to
    POWER-OF-TWO weights at half-life resolution —
    ``weight = 2^(HORIZON − floor(age/half_life))``, age in whole days
    before ``ref_date`` (future events clamp to full weight; past
    ``HORIZON`` halvings the weight quantizes to zero — the declared
    30-halving horizon). value × weight is a DECIMAL × integer product
    and the state sum is exact decimal addition: associative,
    commutative, partition- and merge-order-independent, and SQL-
    replayable — unlike float exp() decay, which drifts by summation
    order and may differ across engines' libm in the last ulp.

    ``ref_date`` is DECLARED MODEL STATE (the E42 bounds rule) and
    rides the state frame as a column: states built at different
    references do NOT silently combine — ``merge_decayed_states``
    groups by it, so a mismatched merge yields visibly separate rows
    instead of a wrong sum. Re-referencing is a rebuild by design
    (an integer state cannot be rescaled exactly).

    State: (keys..., ref_date, n, decayed_sum) — read scores with
    ``decayed_read`` (normalizes by 2^HORIZON so weights read as
    2^-age_units ≤ 1)."""
    if half_life_days < 1:
        raise ValueError("decayed_state needs half_life_days >= 1")
    age_days = F.datediff(F.lit(ref_date).cast("date"), F.col(time_col).cast("date"))
    units = F.greatest(F.floor(age_days / F.lit(half_life_days)), F.lit(0))
    # 2^(HORIZON − units) as an explicit integer CASE over the bounded
    # unit domain — exact, whole-stage-codegen'd, no float pow anywhere
    weight = None
    for u in range(DECAY_HORIZON + 1):
        arm = F.lit(1 << (DECAY_HORIZON - u)).cast("long")
        weight = (
            F.when(units == u, arm) if weight is None else weight.when(units == u, arm)
        )
    weight = weight.otherwise(F.lit(0).cast("long"))
    term = F.col(value_col).cast("decimal(18,4)") * weight.cast("decimal(12,0)")
    return (
        df.filter(F.col(value_col).isNotNull() & F.col(time_col).isNotNull())
        .groupBy(*key_cols, F.lit(ref_date).alias("ref_date"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(term).alias("decayed_sum"),
        )
    )


def merge_decayed_states(states: list[DataFrame]) -> DataFrame:
    """Merge ``decayed_state`` frames: per-(keys, ref_date) exact
    decimal addition — the E41 monoid contract. ref_date participates
    in the grouping, so states built against different references stay
    separate rows (visible) rather than combining wrongly (silent)."""
    if not states:
        raise ValueError("merge_decayed_states needs at least one state frame")
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    key_cols = [c for c in merged.columns if c not in ("n", "decayed_sum")]
    return merged.groupBy(*key_cols).agg(
        F.sum("n").alias("n"),
        F.sum("decayed_sum").alias("decayed_sum"),
    )


def decayed_read(state: DataFrame) -> DataFrame:
    """Score read off a (possibly merged) decayed state: (keys...,
    ref_date, n, score) with score = decayed_sum / 2^HORIZON rounded to
    4dp — one division of the exact sum, deterministic cross-engine."""
    key_cols = [c for c in state.columns if c not in ("n", "decayed_sum")]
    return state.select(
        *key_cols,
        "n",
        F.round(
            F.col("decayed_sum").cast("double") / F.lit(float(1 << DECAY_HORIZON)), 4
        ).alias("score"),
    )


def trend_state(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_col: str,
    origin_date: str,
    decimal_type: str = "decimal(18,4)",
) -> DataFrame:
    """Mergeable per-key least-squares TREND state (E64): the sufficient
    statistics of a per-key regression of value on time — "is this
    source's quality rising or falling", "which event types are
    accelerating" — as an exact monoid (the sixth incremental-tier
    leg). A standing pipeline absorbs each day's delta into five sums
    and reads the refreshed slope without rescanning history.

    x is the WHOLE-DAY index since ``origin_date`` (declared model
    state, riding the frame like E63's ref_date — mismatched origins
    stay separate rows through a merge); y is the value as exact
    decimal. State: (keys..., origin, n, sum_x, sum_x2, sum_y, sum_xy)
    — integer and decimal sums only, so merging is exact addition in
    any order and the state is SQL-replayable. The slope itself is
    derived at READ time (``trend_read``) from the exact sums in one
    deterministic double expression. NULL times/values are dropped."""
    x = F.datediff(F.col(time_col).cast("date"), F.lit(origin_date).cast("date"))
    y = F.col(value_col).cast(decimal_type)
    return (
        df.filter(F.col(value_col).isNotNull() & F.col(time_col).isNotNull())
        .groupBy(*key_cols, F.lit(origin_date).alias("origin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x.cast("bigint")).alias("sum_x"),
            F.sum((x * x).cast("bigint")).alias("sum_x2"),
            F.sum(y).alias("sum_y"),
            F.sum(y * x.cast("decimal(10,0)")).alias("sum_xy"),
        )
    )


_TREND_SUMS = ("n", "sum_x", "sum_x2", "sum_y", "sum_xy")


def merge_trend_states(states: list[DataFrame]) -> DataFrame:
    """Merge ``trend_state`` frames: component-wise exact addition (the
    E41 monoid contract); origins participate in the grouping, so
    states regressed against different origins never combine
    silently."""
    if not states:
        raise ValueError("merge_trend_states needs at least one state frame")
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    key_cols = [c for c in merged.columns if c not in _TREND_SUMS]
    return merged.groupBy(*key_cols).agg(
        *[F.sum(c).alias(c) for c in _TREND_SUMS]
    )


def trend_read(state: DataFrame) -> DataFrame:
    """Slope/intercept read off a (possibly merged) trend state:
    (keys..., origin, n, slope, intercept) — slope in value units per
    DAY via the closed form (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), NULL
    when the key has a single distinct day (denominator 0); intercept
    at the origin. One double expression over exact sums — same sums,
    same answer, any merge history."""
    key_cols = [c for c in state.columns if c not in _TREND_SUMS]
    n = F.col("n").cast("double")
    sx = F.col("sum_x").cast("double")
    sx2 = F.col("sum_x2").cast("double")
    sy = F.col("sum_y").cast("double")
    sxy = F.col("sum_xy").cast("double")
    den = n * sx2 - sx * sx
    slope = F.when(den != 0, (n * sxy - sx * sy) / den)
    intercept = F.when(den != 0, (sy - slope * sx) / n)
    return state.select(
        *key_cols,
        "n",
        F.round(slope, 4).alias("slope"),
        F.round(intercept, 4).alias("intercept"),
    )


_CATALOG_FAMILIES = (
    "bottomk",
    "cm",
    "decayed",
    "histogram",
    "hll",
    "kll",
    "rollup",
    "theta",
    "topk",
    "trend",
    "wbottomk",
)


def state_catalog_read(
    states: dict[str, DataFrame],
    topk_k: int = 5,
    bottomk_k: int = 64,
    cm_probes: DataFrame | None = None,
    kll_qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    wbottomk_k: int = 64,
) -> DataFrame:
    """Unified read over a CATALOG of merged incremental states (the
    r11 consolidation ask): one tagged frame a standing daily-ingest
    pipeline reads after absorbing a delta into EVERY state family it
    maintains — instead of six separate reads, the dashboard query is
    one UNION with a fixed schema. Each input is a (possibly merged)
    state frame of the named family, keyed by exactly ONE key column
    (the frame's first column, the builders' convention); reads reuse
    the family read functions, so semantics are identical to the
    standalone queries.

    Families → legs of the (op, k1, k2, n, v1, v2) frame:

    - ``rollup``  (E41): k2 NULL, n, v1 = sum (4dp), v2 = max (4dp)
    - ``histogram`` (E42): k2 = bin, n = bin count
    - ``theta``   (E48): k2 NULL, n = distinct estimate (exact in
      exact mode — a regime-conditional SQL replay)
    - ``topk``    (E59): k2 = item, n = w floor, v1 = rank, v2 = w+base
    - ``decayed`` (E63): k2 = ref_date, n, v1 = score
    - ``trend``   (E64): k2 = origin, n, v1 = slope, v2 = intercept
    - ``bottomk`` (E67): k2 = item, n = rk, v1 = KMV est_distinct
      (``bottomk_k`` must be the states' build k)
    - ``cm``      (E68): k2 = probed item, n = est_count (``cm_probes``
      is the read's one-column ``item`` probe frame — point reads are
      parameterized by probes, so the caller must supply them)
    - ``hll``     (E46): k2 NULL, n = sketch distinct estimate
    - ``kll``     (E51): k2 = q, n = exact stream count, v1 = quantile
    - ``wbottomk`` (E73): k2 = item, n = rk, v1 = w, v2 = DLT est_w
      (``wbottomk_k`` must be the states' build k)

    All legs reuse the family read functions, so semantics are
    identical to the standalone queries. Nine families are SQL-exact
    in their checked regimes and ride the declared `state_catalog`
    hash gate; ``hll``/``kll`` are approximate-sketch reads (the E46/
    E51 taxonomy: error-bound gates, not value hashes) — include them
    where a dashboard wants one frame, gate them by their bounds.

    Unknown family names raise; at least one family is required. The
    declared `state_catalog` query hash-gates its frame against a
    one-pass SQL recompute, and the streaming e2e gate feeds this same
    read from states maintained by ONE foreachBatch stream
    (streaming/jobs.run_stream_state_catalog)."""
    unknown = sorted(set(states) - set(_CATALOG_FAMILIES))
    if unknown:
        raise ValueError(f"state_catalog_read: unknown families {unknown}")
    if not states:
        raise ValueError("state_catalog_read needs at least one state family")
    if "cm" in states and cm_probes is None:
        raise ValueError(
            "state_catalog_read: the 'cm' family needs cm_probes (point "
            "reads are parameterized by the probe items)"
        )

    legs: list[DataFrame] = []

    def leg(df, op, k1, k2, n, v1, v2):
        null = F.lit(None)
        legs.append(
            df.select(
                F.lit(op).alias("op"),
                k1.cast("string").alias("k1"),
                (k2 if k2 is not None else null).cast("string").alias("k2"),
                n.cast("bigint").alias("n"),
                (v1 if v1 is not None else null).cast("double").alias("v1"),
                (v2 if v2 is not None else null).cast("double").alias("v2"),
            )
        )

    for name in sorted(states):
        st = states[name]
        key = F.col(st.columns[0])
        if name == "rollup":
            leg(
                st, "rollup", key, None, F.col("n"),
                F.round(F.col("sum_value").cast("double"), 4),
                F.round(F.col("max_value").cast("double"), 4),
            )
        elif name == "histogram":
            leg(st, "histogram", key, F.col("bin"), F.col("bin_n"), None, None)
        elif name == "theta":
            est = theta_estimate(st)
            leg(est, "theta", F.col(est.columns[0]), None,
                F.col("n_distinct"), None, None)
        elif name == "topk":
            r = topk_from_state(st, k=topk_k)
            leg(
                r, "topk", F.col(r.columns[0]), F.col("item"),
                F.col("n_lower"), F.col("rank").cast("double"),
                F.col("n_upper").cast("double"),
            )
        elif name == "decayed":
            r = decayed_read(st)
            leg(r, "decayed", F.col(r.columns[0]), F.col("ref_date"),
                F.col("n"), F.col("score"), None)
        elif name == "trend":
            r = trend_read(st)
            leg(r, "trend", F.col(r.columns[0]), F.col("origin"),
                F.col("n"), F.col("slope"), F.col("intercept"))
        elif name == "bottomk":
            r = bottomk_read(st, k=bottomk_k)
            leg(r, "bottomk", F.col(r.columns[0]), F.col("item"),
                F.col("rk"), F.col("est_distinct"), None)
        elif name == "cm":
            r = cm_estimate(st, cm_probes, "item")
            leg(r, "cm", F.col(r.columns[0]), F.col("item"),
                F.col("est_count"), None, None)
        elif name == "hll":
            r = distinct_from_state(st)
            leg(r, "hll", F.col(r.columns[0]), None,
                F.col("n_distinct"), None, None)
        elif name == "kll":
            r = kll_quantiles_from_state(st, list(kll_qs))
            leg(r, "kll", F.col(r.columns[0]), F.col("q"),
                F.col("n"), F.col("quantile"), None)
        elif name == "wbottomk":
            r = weighted_bottomk_read(st, k=wbottomk_k)
            leg(r, "wbottomk", F.col(r.columns[0]), F.col("item"),
                F.col("rk"), F.col("w"), F.col("est_w"))
    out = legs[0]
    for frame in legs[1:]:
        out = out.unionByName(frame)
    return out


def bottomk_state(
    df: DataFrame,
    key_cols: list[str],
    item_col: str,
    k: int = 64,
    salt: str = "bk",
) -> DataFrame:
    """Mergeable per-key bottom-k SAMPLE state (E67): the k distinct
    items with the SMALLEST salted-md5 hash — the deterministic,
    coordination-free answer to "keep a uniform sample of each key's
    members that absorbs daily deltas". A random reservoir needs a seed
    and is order-sensitive; the hash-ordered bottom-k is a pure
    function of the item SET: merge = union + re-take-k (associative,
    commutative, idempotent — re-delivering a batch changes nothing),
    and the same items are sampled on any partitioning or engine. The
    same state doubles as a KMV distinct-count sketch: the k-th
    smallest hash estimates the key's cardinality (``bottomk_read``),
    so one persisted frame answers BOTH "show me examples" and "how
    many" — at ≤ k rows per key per day.

    State: (keys..., item, hv, rk) with rk the (hv asc, item asc)
    rank ≤ k; hv = the 15-hex-digit md5 prefix as bigint (the E4
    machinery, so a DuckDB oracle computes the identical sample). The
    initial ``.distinct()`` pre-aggregate shuffles the distinct
    (key, item) frame ONCE — hash-partitioned with map-side partials,
    so no single-task parking — and the WindowGroupLimit bound applies
    to the window exchange that follows it: each map task pre-truncates
    to its local bottom-k, so the rank exchange ships
    n_partitions × k rows per key, not the distinct frame again.
    NULL items drop.

    Exactness contract: while a key's distinct count stays ≤ k, the
    state IS the distinct set (exact regime); past k it is a uniform
    sample of it (every member equally likely under the hash's
    uniformity) and the KMV estimate carries the standard ~1/sqrt(k-2)
    relative error."""
    if k < 2:
        raise ValueError("bottomk_state needs k >= 2 (KMV needs k-1 > 0)")
    items = (
        df.filter(F.col(item_col).isNotNull())
        .select(*key_cols, F.col(item_col).alias("item"))
        .distinct()
    )
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col("item").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("hv").asc(), F.col("item").asc()
    )
    out = (
        items.withColumn("hv", hv)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
    # build-k marker read by merge_bottomk_states' coverage validation
    # (best-effort: a state round-tripped through storage loses it and
    # falls back to the observed-rank check there)
    out._afp_bottomk_k = k
    return out


def merge_bottomk_states(
    states: list[DataFrame], k: int = 64, input_k: int | None = None
) -> DataFrame:
    """Merge ``bottomk_state`` frames: union, drop duplicate items (the
    hash is a function of the item, so duplicates agree), re-rank, keep
    k — the exact min-k union. ``k`` must not exceed the inputs' build
    k (a larger union gate would fabricate coverage the inputs never
    kept: ``bottomk_read`` would see < k rows on a truncated key and
    misreport the sample as the exact distinct set). Validation
    (ADVICE r12): a frame straight from ``bottomk_state`` or from this
    merge carries its k and is checked directly; a frame without the
    marker (e.g. round-tripped through parquet) needs the caller's
    explicit ``input_k`` assertion of how it was built — the rows alone
    cannot prove coverage (a key below k looks identical whether its
    build k was larger or its item set was just small), so an unmarked
    input with no assertion is refused rather than silently trusted."""
    if not states:
        raise ValueError("merge_bottomk_states needs at least one state frame")
    if k < 2:
        raise ValueError("merge_bottomk_states needs k >= 2")
    for i, s in enumerate(states):
        built_k = getattr(s, "_afp_bottomk_k", None)
        if built_k is None:
            built_k = input_k
        if built_k is None:
            raise ValueError(
                f"merge_bottomk_states input {i} carries no build-k marker "
                f"(round-tripped through storage?); pass input_k=<its build k> "
                f"to assert coverage, or rebuild it via bottomk_state"
            )
        if k > built_k:
            raise ValueError(
                f"merge_bottomk_states k={k} exceeds input {i}'s build "
                f"k={built_k}; a larger union gate would fabricate coverage"
            )
    merged = states[0].drop("rk")
    for s in states[1:]:
        merged = merged.unionByName(s.drop("rk"))
    key_cols = [c for c in merged.columns if c not in ("item", "hv")]
    dedup = merged.groupBy(*key_cols, "item").agg(F.min("hv").alias("hv"))
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("hv").asc(), F.col("item").asc()
    )
    out = (
        dedup.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    )
    # the merged frame's effective build k is the gate applied here
    out._afp_bottomk_k = k
    return out


_BK_RANGE = float(16 ** 15)  # hv domain: 15 hex digits


def bottomk_read(state: DataFrame, k: int = 64) -> DataFrame:
    """Sample + cardinality read off a (possibly merged) bottom-k state:
    the sample rows (keys..., item, rk) each carrying the key's
    ``est_distinct`` — exact count when the key kept fewer than k items
    (the state is the whole set), else the KMV estimator
    (k−1) · R / h_(k) with R the hash domain — one double division over
    integers, deterministic cross-engine, rounded to 4dp."""
    if k < 2:
        raise ValueError("bottomk_read needs k >= 2")
    key_cols = [c for c in state.columns if c not in ("item", "hv", "rk")]
    w = Window.partitionBy(*key_cols)
    return (
        state.withColumn("_kept", F.count(F.lit(1)).over(w))
        # the state holds exactly the k smallest, so max(hv) is h_(k)
        .withColumn("_kth", F.max("hv").over(w))
        .select(
            *key_cols,
            "item",
            "rk",
            F.round(
                F.when(F.col("_kept") < k, F.col("_kept").cast("double")).otherwise(
                    F.lit(float(k - 1)) * F.lit(_BK_RANGE)
                    / F.col("_kth").cast("double")
                ),
                4,
            ).alias("est_distinct"),
        )
    )


def weighted_bottomk_state(
    df: DataFrame,
    key_cols: list[str],
    item_col: str,
    weight_col: str,
    k: int = 64,
    salt: str = "wbk",
) -> DataFrame:
    """Mergeable per-key WEIGHTED sample state (E73): priority sampling
    (Duffield–Lund–Thorup, JACM 2007) with the coordination-free salted
    hash as the uniform draw — the weighted complement of E67's
    bottom-k. A token-budget-aware curation pipeline samples documents
    proportional to TOKEN COUNT, not per-document ("show me
    representative bytes, not representative row ids"); DLT priorities
    q = w / u with u uniform in (0, 1] make the k largest-priority
    items exactly that sample, and the threshold estimator turns the
    same k rows into an unbiased total-weight estimate. The draw
    u = (hv + 1) / 2^60 comes from the E4 salted-md5 machinery, so the
    sample is a pure function of the (item, weight) set: deterministic
    on any partitioning or engine, and the merge (union + re-take-k) is
    associative, commutative, and idempotent.

    Item weights: an item appearing with several weights inside or
    across slices contributes its MAX weight (a deterministic rule the
    merge preserves: priorities grow with w, so max-priority dedup IS
    max-weight dedup). NULL items drop; weights must be positive —
    non-positive or NULL weights raise at read because they would make
    priorities meaningless, so they are filtered here by contract.

    State: (keys..., item, w, hv, rk) with rk the (q desc, item asc)
    rank ≤ k. Like E67: the distinct pre-aggregate shuffles the
    (key, item, max w) frame once (hash-partitioned, map-side
    partials), and WindowGroupLimit pre-truncates each map task to its
    local top-k before the rank exchange. No transcendentals anywhere —
    q is one multiply + one divide over exact integers-in-doubles, so a
    SQL oracle replays the sample bit-for-bit."""
    if k < 2:
        raise ValueError(
            "weighted_bottomk_state needs k >= 2 (the estimator needs a "
            "threshold row)"
        )
    items = (
        df.filter(
            F.col(item_col).isNotNull()
            & F.col(weight_col).isNotNull()
            & (F.col(weight_col) > 0)
        )
        .groupBy(*key_cols, F.col(item_col).alias("item"))
        .agg(F.max(F.col(weight_col).cast("double")).alias("w"))
    )
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col("item").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    q = F.col("w") * F.lit(_BK_RANGE) / (F.col("hv").cast("double") + 1.0)
    w = Window.partitionBy(*key_cols).orderBy(q.desc(), F.col("item").asc())
    out = (
        items.withColumn("hv", hv)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
    out._afp_wbottomk_k = k
    return out


def merge_weighted_bottomk_states(
    states: list[DataFrame], k: int = 64, input_k: int | None = None
) -> DataFrame:
    """Merge ``weighted_bottomk_state`` frames: union, dedup items to
    (max w, shared hv), re-rank by priority, keep k — the exact max-k
    union. Coverage validation is the E67 contract verbatim: ``k`` must
    not exceed each input's build k (marker on fresh builds and merge
    outputs; explicit ``input_k`` assertion for storage round-trips;
    refused otherwise)."""
    if not states:
        raise ValueError(
            "merge_weighted_bottomk_states needs at least one state frame"
        )
    if k < 2:
        raise ValueError("merge_weighted_bottomk_states needs k >= 2")
    for i, s in enumerate(states):
        built_k = getattr(s, "_afp_wbottomk_k", None)
        if built_k is None:
            built_k = input_k
        if built_k is None:
            raise ValueError(
                f"merge_weighted_bottomk_states input {i} carries no build-k "
                f"marker (round-tripped through storage?); pass input_k=<its "
                f"build k> to assert coverage"
            )
        if k > built_k:
            raise ValueError(
                f"merge_weighted_bottomk_states k={k} exceeds input {i}'s "
                f"build k={built_k}; a larger union gate would fabricate "
                f"coverage"
            )
    merged = states[0].drop("rk")
    for s in states[1:]:
        merged = merged.unionByName(s.drop("rk"))
    key_cols = [c for c in merged.columns if c not in ("item", "w", "hv")]
    dedup = merged.groupBy(*key_cols, "item").agg(
        F.max("w").alias("w"), F.min("hv").alias("hv")
    )
    q = F.col("w") * F.lit(_BK_RANGE) / (F.col("hv").cast("double") + 1.0)
    w = Window.partitionBy(*key_cols).orderBy(q.desc(), F.col("item").asc())
    out = (
        dedup.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    )
    out._afp_wbottomk_k = k
    return out


def weighted_bottomk_read(state: DataFrame, k: int = 64) -> DataFrame:
    """Sample + total-weight read off a (possibly merged) weighted
    bottom-k state, the DLT threshold-estimator form: when a key kept
    fewer than k items the state IS the item set and every row reads
    ``est_w = w`` exactly (exact regime); at k kept rows the k-th
    priority becomes the threshold τ, the k−1 higher rows are the
    sample, and each reads ``est_w = max(w, τ)`` — an unbiased
    estimator of that item's share of the key's total weight, so
    ``sum(est_w)`` per key estimates the key's total. Returns
    (keys..., item, rk, w, est_w) with est_w rounded to 4dp."""
    if k < 2:
        raise ValueError("weighted_bottomk_read needs k >= 2")
    key_cols = [c for c in state.columns if c not in ("item", "w", "hv", "rk")]
    win = Window.partitionBy(*key_cols)
    q = F.col("w") * F.lit(_BK_RANGE) / (F.col("hv").cast("double") + 1.0)
    read = (
        state.withColumn("_kept", F.count(F.lit(1)).over(win))
        .withColumn("_q", q)
        .withColumn("_tau", F.min("_q").over(win))
    )
    return (
        read.filter((F.col("_kept") < k) | (F.col("rk") < k))
        .select(
            *key_cols,
            "item",
            "rk",
            "w",
            F.round(
                F.when(F.col("_kept") < k, F.col("w")).otherwise(
                    F.greatest(F.col("w"), F.col("_tau"))
                ),
                4,
            ).alias("est_w"),
        )
    )


def cm_state(
    df: DataFrame,
    key_cols: list[str],
    item_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
) -> DataFrame:
    """Mergeable per-key count-min sketch state (E68): ``depth``
    independent hash rows of ``width`` integer counters — POINT
    frequency estimates for ARBITRARY items without persisting the
    items (the complement of E59: Misra-Gries answers "who are the top
    items", count-min answers "how often did THIS item occur" for any
    later probe, in keys × depth × width bounded rows). Counters are
    EXACT integer sums of a deterministic per-row bucketing (the E4
    salted-md5 machinery, one salt per depth row), so the state is an
    exact monoid — merge is addition, SQL-replayable, and the classic
    one-sided guarantee holds through any merge history: every estimate
    ≥ the true count, and over-estimates are bounded by collisions
    (≤ 2N/width per row with prob ≥ 1 − 2^-depth over the salt choice).

    State: (keys..., d, w, cnt) — sparse (zero cells absent; reads
    treat absent as 0). NULL items drop."""
    if depth < 1 or width < 2:
        raise ValueError("cm_state needs depth >= 1 and width >= 2")
    from audience_finder_pro_spark.operators.sampling import hash_bucket

    buckets = F.array(
        *[hash_bucket(item_col, f"{salt}{d}", width).cast("int") for d in range(depth)]
    )
    return (
        df.filter(F.col(item_col).isNotNull())
        .select(*key_cols, F.posexplode(buckets).alias("d", "w"))
        .groupBy(*key_cols, "d", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_cm_states(states: list[DataFrame]) -> DataFrame:
    """Merge ``cm_state`` frames: per-(keys, d, w) exact count addition
    (the E41 monoid contract). Sketch geometry (depth/width/salt) is
    declared model state — merging states built with different
    geometries is the caller's bug; cells only meet their own (d, w)."""
    if not states:
        raise ValueError("merge_cm_states needs at least one state frame")
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    key_cols = [c for c in merged.columns if c != "cnt"]
    return merged.groupBy(*key_cols).agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    state: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
) -> DataFrame:
    """Point-frequency read off a (possibly merged) count-min state:
    for every (state keys × probe item) pair, est_count = min over the
    ``depth`` rows of the item's counter (absent cell = 0) — ≥ the true
    count always, with the collision-bounded excess. ``probes`` is a
    one-column frame of items (broadcast — a probe list is small by
    definition); geometry must match the build."""
    from audience_finder_pro_spark.operators.sampling import hash_bucket

    key_cols = [c for c in state.columns if c not in ("d", "w", "cnt")]
    buckets = F.array(
        *[hash_bucket(item_col, f"{salt}{d}", width).cast("int") for d in range(depth)]
    )
    probe_cells = probes.select(
        F.col(item_col).alias("item"), F.posexplode(buckets).alias("d", "w")
    )
    hits = (
        state.join(F.broadcast(probe_cells), ["d", "w"])
        .groupBy(*key_cols, "item")
        .agg(
            F.min("cnt").alias("_min_hit"),
            F.count(F.lit(1)).alias("_rows"),
        )
    )
    # the read is TOTAL over state-keys x probes: an absent cell is a
    # zero counter, so any probe missing from >=1 of its depth cells
    # (or from all of them) reads 0 — skeleton = tiny cross join of the
    # distinct key frame with the probe list, both broadcast-sized
    skeleton = state.select(*key_cols).distinct().crossJoin(
        F.broadcast(probes.select(F.col(item_col).alias("item")))
    )
    return skeleton.join(hits, [*key_cols, "item"], "left").select(
        *key_cols,
        "item",
        F.when(
            F.coalesce(F.col("_rows"), F.lit(0)) < depth, F.lit(0)
        )
        .otherwise(F.col("_min_hit"))
        .cast("long")
        .alias("est_count"),
    )


def rolling_theta_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    time_col: str,
    window_days: int = 7,
    lg_k: int = 14,
) -> DataFrame:
    """Rolling distinct-count read off per-day theta states (E70): the
    "7-day active users per key, every day" dashboard line — the
    sliding-window DISTINCT that exact SQL answers only by re-scanning
    the raw window per day (a trailing range join against the event
    log: window_days full scans' worth of work, unpayable at 100 TB).
    Here the log is scanned ONCE into per-(key, day) theta states
    (bounded: keys × days rows, ≤ 2^lg_k hashes each — the E48
    contract), and each day's trailing window is a UNION-MERGE over at
    most ``window_days`` state rows; yesterday's states never touch
    raw history again, and the same persisted frame serves any window
    length after the fact.

    Exact while each window's distinct count stays ≤ 2^lg_k (the theta
    exactness contract) — which is how the declared `rolling_audience`
    query is SQL-oracle-gated; past that, the documented Datasketches
    bound. NULL times/values drop. Returns (keys..., day, n_distinct),
    one row per (key, day-with-activity); days with no activity in the
    window simply have no anchor row (gap-fill composes via E18)."""
    if window_days < 1:
        raise ValueError("rolling_theta_distinct needs window_days >= 1")
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(time_col).isNotNull()
    ).withColumn("_day", F.col(time_col).cast("date"))
    states = theta_state(base, [*key_cols, "_day"], value_col, lg_k=lg_k)
    anchors = states.select(*key_cols, F.col("_day").alias("day")).distinct()
    s = states.select(
        *[F.col(c).alias(f"_s_{c}") for c in key_cols], "_day", "sketch"
    )
    cond = F.lit(True)
    for c in key_cols:
        cond = cond & (F.col(c) == F.col(f"_s_{c}"))
    cond = cond & F.col("_day").between(
        F.date_sub(F.col("day"), window_days - 1), F.col("day")
    )
    merged = (
        anchors.join(s, cond)
        .groupBy(*key_cols, "day")
        .agg(F.theta_union_agg("sketch", F.lit(lg_k)).alias("sketch"))
    )
    return merged.select(
        *key_cols,
        "day",
        F.theta_sketch_estimate("sketch").cast("long").alias("n_distinct"),
    )
