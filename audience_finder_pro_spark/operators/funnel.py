"""Event-sequence analytics: ordered funnels and cohort retention.

The two staple product-analytics operators every event warehouse ships
(Amplitude/Mixpanel/GA semantics), expressed as pure DataFrame
aggregates:

- ``funnel``: strictly-ordered first-completion funnel — a user counts
  for step i only with an event of type i at a timestamp STRICTLY after
  their step-(i−1) completion time. Each step is one user-keyed
  conditional-min aggregate joined to the previous step's completion
  frame, so the plan is k−1 small joins over user-sized frames (the raw
  event stream is scanned once per step with the step's type filter
  pushed to the scan — at 100 TB the event_type partition/predicate
  prunes most of it).
- ``cohort_retention``: users cohorted by the week of their first
  ``cohort_event`` (e.g. signup); retention(cohort, offset) = distinct
  users with ANY event ``offset`` weeks after their cohort week /
  cohort size. One first-touch aggregate + one distinct (user, week)
  projection + one join — all user- or week-keyed, nothing wide.

Both are deterministic (integer week buckets, min timestamps) and
SQL-replayable for the DuckDB differentials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from audience_finder_pro_spark.operators.sessionize import sessionize

WEEK_SECONDS = 7 * 24 * 3600


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-step funnel summary: (step, step_idx, n_users, conversion)
    where conversion = n_users(step) / n_users(first step), 4 dp.

    Counting-tail shape note (r9): a stack()-based tail that left-joined
    the nested step sets into one frame and took ONE global aggregate was
    built and tree-A/B-measured against this form — it replaced k
    near-free map-side count partials with k−1 sort-merge joins (SORTS of
    the full user sets) and read ~27% SLOWER at sf0.1; the sorts are also
    strictly more work than counting at 100 TB. The per-step count
    aggregates stay: each consumes a frame the step chain materializes
    anyway, partial-aggregated map-side, so the only cost is k tiny
    single-row exchanges.
    """
    prev = None  # (user, t_i) completion frame for the previous step
    counts = []
    for i, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("user"), F.col(ts_col).alias("t")
        )
        if prev is None:
            cur = ev.groupBy("user").agg(F.min("t").alias("t"))
        else:
            cur = (
                ev.join(prev.select("user", F.col("t").alias("t_prev")), "user")
                .filter(F.col("t") > F.col("t_prev"))
                .groupBy("user")
                .agg(F.min("t").alias("t"))
            )
        counts.append(
            cur.agg(F.count("*").alias("n_users")).select(
                F.lit(step).alias("step"),
                F.lit(i + 1).alias("step_idx"),
                "n_users",
            )
        )
        prev = cur
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    base = counts[0].select(F.col("n_users").alias("n_base"))  # 1 row → broadcast
    return out.crossJoin(F.broadcast(base)).select(
        "step",
        "step_idx",
        "n_users",
        # ANSI guard: zero first-step events → n_base 0; NULL conversion
        # beats a job-killing DIVIDE_BY_ZERO on a degenerate events frame
        F.when(
            F.col("n_base") > 0, F.round(F.col("n_users") / F.col("n_base"), 4)
        ).alias("conversion"),
    )


def cohort_retention(
    events: DataFrame,
    cohort_event: str = "signup",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, week_offset, n_active, n_cohort, retention) — the
    classic retention triangle. Weeks are epoch-second // 604800 integer
    buckets (identical arithmetic in the SQL oracle); offset 0 is the
    cohort week itself (retention 1.0 for signup-activity overlap).
    """
    week = (F.unix_timestamp(F.col(ts_col)) / F.lit(WEEK_SECONDS)).cast("long")
    first = (
        events.filter(F.col(type_col) == cohort_event)
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(week).alias("cohort_week"))
    )
    sizes = first.groupBy("cohort_week").agg(F.count("*").alias("n_cohort"))
    activity = events.select(
        F.col(user_col).alias("user"), week.alias("week")
    ).distinct()
    # count(*), not count_distinct (r9 floor reduction): ``activity`` is
    # already distinct on (user, week) and every user has exactly one
    # cohort_week, so within a (cohort_week, week_offset) group each user
    # appears at most once — a distinct count would only re-pay the
    # two-phase expand exchange for rows that are already unique. (The
    # DuckDB oracle keeps count(DISTINCT u); equal by the same argument.)
    ret = (
        activity.join(first, "user")
        .filter(F.col("week") >= F.col("cohort_week"))
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return ret.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "n_cohort",
        F.round(F.col("n_active") / F.col("n_cohort"), 4).alias("retention"),
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (E45): (from_type, to_type, n, p) where ``n`` counts
    consecutive (by time, within user) event pairs and ``p`` is the
    row-normalized transition probability — the third staple of the
    event-analytics family after funnels and retention (journey
    analysis: what users do NEXT, the empirical edge weights funnels
    assume). The reference renders flat event lists (app.py:222-258);
    this is the sequence model over them.

    Scale shape: ONE user-keyed window (lead over the (ts, id) total
    order — the same sessionize exchange shape as W3), one map-side-
    combined pair count bounded by |event-type vocabulary|², and a
    row-total window over that tiny matrix. The raw stream shuffles
    once, on the user key.

    Determinism: the per-user order is total (ts ties broken by the
    unique event id); n is an integer; p is one integer division,
    rounded — identical in the SQL oracle."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    pairs = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_tot = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(row_tot), 4).alias("p"),
    )


def top_paths(
    events: DataFrame,
    k: int = 20,
    max_len: int = 5,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-k session journey paths (E56): (path, n_sessions) — the
    DISCOVERED event orderings, completing the event-analytics family:
    funnel_steps measures a path you hypothesize, transition_matrix
    gives one-step edges, top_paths surfaces the whole multi-step
    journeys users actually take (truncated to ``max_len`` steps,
    joined as 'a>b>c').

    Shape: the W3 sessionize pass (one user-keyed shuffle), a
    row_number trim to ``max_len`` BEFORE any collection (per-session
    aggregate state is bounded by max_len, not session length — the
    100 TB guard), one per-session collect over the (ts, id) total
    order, one map-side-combined path count, and a TakeOrdered top-k
    on (n desc, path asc) — fully deterministic, all strings and
    integers. The per-element transform lambda runs interpreted but
    over <= max_len entries per session (not a hot path).

    The (ts, id_col) composite pins the within-session order even
    under timestamp ties, so both engines aggregate the identical
    sequence."""
    sess = sessionize(
        events.select(user_col, ts_col, type_col, id_col),
        user_col,
        ts_col,
        gap_seconds,
    )
    w = Window.partitionBy(user_col, "session_id").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    trimmed = sess.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= max_len
    )
    paths = trimmed.groupBy(user_col, "session_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col(ts_col).alias("t"),
                            F.col(id_col).alias("i"),
                            F.col(type_col).alias("e"),
                        )
                    )
                ),
                lambda s: s["e"],
            ),
            ">",
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    return counted.orderBy(
        F.col("n_sessions").desc(), F.col("path").asc()
    ).limit(k)


def touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_type: str = "click",
    horizon_days: int = 7,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Multi-touch conversion attribution (E74): every conversion's
    value credited to the user's preceding touch events within a
    horizon, under the three staple models in ONE pass — first_touch
    (all credit to the earliest eligible touch), last_touch (to the
    latest), linear (split evenly) — plus an 'unattributed' leg for
    conversions with no eligible touch, so the output's per-model value
    totals reconcile exactly to the conversion total (the audit
    property ad-measurement teams actually check). Output grain:
    (model, touch_date, attributed, n_conv) — attributed value and
    distinct converting users' conversions per touch day per model;
    the unattributed leg carries a NULL touch_date.

    Ties and determinism: eligible touches order by (ts asc, id asc)
    for first and (ts desc, id asc) for last; horizon is the closed
    interval [conv_ts − horizon_days, conv_ts]. Money discipline (the
    q27 float-sum lesson): each per-touch contribution is the IEEE
    double ``value / n`` rounded to 6dp and cast DECIMAL(18,6) — the
    same double in either engine — so the day sums are exact decimal
    addition, partition-order-free, then rounded to 4dp.

    Scale shape: one user-keyed equi-join between the two type-filtered
    scans (both filters pushed to the scan; AQE splits skewed users),
    one window over each conversion's ≤ horizon touches, one final
    (model, day)-keyed aggregate. No all-pairs anything: the join is
    bounded by touches-per-user within the horizon."""
    if horizon_days < 0:
        raise ValueError("touch_attribution needs horizon_days >= 0")
    conv = events.filter(
        (F.col(type_col) == conversion_type)
        & F.col(value_col).isNotNull()
        & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("_cid"),
        F.col(ts_col).alias("_cts"),
        F.col(value_col).alias("_v"),
    )
    touch = events.filter(
        (F.col(type_col) == touch_type) & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("_tid"),
        F.col(ts_col).alias("_tts"),
    )
    # Single-subtree form (r13 opt): a LEFT join with the horizon in the
    # join condition keeps no-touch conversions as one NULL-touch row, so
    # the old anti-join leg disappears; the four model legs then emit
    # from ONE pass as a conditional struct array exploded per row —
    # the old four-branch union re-executed the join+window chain three
    # times and the pair join a fourth time for the anti-join (events
    # was scanned 9× per action). Same rows: each matched pair row
    # yields its linear entry plus first/last entries where its rank is
    # 1, each NULL-touch row yields exactly the old unattributed entry.
    pairs = conv.join(
        touch,
        (conv["_u"] == touch["_u"])
        & (F.col("_tts") <= F.col("_cts"))
        & (
            F.col("_tts")
            >= F.col("_cts") - F.expr(f"INTERVAL {int(horizon_days)} DAYS")
        ),
        "left",
    ).drop(touch["_u"])
    w = Window.partitionBy("_cid")
    first_w = w.orderBy(F.col("_tts").asc(), F.col("_tid").asc())
    last_w = w.orderBy(F.col("_tts").desc(), F.col("_tid").asc())
    marked = (
        pairs.withColumn("_n", F.count("_tid").over(w))
        .withColumn("_rf", F.row_number().over(first_w))
        .withColumn("_rl", F.row_number().over(last_w))
    )

    def contrib(div):
        return F.round(F.col("_v") / div, 6).cast("decimal(18,6)")

    day = F.to_date("_tts")

    def entry(model, date_col, div):
        return F.struct(
            F.lit(model).alias("model"),
            date_col.alias("touch_date"),
            contrib(div).alias("_c"),
        )

    matched = F.col("_tid").isNotNull()
    contribs = F.array_compact(
        F.array(
            F.when(matched & (F.col("_rf") == 1), entry("first_touch", day, F.lit(1.0))),
            F.when(matched & (F.col("_rl") == 1), entry("last_touch", day, F.lit(1.0))),
            F.when(matched, entry("linear", day, F.col("_n").cast("double"))),
            F.when(
                ~matched,
                entry("unattributed", F.lit(None).cast("date"), F.lit(1.0)),
            ),
        )
    )
    out = marked.select(F.col("_cid"), F.explode(contribs).alias("e"))
    return out.groupBy(
        F.col("e.model").alias("model"),
        F.col("e.touch_date").alias("touch_date"),
    ).agg(
        F.round(F.sum("e._c").cast("double"), 4).alias("attributed"),
        F.countDistinct("_cid").alias("n_conv"),
    )
