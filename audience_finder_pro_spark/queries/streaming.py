"""Streaming-tier declared queries (SURVEY §2.9 T1-T2).

These run the *batch* form of the streaming aggregations — Spark's
window()/session_window() have identical semantics in batch and
streaming, so the oracle checks the semantics while
tests/test_streaming.py replays the same plans through readStream +
memory sink and asserts batch≡stream (T1-T4, watermarks, stateful dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from audience_finder_pro_spark.session import load_table

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------- T1 tumbling
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-hour tumbling windows × event_type (epoch-aligned, same as streaming).

    Batch leg of the declared ``stream_window_aggs`` query; kept callable
    standalone for the batch≡stream differential in tests/test_streaming.py."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# ---------------------------------------------------------------- T1 sliding
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hour windows sliding hourly: each event lands in 3 windows.

    Batch leg of the declared ``stream_window_aggs`` query (see above)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "3 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total_value",
        )
    )


# ------------------------------------------------- T2 session-window oracle
# Standalone oracle for the session leg (the lag-gap islands algorithm,
# proving session_window() agrees with the classic SQL formulation); the
# driver row moved to the merged stream_window_aggs frame (r8) — this
# constant stays the bench comparator / pytest gate for the standalone query.
_SESSION_WINDOW_ORACLE = """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM sess GROUP BY user_id, session_id
"""


# ------------------- T1+T2 tumbling + sliding + session (tagged union)
@_q(
    "stream_window_aggs",
    f"""
    SELECT 'session' AS kind,
           session_start AS window_start,
           CAST(user_id AS VARCHAR) AS event_type,
           n_events AS n,
           total_value
    FROM ({_SESSION_WINDOW_ORACLE})
    UNION ALL
    SELECT 'tumbling' AS kind,
           strftime(make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 * 1000000 AS BIGINT)),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM events
    GROUP BY window_start, event_type
    UNION ALL
    SELECT 'sliding' AS kind, window_start, NULL AS event_type, n, total_value FROM (
      WITH slides AS (
        SELECT *, unnest(range(
          CAST(floor((epoch(ts) - 10800) / 3600) + 1 AS BIGINT),
          CAST(floor(epoch(ts) / 3600) AS BIGINT) + 1
        )) AS slide_idx
        FROM events
      )
      SELECT strftime(make_timestamp(slide_idx * 3600 * 1000000), '%Y-%m-%d %H:%M:%S') AS window_start,
             count(*) AS n, round(sum(value), 4) AS total_value
      FROM slides
      GROUP BY window_start
    )
    """,
)
def stream_window_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three T1/T2 window shapes in one tagged result — the former
    ``stream_tumbling_agg`` / ``stream_sliding_agg`` declared queries
    (merged r7-prep, funding ``semantic_dedup``) plus the session-window
    leg (merged r8, funding ``similarity_pagerank``). Each leg is the
    unchanged batch form of its streaming aggregation (all stay
    individually callable for the batch≡stream differentials); the
    sliding leg carries a NULL ``event_type``, the session leg carries
    its user_id key there as a string — no verified value is lost."""
    tum = stream_tumbling_agg(spark, sf_dir).select(
        F.lit("tumbling").alias("kind"), "window_start", "event_type", "n", "total_value"
    )
    sld = stream_sliding_agg(spark, sf_dir).select(
        F.lit("sliding").alias("kind"),
        "window_start",
        F.lit(None).cast("string").alias("event_type"),
        "n",
        "total_value",
    )
    ses = stream_session_window(spark, sf_dir).select(
        F.lit("session").alias("kind"),
        F.col("session_start").alias("window_start"),
        F.col("user_id").cast("string").alias("event_type"),
        F.col("n_events").alias("n"),
        "total_value",
    )
    return tum.unionByName(sld).unionByName(ses)


# ---------------------------------------------------------------- T2 session windows
@_q("stream_session_window", None)  # oracle slot moved to stream_window_aggs (r8)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(ts, 30 min) per user — gap-merged sessions.
    Driver-verified through the merged ``stream_window_aggs`` (identical
    expressions ride the session leg); the standalone lag-gap-islands
    oracle (``_SESSION_WINDOW_ORACLE``) stays the bench comparator."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------- T4 stream-static join
@_q(
    "stream_static_join",
    """
    SELECT e.event_id, e.user_id, e.event_type, round(e.value, 4) AS value,
           c.c_name AS user_name, c.c_mktsegment AS segment
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def stream_static_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 stream x static-dim enrichment, batch form — runs the SAME
    ``streaming.jobs.stream_static_join`` operator the streaming tier
    uses (broadcast left join on user_id; in streaming the dim is
    re-broadcast per micro-batch), so the oracle row checks the exact
    join the batch<->stream differential in tests/test_streaming.py
    replays through readStream. Dim = customer keyed by c_custkey
    (events.user_id draws from the same key space). Promoted in r6 via
    the q25->q22 merge (driver verifies exactly 50 oracle rows)."""
    from audience_finder_pro_spark.streaming.jobs import stream_static_join

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.round("value", 4).alias("value")
    )
    user_dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("user_name"),
        F.col("c_mktsegment").alias("segment"),
    )
    return stream_static_join(events, user_dim).select(
        "event_id", "user_id", "event_type", "value", "user_name", "segment"
    )
