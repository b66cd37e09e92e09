"""Streaming jobs over the events table (SURVEY §2.9).

The reference is strictly batch; its nearest streaming analogues are
cancellation flags and progress callbacks (app.py:35-62). This tier is
the engine's generalization: the same declarative aggregations run
incrementally with watermark-bounded state.

Scale notes: watermarks bound state size (late rows beyond the horizon
are dropped, so state never grows unboundedly at 100 TB/day ingest);
stream-static joins broadcast the static dim per micro-batch;
dropDuplicatesWithinWatermark keeps only the watermark-window's key set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet-directory stream source (one file = one micro-batch locally);
    in production this is the Kafka/queue source with the same schema."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sf_dir}/")
    )


def tumbling_agg(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T1+T3: watermarked tumbling windows; append-mode emits finalized windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_agg(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T1 sliding form: 3-hour windows advancing hourly — each event lands in
    3 windows; same plan as the stream_window_aggs sliding batch leg."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "3 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total_value",
        )
    )


def session_agg(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """T2: gap-based session windows with watermark-bounded state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def stateful_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """T4: exactly-once-per-key within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def stream_static_join(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """T4: stream ⋈ static dim — the dim is re-broadcast per micro-batch."""
    return events.join(F.broadcast(user_dim), "user_id", "left")


def stream_touch_pairs(
    conversions: DataFrame,
    touches: DataFrame,
    horizon_days: int = 7,
    conversion_type: str = "purchase",
    touch_type: str = "click",
    watermark: str = "14 days",
) -> DataFrame:
    """T-tier × E74: the attribution join as a STREAM-STREAM time-interval
    join — the canonical structured-streaming shape this tier had not yet
    exercised (T1/T2 are windowed aggs, T4 is stream-static): two live
    event streams joined on the user with a time-bound predicate
    (touch within [conversion − horizon, conversion]), watermarks on
    BOTH sides so Spark can age out join state — without the interval
    bound + watermarks a stream-stream join must buffer both streams
    forever. Emits the eligible (conversion, touch) PAIRS in append mode
    as each pair becomes provable; the batch `touch_attribution`
    aggregation is a downstream read over the emitted pairs (kept out of
    the stream: chaining another stateful aggregate after a stream-stream
    join narrows the supported output modes, and the pair stream is the
    reusable artifact). Completeness contract: pairs whose touch arrives
    within the watermark horizon of the conversion (and vice versa) are
    guaranteed; later-than-watermark arrivals are best-effort (the T3
    rule). The replay test asserts streamed pairs ≡ the batch join's
    pairs on the same fixture."""
    c = (
        conversions.filter(
            (F.col("event_type") == conversion_type)
            & F.col("value").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("conv_id"),
            F.col("ts").alias("conv_ts"),
            F.col("value").alias("conv_value"),
        )
        .withWatermark("conv_ts", watermark)
    )
    t = (
        touches.filter(
            (F.col("event_type") == touch_type) & F.col("ts").isNotNull()
        )
        .select(
            F.col("user_id").alias("t_user"),
            F.col("event_id").alias("touch_id"),
            F.col("ts").alias("touch_ts"),
        )
        .withWatermark("touch_ts", watermark)
    )
    return c.join(
        t,
        F.expr(
            f"c_user = t_user AND touch_ts <= conv_ts "
            f"AND touch_ts >= conv_ts - INTERVAL {int(horizon_days)} DAYS"
        ),
        "inner",
    ).select("conv_id", "conv_ts", "conv_value", "touch_id", "touch_ts")


def stream_decontaminate(docs: DataFrame, benchmark: DataFrame) -> DataFrame:
    """T4 × E7: continuous-ingest decontamination — drop streamed documents
    whose normalized-text fingerprint appears in the (static, broadcast)
    benchmark. Stream-static LEFT ANTI join: the benchmark hash set is
    re-broadcast per micro-batch, the stream is never shuffled, and the
    semantics are exactly ``operators.decontaminate.exact_decontaminate``
    on the same rows (asserted batch≡stream in tests)."""
    from audience_finder_pro_spark.functions.text import norm_text_hash

    bench_hashes = benchmark.select(norm_text_hash("text").alias("_bh")).distinct()
    return docs.join(
        F.broadcast(bench_hashes), norm_text_hash("text") == F.col("_bh"), "left_anti"
    )


def run_stream_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming plan to completion over the available files and
    return the SparkSession-queryable memory table name (test harness;
    production sinks are kafka/parquet/foreachBatch)."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


def run_stream_to_parquet(
    df: DataFrame, out_path: str, checkpoint: str, output_mode: str = "append"
):
    """Production file sink: checkpointed, exactly-once per restart cycle.

    The checkpoint directory carries source offsets + sink commit log, so a
    restarted query resumes after the last committed batch instead of
    reprocessing (verified by the restart test). availableNow drains what
    exists and stops — the batch-ingest pattern for a 100 TB backfill.
    """
    q = (
        df.writeStream.outputMode(output_mode)
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_stream_foreach_batch_upsert(
    df: DataFrame,
    out_path: str,
    checkpoint: str,
    partition_col: str,
):
    """foreachBatch sink: idempotent partition-overwrite upsert.

    Each micro-batch dynamically overwrites ONLY the partitions it
    touches (partitionOverwriteMode=dynamic), so replaying a batch after
    a failure rewrites the same partitions instead of duplicating —
    idempotence without a transactional table format. This is the
    aggregation-refresh pattern: the batch carries recomputed rows for
    its windows/keys, and the sink keeps exactly the latest version.
    """

    def write_batch(batch_df, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(out_path)
        )

    q = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_stream_incremental_rollup(
    stream_df: DataFrame,
    key_cols: list[str],
    value_col: str,
    state_dir: str,
    checkpoint: str,
    state_fn=None,
    merge_fn=None,
):
    """foreachBatch driver for the E41 mergeable rollup — the seam between
    the batch incremental tier (operators/incremental.py) and T1–T4: the
    daily-ingest loop where each micro-batch's delta is absorbed into a
    persisted aggregate state WITHOUT rescanning history (the reference
    recomputes per request behind a TTL cache, app.py:222-258; this is
    the standing-pipeline form).

    Per epoch: ``rollup_state`` over the batch delta →
    ``merge_rollup_states`` with the latest persisted state → write a NEW
    versioned snapshot ``state_dir/v{batch_id}``. Versioning by batch_id
    makes replay idempotent: a batch re-delivered after a crash re-derives
    its snapshot from the highest version BELOW its own id, so the retry
    overwrites v{id} with the identical frame instead of double-counting
    the delta (the same at-least-once-safe shape as the partition-
    overwrite upsert above). Only state rows — bounded by |keys| — are
    read or written per epoch, never raw history; the E41 monoid contract
    (decimal sums: exact, associative, commutative) is what guarantees
    stream-merged state ≡ one-pass batch recompute bit-for-bit, epoch
    grouping be damned. The directory listing runs on the driver against
    the state location (swap for a table-format catalog in production).

    ``state_fn``/``merge_fn`` swap in any other mergeable-state monoid —
    e.g. ``histogram_state``/``merge_histogram_states`` (E42, integer
    bin counts) — with the same versioned-snapshot idempotence;
    ``state_fn`` takes the batch frame, ``merge_fn`` a list of states.
    Defaults are the E41 rollup pair.
    """
    import os

    from audience_finder_pro_spark.operators.incremental import (
        merge_rollup_states,
        rollup_state,
    )

    if state_fn is None:
        def state_fn(batch_df):
            return rollup_state(batch_df, key_cols, value_col)
    if merge_fn is None:
        merge_fn = merge_rollup_states

    def write_batch(batch_df, batch_id: int) -> None:
        delta = state_fn(batch_df)
        prior = (
            [
                int(d[1:])
                for d in os.listdir(state_dir)
                if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < batch_id
            ]
            if os.path.isdir(state_dir)
            else []
        )
        if prior:
            prev = batch_df.sparkSession.read.parquet(
                os.path.join(state_dir, f"v{max(prior)}")
            )
            delta = merge_fn([prev, delta])
        delta.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id}")
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_stream_state_catalog(
    stream_df: DataFrame,
    catalog: dict,
    state_root: str,
    checkpoint: str,
):
    """ONE foreachBatch stream maintaining a whole CATALOG of mergeable
    state families at once (the r11 consolidation ask): ``catalog`` maps
    family name → (state_fn, merge_fn), and every micro-batch's delta is
    absorbed into EVERY family's persisted state in the same epoch —
    the integration a real daily-ingest pipeline runs (one pass over
    the delta feeds the rollup AND the histogram AND the audience
    sketch AND the heavy-hitters ...), not one stream per family.

    Per family the snapshot rule is identical to
    ``run_stream_incremental_rollup``: versioned ``v{batch_id}``
    directories under ``state_root/<family>``, each derived from the
    highest version BELOW the batch id, so an at-least-once re-delivery
    overwrites its own snapshot with the identical frame instead of
    double-counting (idempotent replay, per family). Families are
    processed in sorted-name order inside the epoch — order is
    irrelevant to the result (each family's state only ever sees its
    own snapshots) but makes failures reproducible. Only state rows —
    bounded per the family's contract (|keys|, keys×bins, capacity
    rows, 2^lg_k hashes) — are read or written per epoch, never raw
    history. Read back with ``latest_catalog_states`` and compose with
    ``operators/incremental.state_catalog_read``."""
    import os

    if not catalog:
        raise ValueError("run_stream_state_catalog needs a non-empty catalog")

    def write_batch(batch_df, batch_id: int) -> None:
        for name in sorted(catalog):
            state_fn, merge_fn = catalog[name]
            state_dir = os.path.join(state_root, name)
            delta = state_fn(batch_df)
            prior = (
                [
                    int(d[1:])
                    for d in os.listdir(state_dir)
                    if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < batch_id
                ]
                if os.path.isdir(state_dir)
                else []
            )
            if prior:
                prev = batch_df.sparkSession.read.parquet(
                    os.path.join(state_dir, f"v{max(prior)}")
                )
                delta = merge_fn([prev, delta])
            delta.write.mode("overwrite").parquet(
                os.path.join(state_dir, f"v{batch_id}")
            )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def latest_catalog_states(
    spark: SparkSession, state_root: str, names: list[str]
) -> dict:
    """The most recent snapshot of every named family maintained by
    ``run_stream_state_catalog`` — the dict ``state_catalog_read``
    composes into the one dashboard frame."""
    import os

    return {
        name: latest_rollup_state(spark, os.path.join(state_root, name))
        for name in names
    }


def latest_rollup_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The most recent versioned snapshot written by
    ``run_stream_incremental_rollup`` (what a dashboard would read)."""
    import os

    versions = [
        int(d[1:])
        for d in os.listdir(state_dir)
        if d.startswith("v") and d[1:].isdigit()
    ]
    if not versions:
        raise ValueError(f"no rollup state snapshots under {state_dir}")
    return spark.read.parquet(os.path.join(state_dir, f"v{max(versions)}"))


DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents as a stream — the continuous-ingest curation source.

    The path targets the documents data specifically (file-source paths
    accept globs): an sf_dir holds every table as sibling parquet files,
    and an explicit schema would silently null-fill rows from orders/
    lineitem/... rather than erroring. The trailing ``*`` keeps the
    source's basePath a directory whether ``documents.parquet`` is a
    single file or a directory of part files.
    """
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sf_dir}/documents.parquet*")
    )


def quality_gate(docs: DataFrame) -> DataFrame:
    """Streaming curation gate: per-doc quality metrics + PII count +
    redaction as a STATELESS projection, so the same expressions run
    identically on a batch DataFrame or incrementally in append mode with
    zero state (the batch≡stream test holds row-for-row).

    Per-row array expressions replace the batch tier's explode+groupBy
    (a per-doc groupBy in a stream is unbounded state): n_tokens/
    n_distinct via size(), mean word length as chars-of-joined-tokens /
    n_tokens (all native — no interpreted lambdas). The gate keeps docs
    with enough tokens, enough distinct tokens (cross-multiplied integer
    compare), and no detected PII in the redacted output's stead.
    """
    from audience_finder_pro_spark.functions.quality import (
        EMAIL_RE,
        PHONE_RE,
        pii_count,
        redact_pii,
    )
    from audience_finder_pro_spark.functions.text import tokens

    tok = tokens("text")
    out = docs.select(
        "doc_id",
        "source",
        F.size(tok).alias("n_tokens"),
        F.size(F.array_distinct(tok)).alias("n_distinct"),
        F.round(
            F.when(
                F.size(tok) > 0,
                F.length(F.array_join(tok, "")) * 1.0 / F.size(tok),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("mean_word_len"),
        (pii_count("text", EMAIL_RE) + pii_count("text", PHONE_RE)).alias("n_pii"),
        F.md5(redact_pii("text")).alias("redacted_hash"),
    )
    return out.withColumn(
        "passes_gate",
        (F.col("n_tokens") >= 20)
        & (4 * F.col("n_distinct") >= F.col("n_tokens"))
        & (F.col("n_pii") == 0),
    )
