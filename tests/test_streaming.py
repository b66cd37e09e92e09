"""Streaming replay tests (SURVEY §5 item 4, §2.9 T1-T5):
drive the streaming plans over the events fixture with readStream +
memory sink and assert equivalence with the batch oracle-checked plans.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from audience_finder_pro_spark.queries.streaming import (
    stream_session_window,
    stream_tumbling_agg,
)
from audience_finder_pro_spark.session import load_table
from audience_finder_pro_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    session_agg,
    stateful_dedup,
    stream_static_join,
    tumbling_agg,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def events_dir(spark, sf_smoke, tmp_path_factory):
    """Split events into several files so the stream sees multiple micro-batches."""
    out = tmp_path_factory.mktemp("events_stream")
    load_table(spark, sf_smoke, "events").repartition(4).write.mode("overwrite").parquet(str(out))
    return str(out)


def _read_stream(spark, events_dir):
    from audience_finder_pro_spark.streaming.jobs import EVENTS_SCHEMA

    return (
        spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(events_dir)
    )


def test_tumbling_stream_equals_batch(spark, sf_smoke, events_dir):
    """T1: watermarked tumbling agg over the replay == batch plan (complete mode
    so every window is emitted regardless of watermark progress)."""
    stream = _read_stream(spark, events_dir)
    name = run_stream_to_memory(tumbling_agg(stream), "t1_out", output_mode="complete")
    got = _rows(spark.table(name))
    want = _rows(stream_tumbling_agg(spark, sf_smoke))
    assert got == want


def test_sliding_stream_equals_batch(spark, sf_smoke, events_dir):
    """T1 sliding: watermarked 3h/1h sliding agg over the replay == the
    stream_window_aggs sliding batch leg (complete mode emits all windows)."""
    from audience_finder_pro_spark.queries.streaming import stream_sliding_agg
    from audience_finder_pro_spark.streaming.jobs import sliding_agg

    stream = _read_stream(spark, events_dir)
    name = run_stream_to_memory(sliding_agg(stream), "t1_slide_out", output_mode="complete")
    got = _rows(spark.table(name))
    want = _rows(stream_sliding_agg(spark, sf_smoke))
    assert got == want


def test_session_stream_equals_batch(spark, sf_smoke, events_dir):
    """T2: session windows (gap merge) over the replay == batch session_window."""
    # Files arrive in random time order, so a short watermark would mark most
    # rows late (session windows filter late input even in complete mode);
    # use a horizon wider than the fixture's time span to test pure merge logic.
    stream = _read_stream(spark, events_dir)
    name = run_stream_to_memory(
        session_agg(stream, watermark="3650 days"), "t2_out", output_mode="complete"
    )
    got = _rows(spark.table(name))
    want = _rows(stream_session_window(spark, sf_smoke))
    assert got == want


def test_stateful_dedup(spark, events_dir):
    """T4: duplicated input stream → dropDuplicatesWithinWatermark restores
    exactly-once per event_id within the watermark horizon."""
    stream = _read_stream(spark, events_dir)
    doubled = stream.unionByName(stream)  # every event arrives twice
    name = run_stream_to_memory(stateful_dedup(doubled), "t4_out", output_mode="append")
    got = spark.table(name)
    n_distinct = got.select("event_id").distinct().count()
    assert got.count() == n_distinct  # no duplicate survived


def test_stream_static_join(spark, sf_smoke, events_dir):
    """T4: stream ⋈ static dim matches the batch join."""
    user_dim = (
        load_table(spark, sf_smoke, "events")
        .select("user_id")
        .distinct()
        .withColumn("user_tag", F.concat(F.lit("u"), F.col("user_id")))
    )
    stream = _read_stream(spark, events_dir)
    joined = stream_static_join(stream, user_dim).select("event_id", "user_id", "user_tag")
    name = run_stream_to_memory(joined, "t4b_out", output_mode="append")
    got = _rows(spark.table(name))
    want = _rows(
        stream_static_join(load_table(spark, sf_smoke, "events"), user_dim).select(
            "event_id", "user_id", "user_tag"
        )
    )
    assert got == want


def test_watermark_gates_append_emission(spark, tmp_path):
    """T3: append-mode windowed aggregation emits exactly the windows the
    watermark has closed and withholds still-open windows.

    Note: Spark's *drop* of late input is explicitly best-effort (the guarantee
    is that on-time data is never dropped) — on 4.1.2 a late row for a window
    with no live state is still aggregated and finalized immediately, so the
    deterministic, guaranteed semantics to pin are watermark advancement and
    emission gating."""
    import time
    from datetime import datetime

    d = tmp_path / "late"
    d.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    # batch 1: fresh rows advancing the watermark far past the late row
    spark.createDataFrame(
        [(1, datetime(2024, 1, 10, 12, 0), 1, "view", 1.0, "{}"),
         (2, datetime(2024, 1, 10, 12, 30), 1, "view", 1.0, "{}")],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(d))
    # pin micro-batch order: the file source orders files by modification time,
    # so force batch-1 files older than the late file written next
    import os

    now = time.time()
    for p in d.rglob("*"):
        os.utime(p, (now - 300, now - 300))
    # batch 2: a row 9 days late — beyond the 1 hour watermark
    spark.createDataFrame(
        [(3, datetime(2024, 1, 1, 0, 0), 1, "view", 99.0, "{}")], schema
    ).coalesce(1).write.mode("append").parquet(str(d))

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(d))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(F.sum("value").alias("v"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("ws"), "v")
    )
    q = agg.writeStream.outputMode("append").format("memory").queryName("t3_out").start()
    q.processAllAvailable()
    watermark = q.lastProgress["eventTime"].get("watermark", "")
    q.stop()
    rows = {r["ws"]: r["v"] for r in spark.table("t3_out").collect()}
    # batch 1 (12:00/12:30 rows) advanced the watermark to 11:30
    assert watermark.startswith("2024-01-10T11:30")
    # the 12:00-18:00 window is still open (end > watermark) → withheld
    assert "2024-01-10 12:00" not in rows
    # the late row's window (end 06:00 < watermark) was closed → finalized
    assert rows == {"2024-01-01 00:00": 99.0}


def test_cancellation_and_progress(spark, sf_smoke):
    """T5: job-group cancellation wrapper + progress snapshot are wired."""
    from audience_finder_pro_spark.control import job_group, progress_snapshot

    with job_group(spark, "t5-group", "smoke"):
        n = load_table(spark, sf_smoke, "events").count()
    assert n > 0
    snap = progress_snapshot(spark)
    assert "active_jobs" in snap and "stages" in snap


def test_stateful_running_totals(spark, sf_smoke, events_dir):
    """D3/T-tier: applyInPandasWithState carries per-key state across
    micro-batches; the last emission per user equals the batch totals."""
    from audience_finder_pro_spark.streaming.stateful import running_totals

    stream = _read_stream(spark, events_dir)
    q = (
        running_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_state_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("t_state_out").toPandas()
    # update mode appends one row per (user, batch); the final cumulative row
    # per user (max n_events) must equal the batch aggregate
    last = out.sort_values("n_events").groupby("user_id").last()
    want = {
        r["user_id"]: (r["n"], round(r["t"], 4))
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    got = {uid: (row["n_events"], round(row["total_value"], 4)) for uid, row in last.iterrows()}
    assert got == want


def test_parquet_sink_checkpoint_restart_exactly_once(spark, tmp_path):
    """T-tier production sink: restarting from the same checkpoint must not
    duplicate already-committed batches."""
    from audience_finder_pro_spark.streaming.jobs import (
        EVENTS_SCHEMA,
        run_stream_to_parquet,
    )

    src = tmp_path / "src"
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    base = load_table(spark, "/root/testdata/sf0.001", "events")
    base.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(str(src))
    run_stream_to_parquet(stream.select("event_id", "ts", "value"), out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == base.filter(F.col("event_id") % 2 == 0).count()

    # new data arrives; restart from the same checkpoint
    base.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(str(src))
    stream2 = spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(str(src))
    run_stream_to_parquet(stream2.select("event_id", "ts", "value"), out, ckpt)

    sunk = spark.read.parquet(out)
    assert sunk.count() == base.count()  # every event exactly once
    assert sunk.select("event_id").distinct().count() == base.count()


def test_foreach_batch_upsert_idempotent(spark, tmp_path):
    """foreachBatch + dynamic partition overwrite: updated aggregates for a
    key replace the partition's previous rows instead of appending."""
    from audience_finder_pro_spark.streaming.jobs import (
        EVENTS_SCHEMA,
        run_stream_foreach_batch_upsert,
    )

    src = tmp_path / "src"
    out = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ck")
    src.mkdir()
    base = load_table(spark, "/root/testdata/sf0.001", "events")
    base.coalesce(3).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(str(src))
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total")
    )
    run_stream_foreach_batch_upsert(agg, out, ckpt, "event_type")

    got = {r["event_type"]: (r["n"], r["total"]) for r in spark.read.parquet(out).collect()}
    want = {
        r["event_type"]: (r["n"], r["total"])
        for r in base.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .collect()
    }
    # every micro-batch re-upserted its keys; final state == batch aggregate,
    # one row per key (no append duplication across the 3 micro-batches)
    assert got == want
    assert spark.read.parquet(out).count() == len(want)


def test_incremental_rollup_stream_equals_batch_recompute(spark, sf_smoke, tmp_path):
    """E41 × T-tier seam (VERDICT r9 #4): replay the events fixture in ≥3
    controlled epochs through the foreachBatch incremental-rollup runner
    and assert the final merged streaming state equals the one-pass batch
    recompute EXACTLY (the decimal monoid makes epoch grouping
    irrelevant), including the min/max/count legs. Then replay the whole
    stream again with a fresh checkpoint into the SAME state dir: the
    versioned-by-batch-id snapshots overwrite deterministically, so the
    retry changes nothing (at-least-once safety)."""
    from audience_finder_pro_spark.operators.incremental import rollup_state
    from audience_finder_pro_spark.streaming.jobs import (
        EVENTS_SCHEMA,
        latest_rollup_state,
        run_stream_incremental_rollup,
    )

    src = tmp_path / "src"
    state = str(tmp_path / "state")
    src.mkdir()
    base = load_table(spark, sf_smoke, "events")
    base.repartition(4).write.mode("append").parquet(str(src))  # 4 epochs

    def replay(ckpt: str) -> None:
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        run_stream_incremental_rollup(
            stream, ["event_type"], "value", state, ckpt
        )

    replay(str(tmp_path / "ck1"))
    import os

    n_epochs = len([d for d in os.listdir(state) if d.startswith("v")])
    assert n_epochs >= 3, f"only {n_epochs} epochs materialized"

    def state_rows(df):
        return sorted(
            (r["event_type"], r["n"], str(r["sum_value"]),
             str(r["min_value"]), str(r["max_value"]))
            for r in df.collect()
        )

    want = state_rows(rollup_state(base, ["event_type"], "value"))
    got = state_rows(latest_rollup_state(spark, state))
    assert got == want  # stream-merged state ≡ one-pass batch recompute

    replay(str(tmp_path / "ck2"))  # full redelivery: idempotent overwrite
    assert state_rows(latest_rollup_state(spark, state)) == want


def test_incremental_histogram_stream_equals_batch_recompute(spark, sf_smoke, tmp_path):
    """The E42 histogram monoid through the same foreachBatch seam:
    per-epoch histogram deltas merged by count addition equal the
    one-pass batch binning exactly (integer counts — no float caveat
    at all)."""
    from audience_finder_pro_spark.operators.incremental import (
        histogram_state,
        merge_histogram_states,
    )
    from audience_finder_pro_spark.streaming.jobs import (
        EVENTS_SCHEMA,
        latest_rollup_state,
        run_stream_incremental_rollup,
    )

    src = tmp_path / "src"
    state = str(tmp_path / "state")
    src.mkdir()
    base = load_table(spark, sf_smoke, "events")
    base.repartition(3).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_stream_incremental_rollup(
        stream,
        ["event_type"],
        "value",
        state,
        str(tmp_path / "ck"),
        state_fn=lambda b: histogram_state(
            b, ["event_type"], "value", lo=0.0, hi=500.0, n_bins=20
        ),
        merge_fn=merge_histogram_states,
    )
    got = sorted(
        (r["event_type"], r["bin"], r["bin_n"])
        for r in latest_rollup_state(spark, state).collect()
    )
    want = sorted(
        (r["event_type"], r["bin"], r["bin_n"])
        for r in histogram_state(
            base, ["event_type"], "value", lo=0.0, hi=500.0, n_bins=20
        ).collect()
    )
    assert got == want and len(got) > 0


def test_quality_gate_stream_equals_batch(spark, sf_smoke, tmp_path):
    """The curation gate is stateless, so the streamed result must equal
    the batch result row-for-row on the same files."""
    import shutil

    from audience_finder_pro_spark.streaming.jobs import (
        quality_gate,
        read_documents_stream,
        run_stream_to_memory,
    )

    # stage a REALISTIC sf_dir: documents alongside a sibling table, so this
    # test fails if the stream reader ever regresses to globbing the whole
    # directory (it would silently ingest orders rows null-filled — ADVICE r2)
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    shutil.copy(f"{sf_smoke}/documents.parquet", docs_dir / "documents.parquet")
    shutil.copy(f"{sf_smoke}/orders.parquet", docs_dir / "orders.parquet")

    batch = quality_gate(spark.read.parquet(str(docs_dir / "documents.parquet"))).collect()
    name = run_stream_to_memory(
        quality_gate(read_documents_stream(spark, str(docs_dir))), "qgate_mem"
    )
    streamed = spark.table(name).collect()
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))
    flags = {r.doc_id: r.passes_gate for r in batch}
    assert any(flags.values()) and len(flags) > 0


def test_stateful_dedup_differential_with_late_duplicates(spark, sf_smoke, tmp_path):
    """T4 hardening (VERDICT r2 item 6): batch≡stream row-for-row for
    dropDuplicatesWithinWatermark on a fixture with INJECTED late +
    duplicate rows. Duplicates are planted within the watermark horizon
    (Spark guarantees dedup there; beyond it the drop is best-effort, so
    asserting would pin an implementation accident, not a contract):

    - file 1: the original events,
    - file 2: re-sends of every 3rd event with ts shifted +10 min (late
      re-delivery inside the 1h watermark) plus genuinely new events.

    Expected = batch dropDuplicates(event_id) over the union: every
    event_id exactly once, first-arrival payload preserved.
    """
    import shutil

    events = load_table(spark, sf_smoke, "events")
    max_id = events.agg(F.max("event_id")).collect()[0][0]
    resend = events.filter(F.col("event_id") % 3 == 0).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 10 MINUTES")
    )
    fresh = events.filter(F.col("event_id") % 7 == 0).withColumn(
        "event_id", F.col("event_id") + F.lit(max_id + 1)
    )
    # stage as FLAT part files (the file stream source doesn't recurse)
    staged = tmp_path / "ev"
    staged.mkdir()
    for name, df in (("f1", events), ("f2", resend.unionByName(fresh))):
        spool = tmp_path / f"spool_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(str(spool))
        part = next(p for p in spool.iterdir() if p.name.endswith(".parquet"))
        shutil.copy(part, staged / f"{name}.parquet")

    stream = _read_stream(spark, str(staged))
    name = run_stream_to_memory(stateful_dedup(stream), "t4_diff_out", output_mode="append")
    got = spark.table(name)

    # exactly-once per key, and count = distinct keys of the full input
    batch_union = spark.read.parquet(str(staged))
    assert got.count() == batch_union.select("event_id").distinct().count()
    assert got.groupBy("event_id").count().filter("count > 1").count() == 0
    # the surviving row for a duplicated key is ONE of the delivered copies
    # (micro-batch file order isn't part of the contract); every output row
    # must be an actual input row
    in_rows = {tuple(r) for r in batch_union.collect()}
    for r in got.collect():
        assert tuple(r) in in_rows


def test_stream_decontaminate_equals_batch(spark, sf_smoke):
    """T4 x E7: streamed exact decontamination == the batch anti-join on the
    same rows (benchmark = every 50th doc)."""
    from audience_finder_pro_spark.operators.decontaminate import exact_decontaminate
    from audience_finder_pro_spark.streaming.jobs import (
        read_documents_stream,
        stream_decontaminate,
    )

    docs = load_table(spark, sf_smoke, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0).select("text")
    stream = read_documents_stream(spark, sf_smoke)
    name = run_stream_to_memory(
        stream_decontaminate(stream, bench), "t4e7_out", output_mode="append"
    )
    got = sorted(r.doc_id for r in spark.table(name).select("doc_id").collect())
    want = sorted(r.doc_id for r in exact_decontaminate(docs, bench).select("doc_id").collect())
    assert got == want and len(got) < docs.count()


def test_state_catalog_through_one_stream(spark, sf_smoke, tmp_path):
    """The r11 consolidation ask, end-to-end (grown to ALL ELEVEN
    families in r13 per VERDICT r12 ask #4): ONE foreachBatch stream
    (streaming/jobs.run_stream_state_catalog) absorbs every micro-batch
    into every state family at once — rollup, histogram, theta, topk,
    decayed, trend, bottomk, cm, hll, kll, wbottomk — and the unified
    state_catalog_read over the streamed states equals the batch frame
    row-for-row (the eight exact families chain to the declared
    `state_catalog` hash gate; the hll/kll sketch families are
    compared at the READ because their binaries are history-dependent —
    at smoke scale both sit in their exact regimes: HLL sparse at 15
    distinct vs 2^12 registers, KLL uncompacted at ~200 values/key vs
    k=800, so the reads are replay-deterministic and row-equal too).
    A second full redelivery with a fresh checkpoint changes nothing
    (per-family idempotent snapshots)."""
    import os

    from audience_finder_pro_spark.operators.incremental import (
        state_catalog_read,
    )
    from audience_finder_pro_spark.queries.llm import (
        _build_catalog_states,
        _catalog_family_fns,
        _catalog_merge_fns,
    )
    from audience_finder_pro_spark.streaming.jobs import (
        EVENTS_SCHEMA,
        latest_catalog_states,
        run_stream_state_catalog,
    )

    src = tmp_path / "src"
    state_root = str(tmp_path / "states")
    src.mkdir()
    base = load_table(spark, sf_smoke, "events")
    base.repartition(3).write.mode("append").parquet(str(src))  # 3 epochs

    fns, merges = _catalog_family_fns(), _catalog_merge_fns()
    catalog = {name: (fns[name], merges[name]) for name in fns}

    def replay(ckpt: str) -> None:
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        run_stream_state_catalog(stream, catalog, state_root, ckpt)

    replay(str(tmp_path / "ck1"))
    assert sorted(os.listdir(state_root)) == sorted(fns)  # every family
    n_epochs = len(os.listdir(os.path.join(state_root, "rollup")))
    assert n_epochs >= 2, f"only {n_epochs} epochs materialized"

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    def read(states):
        return state_catalog_read(
            states,
            topk_k=5,
            bottomk_k=32,
            cm_probes=spark.range(1, 6).select(F.col("id").alias("item")),
            wbottomk_k=16,
        )

    streamed = rows(read(latest_catalog_states(spark, state_root, sorted(fns))))
    batch = rows(
        read(
            _build_catalog_states(
                base.select("event_type", "user_id", "value", "ts", "event_id")
            )
        )
    )
    assert streamed == batch
    assert {r[0] for r in streamed} == set(fns)  # all eleven legs populated

    replay(str(tmp_path / "ck2"))  # full redelivery: idempotent
    assert rows(
        read(latest_catalog_states(spark, state_root, sorted(fns)))
    ) == streamed


def test_new_state_families_stream_through_catalog_seam(spark, sf_smoke, tmp_path):
    """E67 bottom-k and E68 count-min plug into the SAME one-stream
    catalog seam as the six core families (state_fn/merge_fn is the
    whole contract): a 3-epoch replay's merged states equal the
    one-pass batch builds exactly — bottom-k because min-k union is
    order-free, count-min because cells are an exact monoid."""
    from audience_finder_pro_spark.operators.incremental import (
        bottomk_state,
        cm_state,
        merge_bottomk_states,
        merge_cm_states,
    )
    from audience_finder_pro_spark.streaming.jobs import (
        EVENTS_SCHEMA,
        latest_catalog_states,
        run_stream_state_catalog,
    )

    src = tmp_path / "src"
    state_root = str(tmp_path / "states")
    src.mkdir()
    base = load_table(spark, sf_smoke, "events")
    base.repartition(3).write.mode("append").parquet(str(src))

    catalog = {
        "bottomk": (
            lambda b: bottomk_state(b, ["event_type"], "user_id", k=16),
            # prev snapshots come back from parquet without the build-k
            # marker — the stream owner asserts how they were built
            lambda ss: merge_bottomk_states(ss, k=16, input_k=16),
        ),
        "cm": (
            lambda b: cm_state(b, ["event_type"], "user_id"),
            merge_cm_states,
        ),
    }
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_stream_state_catalog(stream, catalog, state_root, str(tmp_path / "ck"))

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    streamed = latest_catalog_states(spark, state_root, ["bottomk", "cm"])
    assert rows(streamed["bottomk"]) == rows(
        bottomk_state(base, ["event_type"], "user_id", k=16)
    )
    assert rows(streamed["cm"]) == rows(
        cm_state(base, ["event_type"], "user_id")
    )


def test_stream_stream_interval_join_touch_pairs(spark, sf_smoke, events_dir):
    """T-tier x E74 (r13): the attribution join as a STREAM-STREAM
    time-interval join with watermarks on both sides — the streamed
    (conversion, touch) pair set must equal the batch join's pairs on
    the same fixture (watermark wider than the fixture span, so nothing
    ages out mid-replay), and every pair must satisfy the closed
    horizon."""
    from audience_finder_pro_spark.streaming.jobs import stream_touch_pairs

    conv = _read_stream(spark, events_dir)
    touch = _read_stream(spark, events_dir)
    name = run_stream_to_memory(
        stream_touch_pairs(conv, touch, watermark="3650 days"),
        "t_ssj_out",
        output_mode="append",
    )
    got = {(r.conv_id, r.touch_id) for r in spark.table(name).collect()}

    ev = load_table(spark, sf_smoke, "events")
    c = ev.filter(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull() & F.col("ts").isNotNull()
    ).select(F.col("user_id").alias("u"), F.col("event_id").alias("cid"),
             F.col("ts").alias("cts"))
    t = ev.filter(
        (F.col("event_type") == "click") & F.col("ts").isNotNull()
    ).select(F.col("user_id").alias("u"), F.col("event_id").alias("tid"),
             F.col("ts").alias("tts"))
    want = {
        (r.cid, r.tid)
        for r in c.join(t, "u")
        .filter((F.col("tts") <= F.col("cts"))
                & (F.col("tts") >= F.col("cts") - F.expr("INTERVAL 7 DAYS")))
        .collect()
    }
    assert got == want and len(got) > 0
