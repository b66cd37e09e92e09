#!/usr/bin/env python
"""Audience & event-analytics tour — the r10 operator tiers.

Run: python examples/audience_analytics.py [sf_dir]
     (defaults to the sf0.001 fixtures)

The reference app's core question is "which communities share an
audience?" answered by a single-threaded Python loop. This walkthrough
asks it — and the questions that surround it in a standing pipeline —
with the engine's distributed operators, on one SparkSession:

  1. audience overlap   — theta-sketch set algebra: distinct-user
                          intersection + Jaccard between event types
  2. exact quantiles    — per-key medians without a per-key sort
  3. robust outliers    — median/MAD modified-z profile per key
  4. seasonality        — trend + weekly seasonal + residual on the
                          daily count series
  5. communities        — label propagation over the near-dup graph
  6. compressed ANN     — PQ codes + ADC scan + exact rerank
  7. curve layout       — Z-order write for multi-dim file skipping

Every stage prints a small head so the shapes are visible; all of it is
lazy DataFrame plans until the show/collect. The same code runs
unchanged under spark-submit on a real cluster.
"""
import sys
import tempfile

sys.path.insert(0, ".")
from pyspark.sql import functions as F

from audience_finder_pro_spark.session import get_spark, load_table


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("audience-analytics-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    events = load_table(spark, sf, "events")
    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")

    # 1. which event audiences overlap? (exact below 2^lg_k distinct ids)
    from audience_finder_pro_spark.operators.incremental import audience_overlap

    print("\n== audience overlap (theta set algebra) ==")
    audience_overlap(events, "event_type", "user_id").orderBy(
        F.desc("jaccard")
    ).show(5)

    # 2. exact per-type value quartiles — no key ever sorts its rows on one task
    from audience_finder_pro_spark.operators.skew import (
        exact_group_quantiles,
        grouped_mad,
    )

    print("== exact per-key quantiles ==")
    exact_group_quantiles(
        events.select("event_type", "value"), ["event_type"], "value",
        [0.25, 0.5, 0.75],
    ).orderBy("event_type", "q").show(6)

    # 3. robust outlier profile (50% breakdown: spikes can't hide themselves)
    print("== MAD outlier profile ==")
    grouped_mad(
        events.select("event_type", "value"), ["event_type"], "value"
    ).orderBy("event_type").show()

    # 4. is Monday always low, or is today actually anomalous?
    from audience_finder_pro_spark.operators.timeseries import seasonal_decompose

    print("== weekly seasonal decomposition of daily counts ==")
    daily = events.groupBy(
        F.col("event_type").alias("key"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    spine = (
        daily.groupBy("key")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select("key", F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"))
    )
    dense = spine.join(daily, ["key", "day"], "left").select(
        "key", "day", F.coalesce("n", F.lit(0)).alias("n")
    )
    seasonal_decompose(dense, "key", "day", "n", period=7).filter(
        F.col("trend").isNotNull()
    ).orderBy("key", "day").show(5)

    # 5. near-dup communities (LP sees structure CC can't: one component,
    #    several densely-linked pockets)
    from audience_finder_pro_spark.operators.dedup import ngram_jaccard_pairs
    from audience_finder_pro_spark.operators.graph import label_propagation

    print("== label-propagation communities over near-dup pairs ==")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, df_cap_frac=0.05)
    label_propagation(pairs, src_col="id_a", dst_col="id_b", n_iter=3).orderBy(
        "community", "node"
    ).show(5)

    # 6. compressed vector search: 8-byte codes + exact rerank
    from audience_finder_pro_spark.operators.pq import pq_encode, pq_fit, pq_topk

    print("== product-quantized ANN (32x smaller codes, exact rerank) ==")
    if emb.limit(64).count() == 64:
        books = pq_fit(emb, dim=64, m=8, n_codes=64, sample_n=10_000, iters=6)
        codes = pq_encode(emb, books)
        queries = emb.orderBy("vec_id").limit(3).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        pq_topk(codes, queries, books, k=3, refine_with=emb,
                refine_factor=5, dim=64).show()
    else:
        print("  (corpus too small to fit a codebook at this SF)")

    # 7. lay events out along the Z-curve of (user_id, value) so a
    #    conjunctive range predicate prunes files on BOTH columns
    from audience_finder_pro_spark.sources.warehouse import write_zordered

    print("== Z-order layout (per-file bounding boxes) ==")
    # bounds are declared model state — derive them from a stats pass,
    # as a production layout job would, and persist them with the layout
    stats = events.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    with tempfile.TemporaryDirectory() as td:
        write_zordered(
            events.select("user_id", "value"),
            f"{td}/events_z",
            ["user_id", "value"],
            bounds={
                "user_id": (float(stats[0]), float(stats[1]) + 1.0),
                "value": (float(stats[2]), float(stats[3]) + 1.0),
            },
            n_files=8,
            n_bits=8,
        )
        spark.read.parquet(f"{td}/events_z").groupBy(
            F.input_file_name().alias("file")
        ).agg(
            F.min("user_id").alias("u_min"), F.max("user_id").alias("u_max"),
            F.min("value").alias("v_min"), F.max("value").alias("v_max"),
        ).select("u_min", "u_max", "v_min", "v_max").orderBy("u_min").show(8)

    spark.stop()


if __name__ == "__main__":
    main()
