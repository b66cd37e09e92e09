#!/usr/bin/env python
"""Round-11 leg-optimization A/B: fast-path leak (expression splits),
single-pass hist, single-pass overlap — vs the current 3-slice/join forms."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from audience_finder_pro_spark.operators.dedup import ngram_jaccard_pairs
from audience_finder_pro_spark.operators.incremental import (
    histogram_state,
    overlap_from_state,
    theta_state,
)
from audience_finder_pro_spark.operators.sampling import hash_bucket
from audience_finder_pro_spark.queries import llm
from audience_finder_pro_spark.queries.llm import load_table
from audience_finder_pro_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def best_of(fn, runs=3):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def t(name, df_fn):
    s = best_of(lambda: df_fn().write.format("noop").mode("overwrite").save())
    print(f"{name:24s} spark {s:6.3f}")
    return s


def main():
    os.system("uptime")
    spark = get_spark("vc-ab2")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    def split_of(c):
        b = hash_bucket(c, "split")
        return F.when(b < 9000, F.lit("train")).when(b < 9500, F.lit("val")).otherwise(F.lit("test"))

    def leak_fast():
        docs = load_table(spark, SF, "documents", fan_out=True)
        pairs = ngram_jaccard_pairs(docs, threshold=0.8, df_cap_frac=0.05)
        sa, sb = split_of(F.col("id_a")), split_of(F.col("id_b"))
        return (
            pairs.select(F.least(sa, sb).alias("split_a"), F.greatest(sa, sb).alias("split_b"))
            .groupBy("split_a", "split_b")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
            .withColumn("is_leak", (F.col("split_a") != F.col("split_b")).cast("int"))
        )

    def hist_one():
        ev = load_table(spark, SF, "events").select(
            F.col("event_type").alias("key"), F.col("value")
        )
        return histogram_state(ev, ["key"], "value", lo=0.0, hi=500.0, n_bins=20)

    def overlap_one():
        ev = load_table(spark, SF, "events").select("event_type", "user_id")
        return overlap_from_state(theta_state(ev, ["event_type"], "user_id", lg_k=14))

    # warmup
    hist_one().write.format("noop").mode("overwrite").save()

    t("leak_fast", leak_fast)
    t("leak_current(join)", lambda: llm.split_leakage_q(spark, SF))
    t("hist_one", hist_one)
    t("hist_current(3slice)", lambda: llm.histogram_state_q(spark, SF))
    t("overlap_one", overlap_one)
    t("overlap_current(3slice)", lambda: llm.audience_overlap_q(spark, SF))

    # sanity: results identical?
    for nm, new, old in [
        ("leak", leak_fast, lambda: llm.split_leakage_q(spark, SF)),
        ("hist", hist_one, lambda: llm.histogram_state_q(spark, SF)),
    ]:
        a = {tuple(r) for r in new().collect()}
        b = {tuple(r) for r in old().collect()}
        print(nm, "identical:", a == b, len(a), len(b))
    # overlap: compare reads (sketch binary differs, reads must match)
    a = {tuple(r) for r in overlap_one().collect()}
    b = {tuple(r) for r in llm.audience_overlap_q(spark, SF).collect()}
    print("overlap reads identical:", a == b, len(a), len(b))
    os.system("uptime")


if __name__ == "__main__":
    main()
