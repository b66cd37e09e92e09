#!/usr/bin/env python
"""Demote-vs-keep A/B for the validate_corpus carrier legs (VERDICT r10 #1).

Times the six-leg carrier and leg-subset variants in BOTH engines at sf0.1
(best-of-3 after warmup, noop sink / fetchall), plus each leg standalone,
so the demotion decision is measured, not guessed.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from audience_finder_pro_spark.queries import llm
from audience_finder_pro_spark.session import TABLES, get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def best_of(fn, runs=3):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


LEGS = {
    "validate": lambda s: llm.validate_plain_q(s, SF).select(
        F.lit("validate").alias("op"), F.col("rule").alias("k1"),
        F.col("kind").alias("k2"), F.col("column").alias("k3"),
        F.col("n_rows").alias("n1"), F.col("n_violations").alias("n2"),
        F.col("passed").cast("int").alias("f1"), F.lit(None).cast("int").alias("f2")),
    "privacy": lambda s: llm.privacy_audit_q(s, SF).select(
        F.lit("privacy").alias("op"), F.col("c_nationkey").cast("string").alias("k1"),
        F.col("c_mktsegment").alias("k2"), F.lit("c_acctbal").alias("k3"),
        F.col("class_size").alias("n1"), F.col("n_sensitive").alias("n2"),
        F.col("risky").alias("f1"), F.col("diverse").alias("f2")),
    "hist": lambda s: llm.histogram_state_q(s, SF).select(
        F.lit("hist").alias("op"), F.col("key").alias("k1"),
        F.col("bin").cast("string").alias("k2"), F.lit("value").alias("k3"),
        F.col("bin_n").alias("n1"), F.lit(None).cast("bigint").alias("n2"),
        F.col("bin").alias("f1"), F.lit(None).cast("int").alias("f2")),
    "calib": lambda s: llm.score_calibration_q(s, SF).select(
        F.lit("calib").alias("op"), F.col("source").alias("k1"),
        F.col("bin").cast("string").alias("k2"), F.lit("quality").alias("k3"),
        F.col("n_docs").alias("n1"), F.lit(None).cast("bigint").alias("n2"),
        F.col("bin").alias("f1"), F.lit(None).cast("int").alias("f2")),
    "leak": lambda s: llm.split_leakage_q(s, SF).select(
        F.lit("leak").alias("op"), F.col("split_a").alias("k1"),
        F.col("split_b").alias("k2"), F.lit("ngram_jaccard").alias("k3"),
        F.col("n_pairs").alias("n1"), F.lit(None).cast("bigint").alias("n2"),
        F.col("is_leak").alias("f1"), F.lit(None).cast("int").alias("f2")),
    "overlap": lambda s: llm.audience_overlap_q(s, SF).select(
        F.lit("overlap").alias("op"), F.col("group_a").alias("k1"),
        F.col("group_b").alias("k2"), F.lit("user_id").alias("k3"),
        F.col("n_a").alias("n1"), F.col("n_b").alias("n2"),
        F.col("n_overlap").cast("int").alias("f1"), F.lit(None).cast("int").alias("f2")),
}

ORACLE_LEGS = {
    "validate": f"SELECT 'validate' AS op, rule AS k1, kind AS k2, \"column\" AS k3, n_rows AS n1, n_violations AS n2, CAST(passed AS INT) AS f1, CAST(NULL AS INT) AS f2 FROM ({llm._VALIDATE_ORACLE})",
    "privacy": f"SELECT 'privacy', CAST(c_nationkey AS VARCHAR), c_mktsegment, 'c_acctbal', class_size, n_sensitive, risky, diverse FROM ({llm._PRIVACY_ORACLE})",
    "hist": f"SELECT 'hist', key, CAST(bin AS VARCHAR), 'value', bin_n, CAST(NULL AS BIGINT), bin, CAST(NULL AS INT) FROM ({llm._HISTOGRAM_ORACLE})",
    "calib": f"SELECT 'calib', source, CAST(bin AS VARCHAR), 'quality', n_docs, CAST(NULL AS BIGINT), bin, CAST(NULL AS INT) FROM ({llm._CALIBRATION_ORACLE})",
    "leak": f"SELECT 'leak', split_a, split_b, 'ngram_jaccard', n_pairs, CAST(NULL AS BIGINT), is_leak, CAST(NULL AS INT) FROM ({llm._leakage_audit_oracle()})",
    "overlap": f"SELECT 'overlap', group_a, group_b, 'user_id', n_a, n_b, CAST(n_overlap AS INT), CAST(NULL AS INT) FROM ({llm._AUDIENCE_OVERLAP_ORACLE})",
}

VARIANTS = {
    "keep6": ["validate", "privacy", "hist", "calib", "leak", "overlap"],
    "no-leak (5)": ["validate", "privacy", "hist", "calib", "overlap"],
    "no-leak-overlap (4)": ["validate", "privacy", "hist", "calib"],
    "no-leak-overlap-calib (3)": ["validate", "privacy", "hist"],
}


def main():
    os.system("uptime")
    spark = get_spark("vc-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    # warmup both engines
    LEGS["validate"](spark).write.format("noop").mode("overwrite").save()
    con.execute(ORACLE_LEGS["validate"]).fetchall()

    print("\n== per-leg standalone ==")
    for leg in LEGS:
        ss = best_of(lambda: LEGS[leg](spark).write.format("noop").mode("overwrite").save())
        ds = best_of(lambda: con.execute(ORACLE_LEGS[leg]).fetchall())
        print(f"{leg:10s} spark {ss:6.3f}  duckdb {ds:6.3f}  ratio {ss/max(ds,1e-9):6.1f}")

    print("\n== carrier variants ==")
    for name, legs in VARIANTS.items():
        def build():
            df = LEGS[legs[0]](spark)
            for l in legs[1:]:
                df = df.unionByName(LEGS[l](spark))
            df.write.format("noop").mode("overwrite").save()
        sql = " UNION ALL ".join(ORACLE_LEGS[l] for l in legs)
        ss = best_of(build)
        ds = best_of(lambda: con.execute(sql).fetchall())
        print(f"{name:28s} spark {ss:6.3f}  duckdb {ds:6.3f}  ratio {ss/max(ds,1e-9):6.1f}")
    os.system("uptime")


if __name__ == "__main__":
    main()
