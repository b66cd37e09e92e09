#!/usr/bin/env python
"""Core-scaling probe for the jaccard/LSH dedup family (VERDICT r13 #7).

Replicates the sf0.1 corpus N x with perturbed tails (the scale_stress
fixture: true near-dup volume grows with N, so throughput measures the
pipeline) and times the dedup-tier heavies through the noop sink. Run it
twice — SPARK_GRAFT_CPUS=8 and =32 — and compare: at a factor where the
work saturates the small core count, the 32-core run should approach the
core ratio; at toy factors the per-action floor dominates and 8 cores win
(the r13 scaling-block finding this probe exists to falsify).

Usage: SPARK_GRAFT_CPUS=32 python scripts/scale_probe.py [factor] [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from audience_finder_pro_spark.caching import free_checkpoint
from audience_finder_pro_spark.operators.dedup import (
    corpus_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from audience_finder_pro_spark.session import get_spark, load_table


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    big = (
        docs.select(
            F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep"),
            "doc_id",
            "text",
        )
        .select(
            (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
            F.concat(
                "text", F.lit(" tail"), F.col("rep").cast("string")
            ).alias("text"),
        )
        .repartition(spark.sparkContext.defaultParallelism * 2)
        .localCheckpoint(eager=True)  # fixture build excluded from timings
    )
    n = big.count()
    print(f"cpus={cpus} factor={factor} docs={n}")
    for name, fn in [
        ("minhash_lsh_pairs", lambda: minhash_lsh_pairs(big, threshold=0.9)),
        (
            "ngram_jaccard_pairs",
            lambda: ngram_jaccard_pairs(big, threshold=0.9, df_cap_frac=0.001),
        ),
        ("corpus_dedup", lambda: corpus_dedup(big, threshold=0.9)),
    ]:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        out = fn()
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{name}: {dt:.1f}s  (cpus={cpus})", flush=True)
        free_checkpoint(out)


if __name__ == "__main__":
    main()
