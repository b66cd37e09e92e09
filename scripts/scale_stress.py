#!/usr/bin/env python
"""Scale-stress: run the dedup tier on an N-times-replicated corpus.

Each replica perturbs the text tail, planting ~doc_count * N*(N-1)/2 true
near-dup pairs — candidate volume equals the answer size, so throughput
here measures the pipeline, not wasted comparisons.

Usage: python scripts/scale_stress.py [factor] [sf_dir]
"""
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F

from audience_finder_pro_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from audience_finder_pro_spark.session import get_spark, load_table


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    big = (
        docs.select(
            F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep"), "doc_id", "text"
        )
        .select(
            (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
            F.concat("text", F.lit(" tail"), F.col("rep").cast("string")).alias("text"),
        )
        .repartition(spark.sparkContext.defaultParallelism * 2)
    )
    n = big.count()
    t0 = time.time()
    pairs = minhash_lsh_pairs(big, threshold=0.9).count()
    t_mh = time.time() - t0
    t0 = time.time()
    kept = exact_dedup(big).count()
    t_ex = time.time() - t0
    print(
        f"docs={n} | minhash(th=0.9): {pairs} verified pairs in {t_mh:.1f}s "
        f"({pairs / max(t_mh, 1e-9):,.0f} pairs/s) | exact_dedup: {kept} reps in {t_ex:.1f}s"
    )


if __name__ == "__main__":
    main()
