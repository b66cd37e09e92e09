#!/usr/bin/env python
"""IVF recall-vs-cost measurement (VERDICT r1 lead: pick defaults from data).

Measures top-10 recall of ivf_topk against brute_force_topk on the real
embeddings fixture at a chosen SF, sweeping n_probe and refine_iters.
Prints one line per configuration plus wall time; results recorded in
NOTES.md and used to set the declared query's defaults.

Usage: python scripts/ivf_recall.py [sf_dir] (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from audience_finder_pro_spark.operators.similarity import brute_force_topk, ivf_topk
from audience_finder_pro_spark.session import get_spark, load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ivf-recall")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    exact = {
        (r.query_id, r.vec_id) for r in brute_force_topk(emb, queries, k=10).collect()
    }
    print(f"# corpus={n} queries=20 k=10 exact_pairs={len(exact)}")

    for n_lists in (16, 32):
        for refine_iters in (0, 1):
            for n_probe in (2, 4, 6, 8):
                t0 = time.perf_counter()
                approx = {
                    (r.query_id, r.vec_id)
                    for r in ivf_topk(
                        emb,
                        queries,
                        k=10,
                        n_lists=n_lists,
                        n_probe=n_probe,
                        refine_iters=refine_iters,
                    ).collect()
                }
                dt = time.perf_counter() - t0
                recall = len(exact & approx) / len(exact)
                frac = n_probe / n_lists
                print(
                    f"n_lists={n_lists:3d} refine={refine_iters} n_probe={n_probe} "
                    f"corpus_frac={frac:.2f} recall={recall:.3f} time={dt:.1f}s"
                )


if __name__ == "__main__":
    main()
