#!/usr/bin/env python
"""ANN recall-vs-cost measurement (VERDICT r1 lead: pick defaults from data;
VERDICT r2 item 7: one script covering BOTH approximate operators).

Measures top-10 recall against brute_force_topk on the real embeddings
fixture at a chosen SF, sweeping:
- IVF: n_lists × refine_iters × n_probe
- sign-LSH: n_bits × n_tables

Prints one line per configuration plus wall time; results recorded in
NOTES.md and used to set the declared queries' defaults.

Usage: python scripts/ivf_recall.py [sf_dir] (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from audience_finder_pro_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_topk,
)
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
                    f"ivf n_lists={n_lists:3d} refine={refine_iters} n_probe={n_probe} "
                    f"corpus_frac={frac:.2f} recall={recall:.3f} time={dt:.1f}s"
                )

    # sign-LSH sweep: recall ≈ 1-(1-p^bits)^tables — more bits = smaller
    # buckets (cheaper, lower recall), more tables = recall back at
    # storage/compute cost. The declared ann_lsh_topk uses n_bits=4 with
    # the default table count; this pins where that sits on the curve.
    for n_bits in (4, 6, 8):
        for n_tables in (4, 8, 16):
            t0 = time.perf_counter()
            approx = {
                (r.query_id, r.vec_id)
                for r in lsh_bucketed_topk(
                    emb, queries, k=10, n_bits=n_bits, n_tables=n_tables
                ).collect()
            }
            dt = time.perf_counter() - t0
            recall = len(exact & approx) / len(exact)
            print(
                f"lsh n_bits={n_bits} n_tables={n_tables:3d} "
                f"recall={recall:.3f} time={dt:.1f}s"
            )


if __name__ == "__main__":
    main()
