#!/usr/bin/env python
"""Residual-PQ regime map (r11 follow-on to the ann_scale_stress m=8 leg).

Measured results (this script + the 1M ann_scale_stress leg):

| corpus | cells vs codes | direct | residual |
|---|---|---|---|
| 1M, 64 clusters, noise 0.35 | 64 ≪ 256 | 0.240 | 0.270 |
| 100k, 16 clusters, noise 0.05 | 16 ≪ 256 | 0.440 | 0.425 |
| 200k, 1024 clusters, noise 0.15 | 1024 > 256 | 0.370 | **0.515** |

The boundary: residual codebooks earn their cost when the COARSE-CELL
count approaches/exceeds n_codes — direct codes then burn capacity
re-encoding cell identity (which IVF routing already knows). With few
cells, per-subspace k-means allocates codes within clusters on its own
and residual buys nothing; there the m dial (m=32), not residual
coding, is the recall answer. Documented in ivfpq_topk's docstring.

Usage: python scripts/residual_regime.py [n_vectors] [n_clusters] [noise]
(n_lists = n_clusters, n_probe = 4, m=8, rerank x5)
Results recorded in NOTES.md's ledger.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ann_scale_stress import _make_corpus  # noqa: E402
from audience_finder_pro_spark.operators.pq import ivfpq_topk
from audience_finder_pro_spark.operators.similarity import brute_force_topk
from audience_finder_pro_spark.session import get_spark

DIM = 64


def main() -> None:
    n_vectors = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    noise = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
    spark = get_spark("residual-regime")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = _make_corpus(spark, n_vectors, n_clusters, noise_scale=noise).persist()
    n = corpus.count()
    print(f"# corpus={n} dim={DIM} clusters={n_clusters} noise={noise}")

    queries = corpus.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    t0 = time.perf_counter()
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(corpus, queries, k=10, dim=DIM).collect()
    }
    print(f"ground truth (distributed brute force): {time.perf_counter()-t0:.1f}s")

    for res_mode in (False, True):
        t0 = time.perf_counter()
        approx = {
            (r.query_id, r.vec_id)
            for r in ivfpq_topk(
                corpus, queries, k=10, n_lists=n_clusters, n_probe=4,
                m=8, n_codes=256, refine_factor=5, dim=DIM,
                residual=res_mode,
            ).collect()
        }
        t = time.perf_counter() - t0
        recall = len(exact & approx) / len(exact)
        print(
            f"ivfpq m=8 rerank x5 residual={res_mode}: {t:.1f}s end-to-end, "
            f"recall@10={recall:.3f}"
        )


if __name__ == "__main__":
    main()
