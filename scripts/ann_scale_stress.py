#!/usr/bin/env python
"""ANN at 1M vectors (VERDICT r9 #5): the scale datapoint for the 100 TB
similarity story. Synthesizes a deterministic clustered corpus of
N (default 1,000,000) dim-64 vectors, then measures:

1. the exact knn_graph path REFUSING the corpus (the row/bytes gate —
   the designed behavior at scale, pointing callers at IVF);
2. exact ground truth for a bounded query set via brute_force_topk
   (distributed scan — queries broadcast, corpus never collected);
3. ivf_topk recall@10 + wall time vs that ground truth.

Corpus construction (mapInPandas, per-row deterministic — no RNG state
shared across partitions): vector i = unit-normalized
cluster_center[i % n_clusters] + noise_scale * unit_noise(i), with
centers and noise drawn from per-index-seeded numpy Generators, so any
partitioning yields bit-identical vectors.

Usage: python scripts/ann_scale_stress.py [n_vectors] [n_clusters]
Results recorded in NOTES.md's stress ledger.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from audience_finder_pro_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    knn_graph,
)
from audience_finder_pro_spark.session import get_spark

DIM = 64


def _make_corpus(spark, n_vectors: int, n_clusters: int, noise_scale: float):
    centers = np.random.default_rng(42).normal(size=(n_clusters, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast(centers)

    def gen(batches):
        import pandas as pd

        C = bc.value
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            # per-row seeds -> partitioning-independent determinism
            noise = np.stack(
                [np.random.default_rng(int(i) + 7).normal(size=DIM) for i in ids]
            )
            noise /= np.linalg.norm(noise, axis=1, keepdims=True)
            vecs = C[ids % len(C)] + noise_scale * noise
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": [v.astype(np.float32).tolist() for v in vecs],
                }
            )

    return (
        spark.range(n_vectors)
        .repartition(spark.sparkContext.defaultParallelism * 2)
        .mapInPandas(gen, schema="vec_id long, embedding array<float>")
    )


def main() -> None:
    n_vectors = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("ann-scale-stress")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = _make_corpus(spark, n_vectors, n_clusters, noise_scale=0.35)
    corpus = corpus.persist()
    n = corpus.count()
    print(f"# corpus={n} dim={DIM} clusters={n_clusters}")

    # 1. the exact path must REFUSE a corpus this size (gate, not OOM)
    try:
        knn_graph(corpus, k=10, method="exact")
        raise AssertionError("exact path accepted a 1M-row corpus — gate broken")
    except ValueError as e:
        print(f"exact-path gate: correctly refused ({e})")

    queries = corpus.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    t0 = time.perf_counter()
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(corpus, queries, k=10, dim=DIM).collect()
    }
    t_exact = time.perf_counter() - t0
    print(f"brute_force_topk (distributed exact): 20 queries in {t_exact:.1f}s")

    for refine_iters, n_probe in ((1, 4), (0, 4)):
        t0 = time.perf_counter()
        approx = {
            (r.query_id, r.vec_id)
            for r in ivf_topk(
                corpus,
                queries,
                k=10,
                n_lists=n_clusters,
                n_probe=n_probe,
                refine_iters=refine_iters,
                dim=DIM,
            ).collect()
        }
        t_ivf = time.perf_counter() - t0
        recall = len(exact & approx) / len(exact)
        flag = "PASS" if recall >= 0.9 else "MISS"
        print(
            f"ivf_topk n_lists={n_clusters} n_probe={n_probe} "
            f"refine={refine_iters}: recall@10={recall:.3f} in {t_ivf:.1f}s [{flag}]"
        )

    # Index amortization — the reason IVF is the 100 TB path: the build
    # cost (two corpus-wide assignment passes) is per-CORPUS, brute force
    # is per-QUERY × corpus. At a production query batch the crossover is
    # decisive; measure it at 512 queries.
    big_q = corpus.filter(F.col("vec_id") < 512).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    t0 = time.perf_counter()
    exact_big = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(corpus, big_q, k=10, dim=DIM).collect()
    }
    t_bf = time.perf_counter() - t0
    t0 = time.perf_counter()
    approx_big = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(
            corpus, big_q, k=10, n_lists=n_clusters, n_probe=4,
            refine_iters=0, dim=DIM,
        ).collect()
    }
    t_iv = time.perf_counter() - t0
    recall_big = len(exact_big & approx_big) / len(exact_big)
    print(
        f"512-query batch: brute {t_bf:.1f}s vs ivf {t_iv:.1f}s "
        f"(recall@10={recall_big:.3f}) — ivf speedup {t_bf / t_iv:.1f}x"
    )

    # PQ (E49): the compressed-corpus path, at two geometry points. This
    # corpus is PQ's hard regime — every query's true top-10 live among
    # ~15,625 near-identical within-cluster neighbors, so the quantizer
    # must resolve the NOISE, not the cluster structure. Measured sweep
    # (this script, 2026-08): m=8 (32x compression) rf=5 recall 0.24 and
    # rf=50 still under 0.85 — candidate generation only; m=16 rf=50
    # 0.82; m=32 (8x compression) rf=20 recall 1.000. The gated point is
    # m=32; the m=8 line prints as the declared compression-heavy
    # datapoint (no gate) so the trade stays measured, not guessed.
    from audience_finder_pro_spark.operators.pq import pq_encode, pq_fit, pq_topk

    for m_sub, rf, gated in ((8, 5, False), (32, 20, True)):
        t0 = time.perf_counter()
        books = pq_fit(corpus, dim=DIM, m=m_sub, n_codes=256, sample_n=10_000, iters=8)
        t_fit = time.perf_counter() - t0
        t0 = time.perf_counter()
        codes = pq_encode(corpus, books).persist()
        n_codes_rows = codes.count()
        t_enc = time.perf_counter() - t0
        t0 = time.perf_counter()
        approx_pq = {
            (r.query_id, r.vec_id)
            for r in pq_topk(
                codes, queries, books, k=10, refine_with=corpus,
                refine_factor=rf, dim=DIM,
            ).collect()
        }
        t_pq = time.perf_counter() - t0
        recall_pq = len(exact & approx_pq) / len(exact)
        flag = (
            ("PASS" if recall_pq >= 0.9 else "MISS")
            if gated
            else "info: candidate-generation point, ungated"
        )
        print(
            f"pq m={m_sub} codes=256 (+rerank x{rf}): fit {t_fit:.1f}s, "
            f"encode {n_codes_rows} rows {t_enc:.1f}s, 20-query scan {t_pq:.1f}s, "
            f"recall@10={recall_pq:.3f} [{flag}] — codes are {DIM * 4 // m_sub}x "
            f"smaller than the float32 column"
        )
        if gated:
            assert recall_pq >= 0.9, f"gated PQ point under recall bar: {recall_pq}"
        codes.unpersist()

    # IVF-PQ (E57): the full composition — centroid routing x compressed
    # scan x exact rerank. Each query's ADC pass touches ~n_probe/n_lists
    # of the code table; recall vs the same ground truth.
    from audience_finder_pro_spark.operators.pq import ivfpq_topk

    t0 = time.perf_counter()
    approx_ivfpq = {
        (r.query_id, r.vec_id)
        for r in ivfpq_topk(
            corpus, queries, k=10, n_lists=n_clusters, n_probe=4,
            m=32, n_codes=256, refine_factor=20, dim=DIM,
        ).collect()
    }
    t_ivfpq = time.perf_counter() - t0
    recall_ivfpq = len(exact & approx_ivfpq) / len(exact)
    flag = "PASS" if recall_ivfpq >= 0.9 else "MISS"
    print(
        f"ivfpq n_lists={n_clusters} n_probe=4 m=32 (+rerank x20): build+scan "
        f"{t_ivfpq:.1f}s end-to-end, recall@10={recall_ivfpq:.3f} [{flag}] — "
        f"each query ADC-scans ~{4 / n_clusters:.1%} of an 8x-compressed corpus"
    )
    assert recall_ivfpq >= 0.9, f"ivfpq under recall bar: {recall_ivfpq}"

    # Residual codebooks (VERDICT r10 #6): quantize (v̂ − ĉ_list) instead
    # of v̂ at the compression-heavy m=8 point — the question is whether
    # residual resolution recovers the recall direct m=8 loses (0.24 at
    # rerank ×5 on this corpus), i.e. whether the refinement is worth
    # deploying when rerank bandwidth binds. Same rerank budget both ways.
    for res_mode in (False, True):
        t0 = time.perf_counter()
        approx_r = {
            (r.query_id, r.vec_id)
            for r in ivfpq_topk(
                corpus, queries, k=10, n_lists=n_clusters, n_probe=4,
                m=8, n_codes=256, refine_factor=5, dim=DIM,
                residual=res_mode,
            ).collect()
        }
        t_r = time.perf_counter() - t0
        recall_r = len(exact & approx_r) / len(exact)
        print(
            f"ivfpq m=8 (32x compression) rerank x5 "
            f"residual={res_mode}: {t_r:.1f}s end-to-end, "
            f"recall@10={recall_r:.3f} [info: m=8 trade datapoint, ungated]"
        )


if __name__ == "__main__":
    main()
