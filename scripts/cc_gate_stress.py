#!/usr/bin/env python
"""Measure the DRIVER_CC_MAX_EDGES gate: driver union-find vs distributed
pointer jumping at edge counts around the 2M ceiling (operators/graph.py).

The ceiling was originally a back-of-envelope estimate (~32 MB of Arrow
buffers). This script turns it into a measured crossover: for each edge
count it runs BOTH paths on the same graph and records wall time and the
driver's peak RSS delta, so the constant is justified by numbers (table
kept in NOTES.md).

Graph shape: a forest of 1000-node paths — adversarial for label
propagation (large diameter) and representative of near-dup chains,
while keeping the union-find's parent dict fully populated (every
non-root node unions), i.e. worst-case driver heap per edge.

Usage: python scripts/cc_gate_stress.py [edge_counts_csv]
       (default "500000,1000000,2000000,4000000")
"""
import resource
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F

from audience_finder_pro_spark.operators.graph import connected_components
from audience_finder_pro_spark.session import get_spark


def peak_rss_mb() -> float:
    # ru_maxrss is KB on Linux; high-water mark, so deltas understate any
    # second measurement — report it alongside, not as ground truth
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> None:
    counts = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else
                               "500000,1000000,2000000,4000000").split(",")]
    spark = get_spark("cc-gate-stress")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'edges':>9} | {'driver(s)':>9} {'rss_after(MB)':>13} | "
          f"{'distributed(s)':>14} | components")
    for n_edges in counts:
        path_len = 1000
        # forest of path graphs: edge i connects node i -> i+1 except at
        # path boundaries (those rows become self-loops, harmless)
        edges = (
            spark.range(n_edges)
            .select(
                F.col("id").alias("id_a"),
                F.when((F.col("id") + 1) % path_len == 0, F.col("id"))
                .otherwise(F.col("id") + 1)
                .alias("id_b"),
            )
            .repartition(spark.sparkContext.defaultParallelism)
        )

        t0 = time.time()
        n_comp_d = (
            connected_components(edges, driver_max_edges=2 * n_edges + 1)
            .select("comp").distinct().count()
        )
        t_driver = time.time() - t0
        rss = peak_rss_mb()

        t0 = time.time()
        n_comp_i = (
            connected_components(edges, max_iter=40, driver_max_edges=0)
            .select("comp").distinct().count()
        )
        t_dist = time.time() - t0
        assert n_comp_d == n_comp_i, (n_comp_d, n_comp_i)
        print(f"{n_edges:>9} | {t_driver:>9.1f} {rss:>13.0f} | "
              f"{t_dist:>14.1f} | {n_comp_d}")


if __name__ == "__main__":
    main()
