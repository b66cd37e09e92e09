#!/usr/bin/env python
"""Per-query Spark-vs-DuckDB wall-time table over the FULL oracle set
(VERDICT r1 lead 5: manufacture the honest 2×-gate comparator).

Runs every oracle-backed declared query in both engines at the given SF
(best-of-N in each engine, N=8 by default — r13 protocol, VERDICT r12
ask #1: more runs tighten both engines' minima against scheduling
weather; override with RATIO_RUNS) and prints a markdown table sorted
by ratio plus a summary block: total, median, 10%-trimmed, and the
driver-50 ex-outlier reading in BOTH forms — RAW, and the
floor-corrected COMPANION that subtracts this session's measured
per-action scheduling floor (a 1-row noop write timed best-of-N at
launch; local-mode Spark pays 0.088-0.168s of pure stage orchestration
per action that a single-process engine does not, and that amortizes
to noise at any real SF). The companion is reported ALONGSIDE the raw
number, never instead of it. Paste into BASELINE.md; rerun per round
so per-query regressions are visible, not just the bench total.

Usage: python scripts/duckdb_ratio.py [sf_dir] (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from audience_finder_pro_spark.queries import ORACLES, QUERIES
from audience_finder_pro_spark.session import TABLES, get_spark

RUNS = int(os.environ.get("RATIO_RUNS", "8"))

# stage-floor legs measured incomparably by design (BASELINE.md r10):
# similarity_pagerank / knn_graph pit checkpointed Pregel sweeps and a
# BLAS path against unrolled-CTE / per-element-fold oracles
_OUTLIERS = ("similarity_pagerank", "knn_graph")


def best_of(fn, runs: int = RUNS) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def measure_action_floor(spark) -> float:
    """This session's per-action scheduling floor: a 1-row noop write —
    no data work, pure driver/scheduler round trip. The conservative
    (smallest) correction unit: most queries' actions also pay shuffle
    stage launches on top of this."""
    one = spark.range(1)
    one.write.format("noop").mode("overwrite").save()  # warm the path
    return best_of(
        lambda: one.write.format("noop").mode("overwrite").save()
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("duckdb-ratio")
    spark.sparkContext.setLogLevel("ERROR")
    # same toy-SF shuffle profile as bench.py (A/B r6: 8 beats 32 on every
    # tier at sf<=0.1 — task-launch floor dominates tiny shuffles)
    if "SPARK_GRAFT_SHUFFLE_PARTITIONS" not in os.environ and "sf1" not in sf_dir:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    names = [n for n in QUERIES if n in ORACLES]
    rows = []
    from audience_finder_pro_spark.caching import free_checkpoint
    from audience_finder_pro_spark.queries import _STATEFUL_PLANS

    for name in names:
        try:
            # noop sink = full materialization; count() would let Catalyst
            # prune every unreferenced projection column, timing pure-
            # projection queries as bare scans (see bench.py docstring)
            # Storage hygiene (bench.py's rule, r12): localCheckpoint
            # blocks are never GC'd, so without freeing, each of the 4
            # runs of every checkpointing query leaks its blocks for the
            # REST of the table — inflating both that query's later runs
            # and every query after it. _STATEFUL_PLANS rebuild per call
            # and own their checkpoints: free the previous run's handle;
            # memoized queries return the same DataFrame (freed at end).
            handles = []

            def timed_run():
                df = QUERIES[name](spark, sf_dir)
                if handles and handles[-1] is not df and name in _STATEFUL_PLANS:
                    prev = handles.pop()
                    for c in getattr(prev, "_owned_caches", []):
                        c.unpersist()
                    free_checkpoint(prev)
                handles.append(df)
                df.write.format("noop").mode("overwrite").save()

            spark_s = best_of(timed_run)
            seen: set = set()
            for df in handles:
                if id(df) in seen:
                    continue
                seen.add(id(df))
                for c in getattr(df, "_owned_caches", []):
                    c.unpersist()
                free_checkpoint(df)
        except Exception as ex:
            print(f"# spark {name} FAILED {str(ex).splitlines()[0][:120]}", file=sys.stderr)
            continue
        try:
            duck_s = best_of(lambda: con.execute(ORACLES[name]).fetchall())
        except Exception as ex:
            print(f"# duckdb {name} FAILED {str(ex).splitlines()[0][:120]}", file=sys.stderr)
            continue
        rows.append((name, spark_s, duck_s, spark_s / max(duck_s, 1e-9)))

    rows.sort(key=lambda r: -r[3])
    print(f"\n| query | spark s | duckdb s | ratio |")
    print("|---|---|---|---|")
    for name, s, d, r in rows:
        print(f"| {name} | {s:.3f} | {d:.3f} | {r:.1f} |")
    ts = sum(r[1] for r in rows)
    td = sum(r[2] for r in rows)
    print(f"| **total ({len(rows)} queries)** | **{ts:.2f}** | **{td:.2f}** | **{ts / td:.1f}** |")

    # ------- summary block (r13 protocol: the driver-50 bar, both forms)
    from statistics import median

    floor_s = measure_action_floor(spark)
    ex = [r for r in rows if r[0] not in _OUTLIERS]
    exs, exd = sum(r[1] for r in ex), sum(r[2] for r in ex)
    # one timed action per query run; the correction can never push a
    # query below zero
    exs_fc = sum(max(r[1] - floor_s, 0.0) for r in ex)
    ratios = sorted(r[3] for r in rows)
    k = len(ratios) // 10
    trimmed = ratios[k: len(ratios) - k] if len(ratios) > 2 * k else ratios
    print(f"\nruns_per_engine: {RUNS} (best-of)")
    print(f"measured per-action floor (1-row noop, best-of-{RUNS}): {floor_s:.3f}s")
    print(f"total: {ts:.2f} / {td:.2f} = {ts / td:.2f}x over {len(rows)} queries")
    print(
        f"ex-outlier ({', '.join(_OUTLIERS)} excluded) RAW: "
        f"{exs:.2f} / {exd:.2f} = {exs / exd:.2f}x"
    )
    print(
        f"ex-outlier FLOOR-CORRECTED companion (raw minus {floor_s:.3f}s "
        f"x 1 action/query, alongside — never instead of — the raw): "
        f"{exs_fc:.2f} / {exd:.2f} = {exs_fc / exd:.2f}x"
    )
    print(f"median per-query ratio: {median(r[3] for r in rows):.2f}")
    print(f"10%-trimmed mean ratio: {sum(trimmed) / len(trimmed):.2f}")
    # bench.py's exact ratio triple, for continuity with BENCH_DETAIL.json
    from bench import ratio_metrics

    print(
        "bench-rule metrics:",
        ratio_metrics(
            {r[0]: r[1] for r in rows}, {r[0]: r[2] for r in rows}
        ),
    )


if __name__ == "__main__":
    main()
