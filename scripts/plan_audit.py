"""r13 optimization sweep: per-declared-query physical-plan statistics.

Counts, per bench query: parquet scans (total and per table), Exchange,
BroadcastExchange, Sort, Window, python-eval nodes. High scan multiplicity
on one table flags a re-execution storm (the dedup_triangles lesson).

Usage: python scripts/plan_audit.py [query ...]   (default: all BENCH_QUERIES)
Writes tmp/plan_audit.tsv.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audience_finder_pro_spark.caching import free_checkpoint
from audience_finder_pro_spark.queries import QUERIES
from audience_finder_pro_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import BENCH_QUERIES

    names = sys.argv[1:] or [n for n in BENCH_QUERIES if n in QUERIES]
    spark = get_spark("afp-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    rows = []
    for name in names:
        fn = QUERIES[name]
        fn = getattr(fn, "__wrapped__", fn)
        try:
            df = fn(spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:
            print(f"{name}\tERROR\t{str(ex).splitlines()[0][:80]}")
            continue
        tables = re.findall(r"InMemoryFileIndex \[file:[^\]]*/(\w+)\.parquet", txt)
        per_table = {}
        for t in tables:
            per_table[t] = per_table.get(t, 0) + 1
        ops = re.findall(r"\(\d+\) (\S+)", txt)
        n = lambda op: sum(1 for o in ops if o == op)
        rows.append(
            (
                name,
                len(tables),
                n("Exchange"),
                n("BroadcastExchange"),
                n("Sort"),
                n("Window"),
                n("BatchEvalPython") + n("ArrowEvalPython") + n("MapInPandas")
                + n("FlatMapGroupsInPandas"),
                len(ops),
                ",".join(f"{t}:{c}" for t, c in sorted(per_table.items(), key=lambda kv: -kv[1])),
            )
        )
        free_checkpoint(df)
        print("\t".join(str(x) for x in rows[-1]))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tmp", "plan_audit.tsv")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        fh.write("query\tscans\texchange\tbcast\tsort\twindow\tpyeval\tops\tper_table\n")
        for r in rows:
            fh.write("\t".join(str(x) for x in r) + "\n")
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
