"""Interactive optimization harness (r13) — import from a REPL.

Usage:
    from scripts.opt_harness import *
    t("heavy_hitters")            # best-of-N noop timing at sf0.1
    ex("heavy_hitters")           # explain("formatted") -> plans/r13/<name>.txt
    ex("heavy_hitters", "before") # -> plans/r13/heavy_hitters_before.txt

Timing mirrors bench.py: noop sink, stateful plans rebuilt per run with
their checkpoint blocks freed between runs, shuffle.partitions=8 at toy SF.
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from audience_finder_pro_spark.caching import free_checkpoint
from audience_finder_pro_spark.queries import _STATEFUL_PLANS, QUERIES
from audience_finder_pro_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_TAG = os.environ.get("SPARK_GRAFT_PLANS_TAG", "r14")

spark = get_spark("afp-opt")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.shuffle.partitions", "8")


def _run_once(name: str) -> float:
    fn = QUERIES[name]
    t0 = time.perf_counter()
    df = fn(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    if name in _STATEFUL_PLANS:
        for c in getattr(df, "_owned_caches", []):
            c.unpersist()
        free_checkpoint(df)
    return elapsed


def t(name: str, n: int = 5) -> float:
    """Best-of-n noop timing (first run reported separately as warmup)."""
    spark.sparkContext.setJobDescription(f"opt:{name}")
    times = [_run_once(name) for _ in range(n)]
    spark.sparkContext.setJobDescription(None)
    best = min(times[1:]) if n > 1 else times[0]
    print(f"{name}: best={best:.3f}s  runs={[round(x, 3) for x in times]}")
    return best


def ex(name: str, tag: str | None = None) -> str:
    """Dump explain('formatted') to plans/r13/<name>[_tag].txt (AQE left on;
    use exq for the adaptive-off codegen view)."""
    fn = QUERIES[name]
    fn = getattr(fn, "__wrapped__", fn)
    df = fn(spark, SF_DIR)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    out = os.path.join(_ROOT, "plans", PLANS_TAG,
                       f"{name}{'_' + tag if tag else ''}.txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        fh.write(txt)
    if name in _STATEFUL_PLANS:
        free_checkpoint(df)
    print(f"wrote {out} ({txt.count('Exchange')} Exchange, "
          f"{txt.count('BatchEvalPython') + txt.count('ArrowEvalPython')} pyeval)")
