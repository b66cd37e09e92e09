#!/usr/bin/env python
"""Fresh-session A/B timer: python scripts/ab_time.py <query> [n]

One spark session, n noop-sink runs of ONE declared query (stateful plans
rebuilt per run, their checkpoint blocks freed between runs — bench.py
semantics), prints every run plus best/median. Use one process per variant
so JVM/GC state never leaks across arms of an A/B.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audience_finder_pro_spark.caching import free_checkpoint
from audience_finder_pro_spark.queries import _STATEFUL_PLANS, QUERIES
from audience_finder_pro_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    name = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("afp-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    fn = QUERIES[name]
    spark.sparkContext.setJobDescription(f"ab:{name}")
    times = []
    for i in range(n):
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
        if name in _STATEFUL_PLANS:
            for c in getattr(df, "_owned_caches", []):
                c.unpersist()
            free_checkpoint(df)
    timed = times[1:] if n > 1 else times
    print(
        f"{name}: best={min(timed):.3f}s median={statistics.median(timed):.3f}s "
        f"runs={[round(x, 3) for x in times]} load={os.getloadavg()[0]:.2f}"
    )


if __name__ == "__main__":
    main()
