"""Skew-resistant aggregation (SURVEY §4.3 / 100 TB discipline).

A plain ``groupBy(keys)`` hash-partitions rows by key: at 100 TB a hot
key (one returnflag value, one mega-community) lands its entire row
volume on a single reducer. Salting splits each key into ``salt``
synthetic sub-keys, aggregates the sub-groups in parallel, then merges
the (tiny) per-sub-key partials — two shuffles, but the first one is
uniform by construction.

Only algebraic aggregates decompose this way (sum/count/min/max, and
avg as sum÷count); holistic ones (exact median, collect_set of huge
sets) need different machinery. Spark's own AQE skew-join splitting
covers *joins*; this operator covers *aggregation* skew, which AQE does
not rebalance (SPARK-35725 tracks it).

The result is bit-identical to the unsalted groupBy for integer/long
aggregates, and equal up to float-summation reassociation otherwise —
the engine's canonicalization (round 4 dp) absorbs that, so the
operator IS DuckDB-oracle-checkable against the plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (partial agg on salted groups, final merge of partials)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs`` maps output column name → (input column, fn) with fn in
    {sum, count, min, max, avg}; ``'*'`` as input column with fn=count
    counts rows. avg decomposes into sum+count partials.
    """
    plan: dict[str, tuple[str, str]] = {}
    finals: list = []
    for out, (col, fn) in aggs.items():
        if fn == "avg":
            plan[f"__{out}_sum"] = (col, "sum")
            plan[f"__{out}_cnt"] = (col, "count")
            finals.append((F.col(f"__{out}_sum") / F.col(f"__{out}_cnt")).alias(out))
        elif fn in _ALGEBRAIC:
            plan[f"__{out}"] = (col, fn)
            finals.append(F.col(f"__{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")

    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt)))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _ALGEBRAIC[fn][0](F.lit(1) if col == "*" else F.col(col)).alias(name)
            for name, (col, fn) in plan.items()
        ]
    )
    merged = partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](F.col(name)).alias(name)
            for name, (col, fn) in plan.items()
        ]
    )
    return merged.select(*keys, *finals)
