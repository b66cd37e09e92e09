"""Declared query registry — the driver/judge contract surface.

Every implemented operator from SURVEY.md §2 appears here as a named
query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) a DuckDB oracle SQL string producing identical rows,
column names, and values. ``__spark_entry__.py`` re-exports these.

Canonicalization contract (FIXTURES.md §3): every float rounded to 4 dp,
timestamps serialized as strings, arrays sorted before joining, and
column names aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from audience_finder_pro_spark.queries import golden, llm, relational, streaming

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

for mod in (relational, llm, golden, streaming):
    QUERIES.update(mod.QUERIES)
    ORACLES.update({k: v for k, v in mod.ORACLES.items() if v is not None})

__all__ = ["QUERIES", "ORACLES", "QueryFn"]
