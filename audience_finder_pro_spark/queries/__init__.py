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

# Registration order matters: the driver verifies queries in declaration
# order and may cap how many it checks. Register every oracle-backed query
# first (so each gets a hard rows+schema+hash CORRECTNESS row) and push the
# approximate/no-oracle queries (checked rows-only) to the very end.
_MODULES = (relational, streaming, golden, llm)

for _mod in _MODULES:
    for _name, _fn in _mod.QUERIES.items():
        if _mod.ORACLES.get(_name) is not None:
            QUERIES[_name] = _fn
            ORACLES[_name] = _mod.ORACLES[_name]

for _mod in _MODULES:
    for _name, _fn in _mod.QUERIES.items():
        if _mod.ORACLES.get(_name) is None:
            QUERIES[_name] = _fn

__all__ = ["QUERIES", "ORACLES", "QueryFn"]
