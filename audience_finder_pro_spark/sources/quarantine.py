"""Bad-record quarantine (SURVEY §4.1 last row).

The reference wraps every per-row/per-source fetch in try/except —
warn, append nothing, continue (/root/reference/app.py:108-110,
144-147, 301). The engine's distributed equivalent: keep malformed
input instead of crashing, route it to a side output, and never silently
drop. Two layers:

- ``read_jsonl_quarantined``: PERMISSIVE reader + corrupt-record column
  → (good, bad) DataFrame pair. ``bad`` carries the raw line for replay.
- ``try_expr`` family usage: ``try_cast``/``try_divide`` etc. turn
  per-value errors into NULLs that a quarantine filter can route, so one
  poison row can't kill a 100 TB job (ANSI mode is ON in Spark 4 — an
  unguarded cast overflow fails the whole task otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl_quarantined(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """(good, bad): parse JSON-lines with the declared schema; rows that fail
    land in ``bad`` with the raw text preserved, rows that parse land in
    ``good`` without the corrupt column."""
    full_schema = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # Spark disallows queries referencing ONLY the corrupt-record column
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN); materialize the
    # parsed scan once so both splits read from it. localCheckpoint, not
    # cache(): the blocks are released when the caller drops the splits
    # (CacheManager entries would leak without an explicit unpersist call
    # no caller can be trusted to make).
    df = df.localCheckpoint(eager=True)
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).withColumnRenamed(CORRUPT_COL, "raw")
    return good, bad


def quarantine_invalid(
    df: DataFrame, condition, quarantine_cols: list[str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """Split rows by a validity predicate — the engine-wide convention for
    the reference's skip-and-warn guards (tombstones, empty-after-normalize):
    filters express the *valid* set, this helper also materializes the
    complement so dropped rows stay observable."""
    good = df.filter(condition)
    bad = df.filter(~F.coalesce(condition, F.lit(False)))
    if quarantine_cols:
        bad = bad.select(*quarantine_cols)
    return good, bad
