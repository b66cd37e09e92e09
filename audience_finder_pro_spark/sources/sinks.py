"""Result sinks (SURVEY §2.1 S5-S7).

The reference exports small result tables as UTF-8 CSV without index
(app.py:240-241, 318-319) and declares Excel intent (openpyxl dep,
req:4). Engine split:

- ``write_csv``: distributed CSV sink for big results (every executor
  writes its partition — the 100 TB path).
- ``to_csv_bytes`` / ``to_excel_bytes``: driver-side convenience for
  *small, final* results only (the reference's download buttons) —
  guarded by a row cap so nobody collects an unbounded frame.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame

DRIVER_COLLECT_CAP = 1_000_000


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed CSV sink — header per part file, UTF-8."""
    df.write.mode(mode).option("header", True).csv(path)


def _small_pandas(df: DataFrame, cap: int | None = None):
    if cap is None:
        cap = DRIVER_COLLECT_CAP
    # limit(cap+1) bounds the collect; the count check keeps the guard exact
    pdf = df.limit(cap + 1).toPandas()
    if len(pdf) > cap:
        raise ValueError(f"result exceeds driver collect cap ({cap}); use write_csv")
    return pdf


def to_csv_bytes(df: DataFrame) -> bytes:
    """UTF-8, no index — byte-compatible with the reference's to_csv call
    (app.py:240-241 ``to_csv(index=False).encode('utf-8')``)."""
    return _small_pandas(df).to_csv(index=False).encode("utf-8")


def to_excel_bytes(df: DataFrame) -> bytes:
    """Excel sink via openpyxl when available (ref declares the dep, req:4)."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:  # pragma: no cover - openpyxl not in container
        raise NotImplementedError("openpyxl not installed in this environment") from e
    buf = io.BytesIO()
    _small_pandas(df).to_excel(buf, index=False, engine="openpyxl")
    return buf.getvalue()


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Hive-layout parquet sink — the 100 TB table format.

    Readers that filter on ``partition_cols`` get partition PRUNING (whole
    directories skipped before any IO; shows as PartitionFilters in the
    scan node). ``max_records_per_file`` bounds file size so a skewed
    partition value still splits into parallel-readable files.
    """
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed managed table — pre-shuffled storage for co-located joins.

    Two tables bucketed on the same keys with the same bucket count join
    WITHOUT a shuffle (no Exchange under the SortMergeJoin): at 100 TB
    the repeated fact⋈fact shuffle is paid once at write time instead of
    per query. Requires saveAsTable (bucket metadata lives in the
    catalog, not in parquet files).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        # external table: data lands at an explicit location instead of the
        # session warehouse (whose default is cwd/spark-warehouse — not
        # necessarily writable in every deployment); bucket metadata still
        # lives in the catalog, so bucket pruning works identically
        w = w.option("path", path)
    w.saveAsTable(table)
