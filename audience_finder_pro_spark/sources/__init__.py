"""Sources & sinks (SURVEY §2.1)."""

from audience_finder_pro_spark.sources.sinks import write_csv, to_csv_bytes, to_excel_bytes

__all__ = ["write_csv", "to_csv_bytes", "to_excel_bytes"]
