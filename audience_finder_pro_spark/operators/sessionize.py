"""Batch sessionization (SURVEY §2.5 W3): lag-gap algorithm.

session start when gap from previous event > threshold; session id =
running count of starts. Two window passes over one shuffle on the
partition key — the textbook scalable form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Adds ``session_id`` (1-based per user, ordered by ts)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w))
    flagged = df.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0)),
    )
    return flagged.withColumn(
        "session_id",
        F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_new_session")
