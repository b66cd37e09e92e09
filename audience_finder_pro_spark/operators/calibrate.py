"""Per-group score calibration: quantile normalization across sources (E43).

The mixture-construction prerequisite the raw quality tier doesn't give
you: quality scores are only comparable WITHIN a source — different
dumps/domains have different length/punctuation baselines, so a global
threshold over raw scores silently over-selects from whichever source
scores systematically high (the per-dump calibration step of modern
web-corpus pipelines, e.g. the FineWeb per-snapshot filtering recipe).
Calibrating to each group's own quantile scale makes "top 20% of every
source" a single comparable predicate. The reference ranks posts by one
global fixed score (app.py:93-149, score column sort); this is the
multi-source generalization its audience mixes would need.

Two forms, both pure DataFrame (zero Python):

- ``calibrate_scores``: per-row calibrated score = percent_rank of the
  raw score within its group — rank-based (ties share a value, so the
  result depends only on the score ordering, never on row order), one
  window over the group key.
- ``calibration_map``: the bounded persisted artifact — per (group,
  quantile-bin) row counts and raw-score ranges, bin assigned by the
  exact integer-rank formula ``floor((rn−1)·n_bins / cnt)`` over the
  total order (score, id). |groups × n_bins| rows: the model a standing
  pipeline stores and joins against tomorrow's delta, same economics as
  `operators/incremental`'s states.

Scale shape: ONE shuffle on the group key each (the window); no joins,
no Python, no driver state. Group-key skew is the usual hazard — a
single giant source serializes its own window partition; shard such a
source upstream (the operator's per-group semantics compose over
shards whose calibration is computed per shard).

Determinism (cross-engine): percent_rank = (rank−1)/(n−1) from integer
ranks — identical IEEE division in both engines; the bin formula is a
floor over an exact small-integer ratio. Both round at ``dp``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def calibrate_scores(
    df: DataFrame,
    group_col: str,
    score_col: str,
    out_col: str = "calibrated",
    dp: int = 4,
) -> DataFrame:
    """Add ``out_col`` = percent_rank of ``score_col`` within
    ``group_col`` (0 for a single-row group, by both engines'
    percent_rank definition). Rank-based: tied raw scores calibrate
    identically regardless of physical row order."""
    w = Window.partitionBy(group_col).orderBy(F.col(score_col).asc())
    return df.withColumn(out_col, F.round(F.percent_rank().over(w), dp))


def calibration_map(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    n_bins: int = 10,
    dp: int = 4,
) -> DataFrame:
    """Per-(group, bin) calibration table: (group, bin, n_docs, lo, hi)
    with ``bin = floor((rn−1)·n_bins / cnt)`` over the total order
    (score ASC, id ASC) — equal-population bins (the last bins absorb
    remainders), exact integer arithmetic, so both engines cut
    identically even with heavy score ties."""
    if n_bins <= 0:
        raise ValueError("calibration_map needs n_bins >= 1")
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    cnt = Window.partitionBy(group_col)
    binned = df.select(
        F.col(group_col),
        F.col(score_col),
        F.floor(
            ((F.row_number().over(w) - 1) * F.lit(n_bins))
            / F.count(F.lit(1)).over(cnt)
        )
        .cast("int")
        .alias("bin"),
    )
    return binned.groupBy(group_col, "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.min(score_col), dp).alias("lo"),
        F.round(F.max(score_col), dp).alias("hi"),
    )
