"""Privacy risk auditing: k-anonymity / l-diversity over quasi-identifiers (E39).

The corpus-governance companion to the PII scan (functions/quality.py
detects identifiers IN text; this audits identifiers AS columns): before
a dataset with demographic-ish attributes ships into a training mix, the
classic Sweeney k-anonymity question is "how many records sit in an
equivalence class smaller than k over the quasi-identifier columns?" —
those records are re-identifiable by linking the quasi columns to an
outside registry (exactly the join `operators/linkage.py` automates,
which is why the two belong to the same tier). l-diversity asks the
follow-up: even in large classes, does the SENSITIVE column actually
vary, or does class membership alone reveal it?

The reference has no privacy surface at all (its PRAW payloads carry
usernames verbatim, app.py:115-118 just forwards them); this is the
operator a 100 TB pipeline needs before any release gate.

Scale shape (one aggregate, pure DataFrame):
- ONE groupBy over the quasi columns with map-side combine; per-class
  size is `count(*)` and l-diversity is `count_distinct(sensitive)`
  inside the SAME aggregate (no second pass, no join). The class count
  is bounded by the quasi-value cross product — orders of magnitude
  below the row count — so the shuffle moves combined partials only.
- No window, no sort (callers order the tiny per-class result if they
  want a report); flagging is a projection.

Determinism: sizes and distinct counts are integers; `risky` is an
integer comparison — no float classes anywhere, so the DuckDB oracle
hash-matches exactly. NULL quasi values form their own equivalence
class (both engines group NULLs together); `count_distinct` ignores
NULL sensitive values in both engines (the documented semantic from
operators/validate.py's uniqueness rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
    l: int = 2,
) -> DataFrame:
    """Per-equivalence-class privacy audit over ``quasi_cols``.

    Returns one row per equivalence class: the quasi columns,
    ``class_size``, ``risky`` (1 if class_size < k), and — when
    ``sensitive_col`` is given — ``n_sensitive`` (distinct sensitive
    values) and ``diverse`` (1 if n_sensitive >= l). The dataset is
    k-anonymous iff ``sum(risky) == 0``.
    """
    if not quasi_cols:
        raise ValueError("k_anonymity_audit needs at least one quasi-identifier")
    aggs = [F.count("*").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"))
    out = df.groupBy(*quasi_cols).agg(*aggs)
    out = out.withColumn(
        "risky", F.when(F.col("class_size") < k, 1).otherwise(0)
    )
    if sensitive_col is not None:
        out = out.withColumn(
            "diverse", F.when(F.col("n_sensitive") >= l, 1).otherwise(0)
        )
    return out
