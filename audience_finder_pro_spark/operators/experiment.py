"""A/B experiment lift readout (E65) — deterministic, oracle-checkable.

The product-analytics read every audience platform ships: split traffic
deterministically (E4's salted-hash assignment — no seed files, no
coordination), compare a metric between variants, and report lift with
a significance score. The reference has no experimentation surface at
all; this is the engine-native form of the question its interest-score
dashboard (app.py:222-258) would eventually need ("did the new ranking
raise engagement?").

Float discipline (the E41/E63/E64 rule): the per-variant sufficient
statistics (n, Σx, Σx²) are EXACT decimal sums — associative,
order-independent, SQL-replayable — and every derived number (mean,
variance, lift, Welch z) is ONE double expression over those exact
sums, so the same inputs read the same lift on any partitioning and in
any engine. The z-score uses the Welch unpooled form
(mean_t − mean_c) / sqrt(var_t/n_t + var_c/n_c) with sample variances;
callers map z to a p-value at their own threshold table (erf is
deliberately not computed here — engines' erf impls differ in the last
ulp, z is the deterministic part).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def experiment_stats(
    df: DataFrame,
    key_cols: list[str],
    variant_col: str,
    metric_col: str,
    decimal_type: str = "decimal(18,4)",
) -> DataFrame:
    """Per-(keys, variant) exact sufficient statistics: (keys...,
    variant, n, sum_x, sum_x2). Mergeable by exact addition (the E41
    monoid contract) — a standing experiment absorbs each day's
    exposures without rescanning history. NULL metrics are dropped."""
    x = F.col(metric_col).cast(decimal_type)
    return (
        df.filter(F.col(metric_col).isNotNull())
        .groupBy(*key_cols, F.col(variant_col).alias("variant"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sum_x"),
            F.sum(x * x).alias("sum_x2"),
        )
    )


def merge_experiment_stats(states: list[DataFrame]) -> DataFrame:
    """Merge ``experiment_stats`` frames: component-wise exact addition."""
    if not states:
        raise ValueError("merge_experiment_stats needs at least one state frame")
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    key_cols = [c for c in merged.columns if c not in ("n", "sum_x", "sum_x2")]
    return merged.groupBy(*key_cols).agg(
        F.sum("n").alias("n"),
        F.sum("sum_x").alias("sum_x"),
        F.sum("sum_x2").alias("sum_x2"),
    )


def ab_lift(
    stats: DataFrame,
    control: str,
    treatment: str,
) -> DataFrame:
    """Lift readout off a (possibly merged) ``experiment_stats`` frame:
    one row per key group — (keys..., n_control, n_treatment,
    mean_control, mean_treatment, lift_pct, z).

    mean = Σx/n; sample variance = (Σx² − (Σx)²/n)/(n−1) (NULL when
    n < 2); lift_pct = 100·(mean_t − mean_c)/mean_c (NULL when the
    control mean is 0); z = Welch. All one double expression over the
    exact sums, rounded to 4dp. Key groups missing either variant are
    dropped (an experiment read needs both arms)."""
    key_cols = [c for c in stats.columns if c not in ("variant", "n", "sum_x", "sum_x2")]

    def side(tag: str, name: str):
        return (
            stats.filter(F.col("variant") == tag)
            .select(
                *key_cols,
                F.col("n").alias(f"n_{name}"),
                F.col("sum_x").cast("double").alias(f"_sx_{name}"),
                F.col("sum_x2").cast("double").alias(f"_sx2_{name}"),
            )
        )

    j = side(control, "control").join(side(treatment, "treatment"), key_cols)

    def mean(name):
        return F.col(f"_sx_{name}") / F.col(f"n_{name}")

    def var(name):
        n = F.col(f"n_{name}").cast("double")
        return F.when(
            n >= 2,
            (F.col(f"_sx2_{name}") - F.col(f"_sx_{name}") * F.col(f"_sx_{name}") / n)
            / (n - 1),
        )

    mc, mt = mean("control"), mean("treatment")
    se = F.sqrt(
        var("treatment") / F.col("n_treatment") + var("control") / F.col("n_control")
    )
    return j.select(
        *key_cols,
        "n_control",
        "n_treatment",
        F.round(mc, 4).alias("mean_control"),
        F.round(mt, 4).alias("mean_treatment"),
        F.round(F.when(mc != 0, 100.0 * (mt - mc) / mc), 4).alias("lift_pct"),
        F.round(F.when(se > 0, (mt - mc) / se), 4).alias("z"),
    )
