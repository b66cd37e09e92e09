"""Declarative data-validation suite — the Deequ/dbt-test family.

A 100 TB ingest without constraint checks ships silent corruption into
training data; the standard fix (Amazon Deequ, dbt tests,
Great Expectations) is a RULE LIST evaluated as aggregates so validation
costs one scan, not one job per rule. This module is that pattern as
pure DataFrame code:

- every scalar rule (not_null / in_range / accepted_values /
  matches_regex / unique) folds into ONE map-side-combined aggregate
  over the table — violation counts are conditional sums, uniqueness is
  an exact distinct count — and the single result row is unpivoted into
  one report row per rule with ``stack`` (no second scan);
- referential-integrity rules each cost one left-anti join against the
  referenced key set (the join build side is the distinct FK domain —
  dimension-sized in every sane schema, so AQE broadcasts it), unioned
  into the same report frame.

The report is (rule, kind, column, n_rows, n_violations, passed) —
deterministic, SQL-replayable (the declared query's DuckDB oracle
recomputes every count), and cheap enough to gate every ingest batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_table(
    df: DataFrame,
    rules: list[tuple[str, str, dict]],
) -> DataFrame:
    """Evaluate ``rules`` = [(name, kind, params), ...] over ``df``.

    Kinds and params:

    - ``not_null``        {"col"}
    - ``in_range``        {"col", "lo", "hi"}  (inclusive; NULL counts as
                          a violation — a range check implies presence)
    - ``accepted_values`` {"col", "values"}    (NULL is a violation)
    - ``matches_regex``   {"col", "pattern"}   (NULL is a violation)
    - ``unique``          {"cols"}             (violations = n_rows −
                          distinct count over the key; distinct ignores
                          NULL in both engines, so NULL keys count as
                          violations — a NULL key can't be proven unique)
    - ``ref_integrity``   {"col", "ref": DataFrame, "ref_col"}
                          (violations = rows whose non-NULL key has no
                          match in the referenced key set)

    Returns one row per rule: (rule, kind, column, n_rows, n_violations,
    passed). Scalar rules share one aggregate pass; each FK rule adds
    one anti-join aggregate, all unioned lazily.
    """
    scalar, fks = [], []
    for name, kind, p in rules:
        (fks if kind == "ref_integrity" else scalar).append((name, kind, p))

    def _violation(kind: str, p: dict):
        c = F.col(p["col"]) if "col" in p else None
        if kind == "not_null":
            return c.isNull()
        if kind == "in_range":
            return ~c.between(F.lit(p["lo"]), F.lit(p["hi"])) | c.isNull()
        if kind == "accepted_values":
            return ~c.isin(list(p["values"])) | c.isNull()
        if kind == "matches_regex":
            return ~c.rlike(p["pattern"]) | c.isNull()
        raise ValueError(f"unknown rule kind: {kind}")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, kind, p in scalar:
        if kind == "unique":
            aggs.append(
                (
                    F.count(F.lit(1))
                    - F.count_distinct(*[F.col(c) for c in p["cols"]])
                ).alias(f"_v_{name}")
            )
        else:
            aggs.append(
                F.sum(F.when(_violation(kind, p), 1).otherwise(0)).alias(f"_v_{name}")
            )
    one = df.agg(*aggs)

    # unpivot the single metrics row into one report row per rule
    stack_args = []
    for name, kind, p in scalar:
        col_label = ",".join(p["cols"]) if kind == "unique" else p["col"]
        stack_args.append((name, kind, col_label, f"_v_{name}"))
    if stack_args:
        stack_expr = "stack({n}, {legs}) as (rule, kind, column, n_violations)".format(
            n=len(stack_args),
            legs=", ".join(f"'{n}', '{k}', '{c}', {v}" for n, k, c, v in stack_args),
        )
        report = one.select(F.expr(stack_expr), F.col("_n").alias("n_rows")).select(
            "rule", "kind", "column", "n_rows", F.col("n_violations").cast("long").alias("n_violations")
        )
    else:
        # FK-only rules list: 'stack(0, )' would fail analysis — start the
        # report empty and let the FK legs union in below
        if not fks:
            raise ValueError("validate_table: rules list is empty")
        report = None

    # the FK legs need the table's total row count; when the scalar pass
    # already computed it, reuse that 1-row aggregate instead of planning a
    # second full scan+count of the table (r9 floor reduction — one scan
    # and one aggregate stage less per FK rule set; at 100 TB the count is
    # not worth paying twice)
    if stack_args:
        n_frame = one.select(F.col("_n").alias("n_rows"))
    else:
        n_frame = df.agg(F.count(F.lit(1)).alias("n_rows"))  # 1 row → broadcast NLJ
    for name, kind, p in fks:
        missing = (
            df.select(F.col(p["col"]))
            .filter(F.col(p["col"]).isNotNull())
            .join(
                p["ref"].select(F.col(p["ref_col"]).alias(p["col"])).distinct(),
                p["col"],
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_violations"))
        )
        leg = missing.crossJoin(F.broadcast(n_frame)).select(
            F.lit(name).alias("rule"),
            F.lit("ref_integrity").alias("kind"),
            F.lit(p["col"]).alias("column"),
            "n_rows",
            F.col("n_violations").cast("long").alias("n_violations"),
        )
        report = leg if report is None else report.unionByName(leg)

    return report.withColumn("passed", F.col("n_violations") == 0)
