"""DuckDB-oracle differential harness (SURVEY §5 item 1 — the judge's metric).

Mirrors the driver's compare: run the Spark query and the oracle SQL on
the same parquet tables, then assert row count, column names, and an
order-insensitive canonical value comparison (columns sorted by name,
rows sorted, floats rounded, everything stringified).
"""

from __future__ import annotations

import math

import duckdb

from audience_finder_pro_spark.session import TABLES

ROUND_DP = 4


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _canon_value(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # Deliberately NOT normalizing -0.0 (r8 lesson, VERDICT r8 task #3):
        # the driver hashes the raw pandas string form, where "-0.0" !=
        # "0.0" — DuckDB's round() preserves IEEE -0.0 on tiny negatives
        # while Spark's HALF_UP F.round returns +0.0, and this gate exists
        # to pre-screen exactly that class (it bit dsir_select at sf0.1
        # while the old normalizing form stayed green). Oracles that round
        # SIGNED quantities must apply the `+ 0.0` normalizer in BOTH
        # engines' SQL instead (NOTES audit rule).
        return f"{round(v, ROUND_DP):.{ROUND_DP}f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonicalize(cols, rows):
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(row[i]) for i in order) for row in rows]
    out.sort()
    return [cols[i] for i in order], out


def compare(spark_df, oracle_sql_text: str, sf_dir: str, name: str = "query"):
    """Raise AssertionError with a focused diff on any mismatch."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql_text, sf_dir)

    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    )
    _, s_canon = canonicalize(s_cols, s_rows)
    _, o_canon = canonicalize(o_cols, o_rows)
    if s_canon != o_canon:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_canon, o_canon)) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch on {sum(a != b for a, b in zip(s_canon, o_canon))} rows; "
            f"first diffs (spark vs oracle): {diffs}"
        )
