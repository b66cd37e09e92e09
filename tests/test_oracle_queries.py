"""Differential tests: every declared query with an oracle must hash-match
DuckDB at sf0.01 — the same gate the driver runs (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from audience_finder_pro_spark.queries import ORACLES, QUERIES
from tests.oracle import compare

WITH_ORACLE = sorted(ORACLES)
NO_ORACLE = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    compare(df, ORACLES[name], sf_dir, name)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only(spark, sf_dir, name):
    """Non-SQL-expressible ops: plan must execute and yield a stable schema."""
    df = QUERIES[name](spark, sf_dir)
    assert df.columns
    assert df.count() >= 0


def test_all_queries_smoke_tiny_sf(spark, sf_smoke):
    """Every declared query must run at the smallest SF (degenerate/empty
    intermediate edge cases) and return a stable, non-empty schema."""
    from audience_finder_pro_spark.queries import QUERIES

    failures = {}
    for name, fn in sorted(QUERIES.items()):
        try:
            df = fn(spark, sf_smoke)
            assert df.columns, "empty schema"
            df.count()
        except Exception as ex:  # collect all failures, not just the first
            failures[name] = str(ex).splitlines()[0][:120]
    assert not failures, failures


def test_all_queries_empty_fixture(spark, tmp_path):
    """Every declared query must run (and produce a stable schema) against
    ZERO-row tables — the empty-partition / empty-source case a 100 TB
    pipeline hits constantly (a fresh date partition, an all-filtered
    shard). Guards the empty-corpus paths: centroid seeding, CC driver
    gate, window/rollup/streaming-batch aggs over nothing."""
    import os

    from audience_finder_pro_spark.session import TABLES, load_table

    sf_dir = str(tmp_path)
    for t in TABLES:
        load_table(spark, "/root/testdata/sf0.001", t).limit(0).write.mode(
            "overwrite"
        ).parquet(os.path.join(sf_dir, f"{t}.parquet"))

    failures = {}
    for name, fn in sorted(QUERIES.items()):
        try:
            df = fn(spark, sf_dir)
            assert df.columns, "empty schema"
            df.count()
        except Exception as ex:  # collect all failures, not just the first
            failures[name] = str(ex).splitlines()[0][:120]
    assert not failures, failures


def test_signed_zero_verdict_matches_driver(tmp_path):
    """The pytest canonicalizer and the driver's value-hash must return the
    SAME verdict on an IEEE signed-zero divergence (VERDICT r8 task #3).

    r8 found the class live: DuckDB round() keeps -0.0 on a tiny negative
    while Spark F.round returns +0.0; the driver hashes the string form
    ("-0.0" != "0.0") and flagged dsir_select at sf0.1, but the old
    _canon_value normalized -0.0 so pytest could never pre-screen it.
    This pins the two comparators to the same discrimination — both must
    flag -0.0 vs +0.0, and both must pass +0.0 vs +0.0."""
    import importlib.util
    import os

    import pandas as pd

    from tests.oracle import canonicalize

    spec = importlib.util.spec_from_file_location(
        "driver_sim",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "driver_sim.py"),
    )
    driver_sim = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(driver_sim)

    # the exact shape that bit dsir_select: a rounded signed quantity whose
    # tiny-negative inputs survive round() as -0.0 in one engine only
    neg = pd.DataFrame({"doc_id": [1, 2], "delta": [0.25, -0.0]})
    pos = pd.DataFrame({"doc_id": [1, 2], "delta": [0.25, 0.0]})

    driver_flags = driver_sim.value_hash(neg) != driver_sim.value_hash(pos)
    _, canon_neg = canonicalize(list(neg.columns), list(neg.itertuples(index=False, name=None)))
    _, canon_pos = canonicalize(list(pos.columns), list(pos.itertuples(index=False, name=None)))
    pytest_flags = canon_neg != canon_pos
    assert driver_flags and pytest_flags, (driver_flags, pytest_flags)

    # positive control: identical frames agree as identical in both
    assert driver_sim.value_hash(pos) == driver_sim.value_hash(pos.copy())
    _, again = canonicalize(list(pos.columns), list(pos.itertuples(index=False, name=None)))
    assert canon_pos == again
