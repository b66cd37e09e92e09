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
