"""Bucketed-warehouse co-location tests (sources/warehouse.py).

The claim under test is physical, not semantic: two tables bucketed the
same way on the join key must join with ZERO shuffle Exchange, and the
result must still equal the plain (shuffled) join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from audience_finder_pro_spark.session import load_table
from audience_finder_pro_spark.sources.warehouse import (
    bucketed_table,
    is_exchange_free_join,
    write_bucketed,
)

from tests.conftest import SF_SMOKE


@pytest.fixture()
def bucketed_pair(spark):
    """orders + customer bucketed on custkey; dropped after the test."""
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    write_bucketed(orders, "t_orders_b", "o_custkey", n_buckets=8, sort_cols="o_custkey")
    write_bucketed(customer, "t_customer_b", "c_custkey", n_buckets=8, sort_cols="c_custkey")
    yield "t_orders_b", "t_customer_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_customer_b")


def _smj_join(spark, a, b):
    """Equi-join with broadcast disabled so the planner must pick SMJ —
    the strategy whose exchanges bucketing elides. Returns (joined,
    exchange_free): the plan is inspected INSIDE the conf scope because
    executedPlan() derives lazily from the session conf at access time —
    restore the broadcast threshold first and the join silently replans
    as BroadcastHashJoin, vacuously passing any no-exchange assertion
    (measured; this bit the first version of these tests)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a["o_custkey"] == b["c_custkey"]).select(
            "o_orderkey", "o_custkey", "c_name"
        )
        return joined, is_exchange_free_join(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    t_orders, t_customer = bucketed_pair
    _, free = _smj_join(spark, bucketed_table(spark, t_orders), bucketed_table(spark, t_customer))
    assert free


def test_unbucketed_join_pays_the_exchange(spark):
    """Control: the same join off the raw parquet scans DOES shuffle —
    proving the assertion helper measures the bucketing, not an accident
    of data size."""
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    _, free = _smj_join(spark, orders, customer)
    assert not free


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    t_orders, t_customer = bucketed_pair
    joined, _ = _smj_join(spark, bucketed_table(spark, t_orders), bucketed_table(spark, t_customer))
    b = joined.orderBy("o_orderkey").collect()
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    p = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .select("o_orderkey", "o_custkey", "c_name")
        .orderBy("o_orderkey")
        .collect()
    )
    assert b == p


def test_bucketed_write_one_file_per_bucket(spark, bucketed_pair):
    """The repartition-before-write discipline: each bucket is one file
    (plus Spark's _SUCCESS marker), not tasks x buckets small files."""
    import os

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    files = [
        f
        for f in os.listdir(os.path.join(warehouse, "t_orders_b"))
        if f.endswith(".parquet")
    ]
    assert len(files) == 8, files


def test_bucket_scan_groupby_skips_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also rides the clustering: the
    groupBy plans with no shuffle Exchange."""
    t_orders, _ = bucketed_pair
    agg = (
        bucketed_table(spark, t_orders)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    agg.count()
    assert is_exchange_free_join(agg)


# ---------------------------------------------------- S11 training-shard export
def test_write_training_shards_budget_and_roundtrip(spark, tmp_path):
    """Every shard but the last stays within budget+1-doc overflow, the
    JSONL round-trips losslessly, and shard membership is deterministic
    across partitionings."""
    from pyspark.sql import functions as F

    from audience_finder_pro_spark.sources.sinks import write_training_shards

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
        (F.col("id") % 37 + 5).alias("n_tokens"),
    )
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out, shard_tokens=500, compression=None)
    rows = manifest.collect()
    budgets = {r.shard: r.total_tokens for r in rows}
    # running-sum binning: a shard exceeds the budget by at most one doc
    max_doc = 41
    assert all(t <= 500 + max_doc for t in budgets.values())
    assert sum(r.n_docs for r in rows) == 200
    back = spark.read.json(out)
    assert back.count() == 200
    assert {r.doc_id for r in back.select("doc_id").collect()} == set(range(200))
    # determinism under repartitioning: same shard membership
    m2 = write_training_shards(
        docs.repartition(7), str(tmp_path / "shards2"), shard_tokens=500, compression=None
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, m2.collect()))
    # shard= directories actually materialize the hive layout
    import os

    assert any(d.startswith("shard=") for d in os.listdir(out))


def test_write_training_shards_per_source(spark, tmp_path):
    from pyspark.sql import functions as F

    from audience_finder_pro_spark.sources.sinks import write_training_shards

    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("source"),
        F.lit("x").alias("text"),
        F.lit(100).alias("n_tokens"),
    )
    out = str(tmp_path / "by_src")
    manifest = write_training_shards(
        docs, out, shard_tokens=500, partition_by="source", compression=None
    ).collect()
    # 20 docs x 100 tokens per source → 4 shards of 5 docs each per source
    assert len(manifest) == 12
    assert all(r.n_docs == 5 and r.total_tokens == 500 for r in manifest)
    import os

    assert sorted(d for d in os.listdir(out) if d.startswith("source=")) == [
        "source=0", "source=1", "source=2",
    ]


# ------------------------------------------------- E53 Z-order layout writer
def test_zorder_layout_prunes_boxes_and_preserves_rows(spark, tmp_path):
    """E53's gates (sink taxonomy — pytest-verified like S5/S11/S13):
    (1) the written layout holds exactly the input rows; (2) the Morton
    key is the hand-computed bit interleave on planted values; (3)
    MEASURED pruning: for a square box predicate over a uniform 2-D
    grid, the fraction of files whose per-file (min,max) bounding box
    overlaps the probe is far lower under the Z-curve layout than under
    a single-column sort of the same data into the same file count —
    per-file min/max is exactly the stat parquet scan pruning consumes;
    (4) bounds/geometry validation raises."""
    import pytest
    from pyspark.sql import functions as F

    from audience_finder_pro_spark.sources.warehouse import (
        write_zordered,
        zorder_key,
    )

    # (2) hand-computed interleave: 2 cols, 2 bits, bounds [0,4) -> bin=v
    tiny = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    z = zorder_key(tiny, ["x", "y"], {"x": (0, 4), "y": (0, 4)}, n_bits=2)
    # x=1 -> bits 01, y=2 -> bits 10; interleave LSB-first (x bit b ->
    # position 2b, y bit b -> 2b+1): bit0(x)=1 -> pos0; bit1(y)=1 -> pos3
    assert z.collect()[0]["_zorder"] == 0b1001

    # uniform 64x64 grid, 4096 rows
    grid = spark.range(4096).select(
        (F.col("id") % 64).cast("double").alias("x"),
        (F.col("id") / 64).cast("long").cast("double").alias("y"),
    )
    bounds = {"x": (0.0, 64.0), "y": (0.0, 64.0)}
    zpath, spath = str(tmp_path / "zorder"), str(tmp_path / "sorted")
    write_zordered(grid, zpath, ["x", "y"], bounds, n_files=16, n_bits=6)
    (
        grid.repartitionByRange(16, F.col("x"), F.col("y"))
        .sortWithinPartitions("x", "y")
        .write.mode("overwrite")
        .parquet(spath)
    )

    # (1) row preservation
    zread = spark.read.parquet(zpath)
    assert sorted((r.x, r.y) for r in zread.collect()) == sorted(
        (r.x, r.y) for r in grid.collect()
    )

    def files_overlapping_box(path, x0, x1, y0, y1):
        boxes = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("x").alias("x_min"), F.max("x").alias("x_max"),
                F.min("y").alias("y_min"), F.max("y").alias("y_max"),
            )
        )
        total = boxes.count()
        hit = boxes.filter(
            (F.col("x_max") >= x0) & (F.col("x_min") <= x1)
            & (F.col("y_max") >= y0) & (F.col("y_min") <= y1)
        ).count()
        return hit, total

    # (3) an 8x8 probe box in the interior
    z_hit, z_total = files_overlapping_box(zpath, 24, 31, 24, 31)
    s_hit, s_total = files_overlapping_box(spath, 24, 31, 24, 31)
    assert z_total == 16 and s_total == 16
    # x-major sort: y min/max span the full range in every mid file ->
    # ~every x-overlapping file hits; the curve layout keeps boxes local
    assert z_hit < s_hit, (z_hit, s_hit)
    assert z_hit <= 4, (z_hit, s_hit)  # 8x8 of 64x64 = 1/64 of area

    # (4) validation
    with pytest.raises(ValueError):
        zorder_key(grid, ["x"], bounds)
    with pytest.raises(ValueError):
        zorder_key(grid, ["x", "y"], {"x": (0, 64)})
    with pytest.raises(ValueError):
        zorder_key(grid, ["x", "y"], {"x": (0, 0), "y": (0, 64)})
    with pytest.raises(ValueError):
        zorder_key(grid, ["x", "y"], bounds, n_bits=40)


def test_bucketed_conversions_query_zero_exchange_and_oracle(spark, sf_dir):
    """VERDICT r10 #5: the declared fact×fact query over pre-bucketed
    events must (a) plan with ZERO shuffle Exchange end-to-end — both
    bucketed scans feed the merge-hinted SMJ shuffle-free and the
    per-user aggregate rides the same clustering — and (b) hash-match
    the plain-join oracle off the raw parquet (layout changes plans,
    never answers). Verified at sf0.1 too on landing (NOTES audit
    rule)."""
    from audience_finder_pro_spark.queries import QUERIES
    from audience_finder_pro_spark.queries.relational import _BUCKETED_CONV_ORACLE
    from tests.oracle import compare

    df = QUERIES["bucketed_conversions"](spark, sf_dir)
    assert is_exchange_free_join(df)
    compare(df, _BUCKETED_CONV_ORACLE, sf_dir, name="bucketed_conversions")


def test_zorder_scan_query_matches_oracle_and_prunes(spark, sf_dir):
    """The E53 end-to-end read path: the declared query's answer off the
    Z-ordered rewrite hash-matches the raw-parquet oracle (layout never
    changes answers), and the written layout is genuinely selective for
    the query's own 2-D predicate — the probe's bounding box overlaps
    at most half the files' (value, user_id) min/max boxes."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from audience_finder_pro_spark.queries import QUERIES
    from audience_finder_pro_spark.queries.relational import _ZORDER_SCAN_ORACLE
    from tests.oracle import compare

    df = QUERIES["zorder_scan"](spark, sf_dir)
    compare(df, _ZORDER_SCAN_ORACLE, sf_dir, name="zorder_scan")

    # the path the query wrote — recomputed by the query's own formula
    # (scanning the module dict picked up OTHER tests' empty-fixture
    # layouts, whose files have zero row groups)
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    path = os.path.join(
        tempfile.gettempdir(), f"afp_events_zorder_{tag}_{os.getpid()}"
    )
    assert os.path.exists(path), path
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    touched = 0
    for f in files:
        md = pq.read_metadata(os.path.join(path, f))
        cols = {
            md.row_group(0).column(j).path_in_schema: j
            for j in range(md.row_group(0).num_columns)
        }
        vj, uj = cols["value"], cols["user_id"]
        vlo = min(md.row_group(i).column(vj).statistics.min for i in range(md.num_row_groups))
        vhi = max(md.row_group(i).column(vj).statistics.max for i in range(md.num_row_groups))
        ulo = min(md.row_group(i).column(uj).statistics.min for i in range(md.num_row_groups))
        uhi = max(md.row_group(i).column(uj).statistics.max for i in range(md.num_row_groups))
        if vhi >= 100 and vlo < 150 and uhi >= 40 and ulo <= 90:
            touched += 1
    assert touched <= len(files) // 2, (touched, len(files))
