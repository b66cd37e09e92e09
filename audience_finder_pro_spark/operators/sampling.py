"""Deterministic sampling / splitting / mixture weighting for training data.

A 100 TB curation pipeline needs reproducible answers to "which split is
this doc in?" and "does this doc survive the source's mixture weight?" —
answers that cannot depend on partitioning, row order, or a seed file.
Everything here keys on a salted md5 of the row's id:

    bucket = int(hex(md5(salt || ':' || id))[:15]) % 10_000

md5 (not xxhash64) so DuckDB oracles compute the identical value; the
15-hex-digit prefix fits a signed 64-bit int in both engines. Each
concern uses its own salt, so split assignment and mixture sampling are
independent coin flips — subsampling a source never biases its
train/val/test proportions.

All pure expressions (one projection, no shuffle, no UDF): at scale the
sample/split is a pushable filter on top of the scan, and the same row
always lands in the same split on any cluster, any partitioning, any
engine version.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000  # rate resolution: 0.01%


def hash_bucket(id_col: Column | str, salt: str) -> Column:
    """Deterministic bucket in [0, BUCKETS) from a salted md5 of the id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, 15), 16, 10)
    return F.pmod(h.cast("long"), F.lit(BUCKETS))


def hash_bucket_sql(id_expr: str, salt: str) -> str:
    """DuckDB expression computing the identical bucket (oracle side)."""
    return (
        f"CAST(concat('0x', substr(md5('{salt}:' || CAST({id_expr} AS VARCHAR)), 1, 15))"
        f" AS BIGINT) % {BUCKETS}"
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` column assigning each row to a named fraction
    (default 90/5/5 train/val/test). Fractions must sum to 1."""
    splits = splits or {"train": 0.90, "val": 0.05, "test": 0.05}
    if abs(sum(splits.values()) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {splits}")
    b = hash_bucket(id_col, salt)
    names = list(splits)
    expr, lo = None, 0
    # The last split is the .otherwise() arm: rounded boundaries (e.g.
    # {1/3,1/3,1/3} -> cumulative hi 9999) must not leave bucket
    # BUCKETS-1 falling through every when() to a NULL split.
    for name in names[:-1]:
        hi = lo + round(splits[name] * BUCKETS)
        cond = b < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def mixture_sample(
    df: DataFrame,
    rate: Column,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Adds a ``sampled`` flag: row survives iff its bucket falls under
    ``rate`` (a per-row Column in [0,1] — e.g. a per-source mixture
    weight). Integer compare against rate·BUCKETS so engines can't
    disagree on a float boundary."""
    b = hash_bucket(id_col, salt)
    return df.withColumn("sampled", b < F.round(rate * BUCKETS).cast("long"))
