"""Vector math over ``array<float>`` embedding columns (SURVEY §2.4 A10).

Pure higher-order-function expressions (zip_with + aggregate): the dot
product/norms run in the JVM per row with no Python or shuffle. At
100 TB this is a narrow map over the embeddings scan.

Note on determinism: the fold is sequential left-to-right in both Spark
(``aggregate``) and the DuckDB oracle (``list_sum(list_transform(...))``)
over float32 inputs widened to double, so results match bit-for-bit at
fixed dim=64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
