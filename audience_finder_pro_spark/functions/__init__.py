"""Scalar/array/text column-expression library (SURVEY §2.8).

Everything here returns pyspark Column expressions — JVM-side,
whole-stage-codegen'd. No Python row UDFs in any hot path.
"""

from audience_finder_pro_spark.functions.text import (
    norm_ws,
    strip_newlines,
    truncate_ellipsis,
    tokens,
    shingles,
    shingle_stream,
    norm_text_hash,
)
from audience_finder_pro_spark.functions.udtf import ParseLines, register_udtfs
from audience_finder_pro_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "norm_ws",
    "strip_newlines",
    "truncate_ellipsis",
    "tokens",
    "shingles",
    "norm_text_hash",
    "shingle_stream",
    "ParseLines",
    "register_udtfs",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
