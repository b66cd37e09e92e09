"""Python UDTF surface (SURVEY §2.10 D3 — "Spark 4 Python UDTF (@udtf)
for table functions").

The engine's extension point for user table functions: one input row →
many output rows with a declared schema, usable from SQL via
``spark.udtf.register``. The built-in example mirrors the reference's
input-line parsing (app.py:205, 265-266: split multi-line text, trim,
drop empties) as a table function — but note the engine's PREFERRED
form for that exact job is the pure-expression P9 pipeline
(split/transform/filter); the UDTF exists for logic that outgrows
expressions.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, line: string")
class ParseLines:
    """split('\n') → trim → drop empties, with input order preserved."""

    def eval(self, text: str):  # noqa: D102 - UDTF contract method
        if text is None:
            return
        pos = 0
        for raw in text.split("\n"):
            line = raw.strip()
            if line:
                yield pos, line
                pos += 1


def register_udtfs(spark) -> None:
    """Register engine UDTFs for SQL use (``SELECT * FROM parse_lines(...)``)."""
    spark.udtf.register("parse_lines", ParseLines)
