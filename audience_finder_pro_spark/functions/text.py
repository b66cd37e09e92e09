"""Text normalization + tokenization expressions (SURVEY §2.8 F1-F9, F17).

Re-expresses the reference's row-at-a-time Python string handling as
codegen'd Spark SQL expressions:

- whitespace normalization  → ref ``re.sub(r'\\s+', ' ', x).strip()``
  (/root/reference/app.py:94-95, 127)
- newline strip (CSV hygiene) → ref v1:61,75,253 ``.replace('\\n',' ')``
- truncate + ellipsis         → ref v1:75 ``[:300] + '...'``
- tokenize / shingle / hash   → LLM-pipeline tier (no ref analogue)

All pure expressions: at 100 TB these run inside WholeStageCodegen on
the executors with zero Python involvement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_ws(col: Column | str) -> Column:
    """Collapse whitespace runs to single spaces and trim (ref app.py:94-95)."""
    return F.trim(F.regexp_replace(F.col(col) if isinstance(col, str) else col, r"\s+", " "))


def strip_newlines(col: Column | str) -> Column:
    """Replace newlines with spaces (ref v1:61) — CSV-sink hygiene."""
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col, r"\n", " ")


def truncate_ellipsis(col: Column | str, n: int = 300) -> Column:
    """First ``n`` chars + ``'...'`` (ref v1:75)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.substring(c, 1, n), F.lit("..."))


def tokens(col: Column | str, lowercase: bool = True) -> Column:
    """Whitespace/punctuation tokenizer → array<string>.

    Deterministic regex split (SURVEY §2.8 F17: "tokenization declared as
    exact regex split → reproducible in SQL"). Splits on any run of
    non-alphanumeric characters; drops empty tokens.
    """
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    arr = F.split(c, r"[^a-z0-9]+" if lowercase else r"[^A-Za-z0-9]+")
    return F.filter(arr, lambda t: F.length(t) > 0)


def shingles(tok: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token array → array<string> (space-joined).

    Built with higher-order functions only (transform over an index
    sequence + slice) — stays JVM-side, no UDF.
    """
    k = F.lit(n)
    idx = F.sequence(F.lit(1), F.greatest(F.size(tok) - k + 1, F.lit(0)))
    return F.transform(idx, lambda i: F.array_join(F.slice(tok, i, k), " "))


def shingle_stream(df, id_col: str, text_col: str, n: int = 3):
    """(id, shingle) stream of word n-grams — the scale path for shingling.

    ``shingles()`` builds per-row arrays through higher-order lambdas,
    which Catalyst evaluates *interpreted* per element (measured ~20µs per
    shingle — 6s for one sf0.1 doc table on one core). This form stays
    entirely inside whole-stage codegen: posexplode the token stream, then
    ``lead`` over (id, pos) + ``concat_ws`` — byte-identical shingle
    strings. The window's doc-id exchange is reused by any downstream
    groupBy(id) (MinHash signatures, distinct-shingle counts), so it costs
    no extra shuffle in those pipelines.

    Emits duplicates (one row per occurrence); callers needing set
    semantics aggregate with distinct — min-style folds (MinHash) don't
    need it.
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "t0"))
    w = Window.partitionBy(id_col).orderBy("pos")
    lead_cols = [F.lead("t0", i).over(w).alias(f"t{i}") for i in range(1, n)]
    parts = toks.select(id_col, "t0", *lead_cols)
    return parts.filter(F.col(f"t{n - 1}").isNotNull()).select(
        id_col, F.concat_ws(" ", *[f"t{i}" for i in range(n)]).alias("shingle")
    )


def norm_text_hash(col: Column | str) -> Column:
    """Deterministic fingerprint of normalized lowercase text.

    md5 (not xxhash64) so the DuckDB oracle computes the identical value
    (SURVEY §2.4 A9 exact-dedup oracle).
    """
    return F.md5(F.lower(norm_ws(col)))
