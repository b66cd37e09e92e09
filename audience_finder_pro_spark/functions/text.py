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
    # array_remove, not F.filter(λ len>0): the split only yields empty
    # strings (never nulls), so the two are equivalent — and a HOF lambda
    # here would evaluate interpreted per token AND block whole-stage
    # subexpression elimination for every sibling expression that shares
    # the tokenize subtree (NOTES gotcha; the curation_pipeline lesson).
    return F.array_remove(arr, "")


def shingles(tok: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token array → array<string> (space-joined).

    Built with higher-order functions only (transform over an index
    sequence + slice) — stays JVM-side, no UDF. The sub-n guard must be a
    ``when``, not ``sequence(1, greatest(cnt, 0))``: Spark sequences run
    DESCENDING when stop < start, so the old greatest() form produced
    [1, 0] for short docs and slice(start=0) threw at runtime (caught by
    the gram_stream equivalence property test).
    """
    k = F.lit(n)
    cnt = F.size(tok) - k + 1
    idx = F.when(cnt > 0, F.sequence(F.lit(1), cnt)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.array_join(F.slice(tok, i, k), " "))


def gram_stream(df, id_col: str, text_col: str, n: int = 3):
    """(id, t0..t{n-1}) positional token stream — one row per token, with
    the n-1 following tokens alongside (null-padded at the doc tail).

    ``shingles()`` builds per-row arrays through higher-order lambdas,
    which Catalyst evaluates *interpreted* per element (measured ~20µs per
    shingle — 6s for one sf0.1 doc table on one core). This form stays
    JVM-side with NO exchange at all: ``arrays_zip`` of the token array
    with its offset-by-i slices yields (t_i, t_{i+1}, ..) per position in
    a single generate — the doc never leaves its input partition. (The
    previous form got the offsets from ``lead`` over a (doc, pos) window:
    byte-identical output, but it shuffled the FULL token stream on doc id
    and sorted it, and every downstream aggregation then rode that one
    exchange with no map-side combine. Zip-sliced, the first shuffle in
    any consumer is its own groupBy — which partial-aggregates before the
    exchange, so at scale the wire carries combined groups, not tokens.)
    """
    tok = tokens(text_col)
    slices = [
        F.slice(tok, i + 1, F.greatest(F.size(tok) - i, F.lit(0))).alias(f"_s{i}")
        for i in range(n)
    ]
    zipped = df.select(
        F.col(id_col), F.explode(F.arrays_zip(*slices)).alias("_z")
    )
    return zipped.select(
        id_col, *[F.col(f"_z._s{i}").alias(f"t{i}") for i in range(n)]
    )


def shingle_stream(df, id_col: str, text_col: str, n: int = 3):
    """(id, shingle) stream of word n-grams — the scale path for shingling.

    ``gram_stream`` + ``concat_ws``: zero-exchange, whole-stage codegen,
    byte-identical shingle strings to the per-row HOF form.

    Emits duplicates (one row per occurrence); callers needing set
    semantics aggregate with distinct — min-style folds (MinHash) don't
    need it.
    """
    parts = gram_stream(df, id_col, text_col, n)
    return parts.filter(F.col(f"t{n - 1}").isNotNull()).select(
        id_col, F.concat_ws(" ", *[f"t{i}" for i in range(n)]).alias("shingle")
    )


def hashed_shingle_stream(df, id_col: str, text_col: str, n: int = 3):
    """(id, h) stream of word n-gram HASHES — for consumers that never need
    the shingle text (decontamination, MinHash-style signatures).

    Same zip-of-slices shape as ``shingle_stream``, but each token is
    hashed ONCE up front (xxhash64 via a transform — ~54 interpreted
    lambda calls per doc, measured cheaper than what it removes) and the
    n-wide zip then copies 8-byte longs instead of token strings; the
    per-position hash combines the n token hashes in one multi-column
    xxhash64. Measured 0.43s vs 1.67s for the string form at n=13 on the
    sf0.1 documents table — the string materialization was ~75% of the
    13-gram pipeline.

    Equality semantics: tokens contain no separator characters, so
    distinct (t_i..t_{i+n-1}) tuples ⇔ distinct space-joined shingle
    strings; hash equality differs from the string form only on xxhash64
    collisions (~1e-12 at 1e6 shingles — the same exposure the string
    form's xxhash64(shingle) already accepts).
    """
    tok = tokens(text_col)
    th = F.transform(tok, lambda x: F.xxhash64(x))
    slices = [
        F.slice(F.col("_th"), i + 1, F.greatest(F.size(F.col("_th")) - i, F.lit(0))).alias(
            f"_s{i}"
        )
        for i in range(n)
    ]
    zipped = df.select(F.col(id_col), th.alias("_th")).select(
        id_col, F.explode(F.arrays_zip(*slices)).alias("_z")
    )
    return zipped.filter(F.col(f"_z._s{n - 1}").isNotNull()).select(
        id_col, F.xxhash64(*[F.col(f"_z._s{i}") for i in range(n)]).alias("h")
    )


def norm_text_hash(col: Column | str) -> Column:
    """Deterministic fingerprint of normalized lowercase text.

    md5 (not xxhash64) so the DuckDB oracle computes the identical value
    (SURVEY §2.4 A9 exact-dedup oracle).
    """
    return F.md5(F.lower(norm_ws(col)))


def strip_markup(col: Column | str) -> Column:
    """HTML/XML → plain text for corpus ingestion: drop script/style
    blocks and comments wholesale, strip remaining tags, decode the
    common named entities, erase numeric character references, collapse
    whitespace.

    RE2-compatible patterns only (no backreferences — script and style
    get their own literal patterns) so a DuckDB oracle can replay every
    step; pure codegen expressions, no UDF. Entity decoding order
    matters: ``&amp;`` is decoded LAST so double-escaped text
    (``&amp;lt;``) yields the literal ``&lt;`` rather than a phantom
    tag, matching html.unescape's single-pass semantics for these
    entities. Numeric references (``&#8217;`` etc.) are replaced with a
    space — decoding them to code points needs per-row logic that isn't
    worth leaving codegen for at ingest time.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    c = F.regexp_replace(c, r"&#[0-9]+;|&#x[0-9a-fA-F]+;", " ")
    for ent, rep in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return norm_ws(c)
