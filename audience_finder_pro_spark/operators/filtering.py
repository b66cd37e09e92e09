"""Heuristic document-quality filtering — the Gopher rules.

Rae et al. 2021 ("Scaling Language Models: ... Gopher", Appendix A1.1)
published the now-standard pre-training quality gate; this module
computes every rule as a pure codegen expression over the raw text (no
tokenizer UDF, no explode — per-doc metrics never need an exchange, the
curation_pipeline lesson) so the filter runs at scan speed and pushes
through Catalyst like any other projection.

Rules (each reported as its metric + verdict, plus the combined keep):

- word count within [min_words, max_words]          (50 .. 100,000)
- mean word length within [3, 10]
- symbol-to-word ratio (#, ellipsis) <= 0.1
- fraction of lines starting with a bullet <= 0.9
- fraction of lines ending with an ellipsis <= 0.3
- fraction of words containing an alphabetic char >= 0.8
- at least 2 of the 8 Gopher stop words present
  {the, be, to, of, and, that, have, with}

Lambda-free by construction: word counts and per-word predicates come
from `regexp_extract_all` over the whole text (a maximal ``\\S`` run
containing a letter IS an alphabetic word — one regex pass instead of a
per-element higher-order filter, which Catalyst evaluates interpreted
and which poisons sibling-subtree CSE; NOTES gotcha).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audience_finder_pro_spark.functions.text import tokens

GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_cols(
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_words: int = 2,
) -> list:
    """The eight Gopher metric/verdict expressions as aliased Columns —
    the projection body of :func:`gopher_filters`, exported so the
    merged ``text_profile`` driver frame can ride the identical
    expressions (wide-merge family, NOTES)."""
    t = F.col(text_col)
    words = F.array_remove(F.split(t, r"\s+"), "")
    n_words = F.size(words)
    # sum of word lengths == text length minus whitespace — no per-word fold
    n_chars = F.length(F.regexp_replace(t, r"\s+", ""))
    # one regex pass per predicate instead of per-word lambdas
    n_alpha_words = F.size(F.regexp_extract_all(t, F.lit(r"\S*[A-Za-z]\S*"), 0))
    n_symbols = (
        (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit(""))))
        + (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / F.lit(3)
        + (F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit(""))))
    )
    lines = F.split(t, r"\n")
    n_lines = F.size(lines)
    n_bullet = F.size(F.regexp_extract_all(t, F.lit(r"(?m)^\s*[•\-\*]"), 0))
    n_ellipsis = F.size(F.regexp_extract_all(t, F.lit(r"(?m)(?:\.\.\.|…)[ \t]*$"), 0))
    n_stop = F.size(
        F.array_intersect(tokens(t), F.array(*[F.lit(w) for w in GOPHER_STOP_WORDS]))
    )

    mean_word_len = F.when(n_words > 0, F.round(n_chars / n_words, 4))
    symbol_ratio = F.when(n_words > 0, F.round(n_symbols / n_words, 4))
    bullet_frac = F.when(n_lines > 0, F.round(n_bullet / n_lines, 4))
    ellipsis_frac = F.when(n_lines > 0, F.round(n_ellipsis / n_lines, 4))
    alpha_frac = F.when(n_words > 0, F.round(n_alpha_words / n_words, 4))

    keep = (
        n_words.between(min_words, max_words)
        & mean_word_len.between(min_mean_word_len, max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_frac)
        & (n_stop >= min_stop_words)
    )
    return [
        n_words.cast("long").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_frac"),
        n_stop.cast("long").alias("n_stop_words"),
        F.coalesce(keep, F.lit(False)).alias("keep"),
    ]


def gopher_filters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **thresholds,
) -> DataFrame:
    """(id, metrics..., keep) for every doc — the Gopher quality gate.

    Empty/whitespace-only docs have 0 words: ratio metrics are NULL and
    ``keep`` is false (the word-count rule already rejects them; NULLs
    never pass a threshold comparison and the conjunction coalesces to
    false). All divisions are guarded, all floats rounded to 4 dp for
    cross-engine hash parity. Threshold kwargs are those of
    :func:`gopher_cols`.
    """
    return docs.select(F.col(id_col), *gopher_cols(text_col, **thresholds))


def c4_filters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    require_terminal_punct: bool = True,
    drop_javascript_lines: bool = True,
    min_sentences: int = 3,
    blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2) — the
    other canonical pre-training gate besides Gopher: it REWRITES the
    document (keeps only clean lines) instead of just scoring it.

    Line rules (a line survives only if it passes all enabled rules):

    - at least ``min_words_per_line`` whitespace-separated words (C4: 3)
    - ends in a terminal punctuation mark ``. ! ? " ”`` (toggleable —
      corpora without sentence punctuation set this off)
    - does not mention "javascript" (case-insensitive)

    Document rules on the cleaned remnant:

    - at least ``min_sentences`` sentences survive (C4: 3)
    - no "lorem ipsum", no curly brace ``{`` anywhere in the raw text
    - no token from the caller's policy ``blocklist`` (C4 uses the
      "Dirty, Naughty…" list; the default is empty — supply your own)

    C4's final rule — exact three-sentence-span dedup across documents —
    is cross-row, not per-doc: compose with
    ``operators/dedup.repeated_passages`` for it.

    Scale shape: pure per-doc projection, zero exchanges, no UDFs. The
    one higher-order lambda (the per-line filter) runs interpreted, but
    over the *lines* array (tens of elements), not a per-token hot path
    — and it is computed once in its own select so its interpreted
    subtree cannot poison sibling-expression CSE (NOTES gotcha).

    Returns (id, n_lines, n_lines_kept, n_sentences, clean_text,
    has_lorem_ipsum, has_brace, keep). NULL text → NULL counts, empty
    clean_text, keep=false.
    """
    t = F.col(text_col)

    def _line_ok(x):  # per-line predicate inside the single HOF filter
        cond = F.size(F.array_remove(F.split(F.trim(x), r"\s+"), "")) >= F.lit(
            min_words_per_line
        )
        if require_terminal_punct:
            cond = cond & F.trim(x).rlike('[.!?"”]$')
        if drop_javascript_lines:
            cond = cond & ~F.contains(F.lower(x), F.lit("javascript"))
        return cond

    lines = F.split(t, r"\n")
    staged = docs.select(
        F.col(id_col),
        t.alias("_raw"),
        F.size(lines).cast("long").alias("n_lines"),
        F.filter(lines, _line_ok).alias("_kept"),
    )

    clean = F.concat_ws("\n", F.col("_kept"))
    n_sentences = F.size(F.regexp_extract_all(clean, F.lit(r"[^.!?]+[.!?]"), 0))
    has_lorem = F.contains(F.lower(F.col("_raw")), F.lit("lorem ipsum"))
    has_brace = F.contains(F.col("_raw"), F.lit("{"))
    n_block = (
        F.size(F.array_intersect(tokens(F.col("_raw")), F.array(*[F.lit(w) for w in blocklist])))
        if blocklist
        else F.lit(0)
    )
    keep = (
        (F.size(F.col("_kept")) > 0)
        & (n_sentences >= F.lit(min_sentences))
        & ~has_lorem
        & ~has_brace
        & (n_block == 0)
    )
    return staged.select(
        id_col,
        "n_lines",
        F.size(F.col("_kept")).cast("long").alias("n_lines_kept"),
        n_sentences.cast("long").alias("n_sentences"),
        clean.alias("clean_text"),
        F.coalesce(has_lorem, F.lit(False)).alias("has_lorem_ipsum"),
        F.coalesce(has_brace, F.lit(False)).alias("has_brace"),
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )
