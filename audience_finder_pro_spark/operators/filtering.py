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


def gopher_filters(
    docs: DataFrame,
    id_col: str = "doc_id",
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
) -> DataFrame:
    """(id, metrics..., keep) for every doc — the Gopher quality gate.

    Empty/whitespace-only docs have 0 words: ratio metrics are NULL and
    ``keep`` is false (the word-count rule already rejects them; NULLs
    never pass a threshold comparison and the conjunction coalesces to
    false). All divisions are guarded, all floats rounded to 4 dp for
    cross-engine hash parity.
    """
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
    return docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_frac"),
        n_stop.cast("long").alias("n_stop_words"),
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )
