"""Char-n-gram language identification profiles.

The classic n-gram-profile approach (Cavnar & Trenkle): score a document
against small per-language character-trigram profiles and take the
argmax. Profiles here are compact hand-picked high-frequency trigrams
(with word-boundary spaces, the strongest signals) — enough to exercise
the operator end-to-end; a production profile is just a longer list in
the same structure.

The profile dict is the single source of truth: the Spark expression and
the DuckDB oracle SQL are both generated from it, so the two engines
cannot drift. Scoring uses integer hit counts for the argmax (exact in
both engines — no float-boundary tie flakiness) and emits rounded
fractions for reporting.
"""

from __future__ import annotations

# keys sorted = deterministic argmax priority on ties (first max wins)
LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "de": ("der", "ein", "sch", "ich", "nde", "die", "che", "ung", " de", "en "),
    "en": ("the", " th", "he ", "ing", "ng ", "and", " an", "ion", "ed ", " of"),
    "es": ("que", " qu", "ión", "los", " lo", "ado", " de", "la ", "el ", "os "),
    "fr": ("les", " le", "ent", "des", " de", "une", " un", "ait", "é ", "re "),
}


def trigram_hits_sql(norm_expr: str) -> str:
    """DuckDB SELECT fragment: one integer hit-count column per language
    over the char trigrams of ``norm_expr`` (a normalized-text SQL expr)."""
    tg = (
        f"list_transform(range(1, greatest(length({norm_expr}) - 2, 0) + 1),"
        f" i -> substr({norm_expr}, i, 3))"
    )
    cols = []
    for lang, grams in LANG_TRIGRAMS.items():
        inlist = ", ".join("'" + g.replace("'", "''") + "'" for g in grams)
        cols.append(f"len(list_filter({tg}, x -> x IN ({inlist}))) AS {lang}_hits")
    return ",\n             ".join(cols)
