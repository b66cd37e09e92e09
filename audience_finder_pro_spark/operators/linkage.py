"""Fuzzy record linkage: blocked approximate-string entity resolution (E38).

The classic two-corpus identity-matching step (Fellegi–Sunter blocking +
edit-distance comparison): given a LEFT and a RIGHT table of records with
a textual key (names, titles, addresses), find for each left record its
best-matching right record within an edit-distance budget. This is the
record-level cousin of the corpus dedup tier (op/dedup.py) — dedup asks
"same content?", linkage asks "same entity across sources?" — and it is
a staple of training-data pipeline work (joining crawl metadata to a
curated registry, reconciling document ids across snapshot vendors).

The reference's exact-key multi-source merge (app.py:151-190 joins
sources on identical ids) has no fuzzy form; this is the principled
generalization, built public-knowledge-first: multi-pass blocking as in
the record-linkage literature, `levenshtein` from the engine.

Scale shape (pure DataFrame, zero Python):
- NEVER the naive cross join: candidate pairs come from equi-joins on
  cheap BLOCKING keys (name prefix and/or suffix — a single interior
  edit preserves at least one of them), so the comparison volume is
  sum-of-block-sizes-squared, not |L|x|R|. Blocking recall is part of
  the operator's declared semantics (pairs in no shared block are not
  compared) — exactly how production linkage systems state it.
- Each blocking pass is a plain shuffle equi-join on a short string
  key; the passes union and the pair set is DISTINCT'd BEFORE the
  edit-distance computation so a pair caught by both keys pays
  levenshtein once. Key skew is the known hazard (a prefix shared by
  the whole corpus re-creates the cross join); callers pick key
  lengths/sides that discriminate — the planted-data tests pin this.
- A |len(l)-len(r)| <= max_dist band filter runs before levenshtein
  (length difference lower-bounds edit distance), and the JVM
  levenshtein gets the threshold argument so its DP early-exits past
  the budget (Spark >= 3.5 returns -1 above threshold).
- best_only picks one winner per left record with a rank-filtered
  window over (dist ASC, right id ASC) — a total order, and the
  WindowGroupLimit rewrite keeps the shuffle to candidate winners.

Determinism: every output column is an integer or an input string;
there is no float anywhere, so the DuckDB oracle hash-matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fuzzy_link(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "left_id",
    right_id: str = "right_id",
    left_name: str = "left_name",
    right_name: str = "right_name",
    max_dist: int = 2,
    prefix_len: int = 4,
    suffix_len: int = 4,
    best_only: bool = True,
) -> DataFrame:
    """Blocked fuzzy join of ``left`` to ``right`` on an edit-distance budget.

    Returns (left_id, right_id, dist) — all candidate matches within
    ``max_dist``, or (``best_only``) each left record's single best match
    by (dist ASC, right_id ASC). ``prefix_len``/``suffix_len`` choose the
    blocking passes; 0 disables a pass (at least one must be active).

    Short-name rule (pinned cross-engine): names shorter than
    ``suffix_len`` are EXCLUDED from the suffix blocking pass (they can
    still pair via the prefix pass). Without the guard, engines disagree
    on negative-position substrings — Spark ``substring('ab', -4, 4)``
    yields the whole string while ANSI ``substr(s, length(s)-3, 4)``
    yields only the tail — so the operator and its SQL spec would
    silently diverge on short strings. Filtering them out gives both
    engines the identical, documented semantics.
    """
    if prefix_len <= 0 and suffix_len <= 0:
        raise ValueError("fuzzy_link needs at least one blocking pass")
    l = left.select(
        F.col(left_id).alias("_lid"), F.col(left_name).alias("_lname")
    )
    r = right.select(
        F.col(right_id).alias("_rid"), F.col(right_name).alias("_rname")
    )
    passes: list[DataFrame] = []
    if prefix_len > 0:
        passes.append(
            l.withColumn("_bk", F.substring("_lname", 1, prefix_len)).join(
                r.withColumn("_bk", F.substring("_rname", 1, prefix_len)), "_bk"
            )
        )
    if suffix_len > 0:
        # short names sit out this pass (see docstring: negative-position
        # substring semantics differ across engines below suffix_len)
        passes.append(
            l.filter(F.length("_lname") >= suffix_len)
            .withColumn("_bk", F.substring("_lname", -suffix_len, suffix_len))
            .join(
                r.filter(F.length("_rname") >= suffix_len).withColumn(
                    "_bk", F.substring("_rname", -suffix_len, suffix_len)
                ),
                "_bk",
            )
        )
    cand = passes[0]
    for p in passes[1:]:
        cand = cand.unionByName(p)
    # pair-level dedup before the (comparatively) expensive DP; band
    # filter first — length difference lower-bounds edit distance
    cand = (
        cand.select("_lid", "_lname", "_rid", "_rname")
        .distinct()
        .filter(
            F.abs(F.length("_lname") - F.length("_rname")) <= F.lit(max_dist)
        )
        .withColumn("dist", F.levenshtein("_lname", "_rname", max_dist))
        .filter(F.col("dist") >= 0)  # threshold form returns -1 past budget
    )
    if best_only:
        w = Window.partitionBy("_lid").orderBy(F.asc("dist"), F.asc("_rid"))
        cand = cand.withColumn("_rnk", F.row_number().over(w)).filter(
            F.col("_rnk") == 1
        )
    return cand.select(
        F.col("_lid").alias(left_id),
        F.col("_rid").alias(right_id),
        "dist",
    )
