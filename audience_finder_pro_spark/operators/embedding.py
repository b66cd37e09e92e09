"""Feature-hashing text embedder — the hashing trick at corpus scale (E44).

Turns raw text into fixed-width vectors with NO model, NO vocabulary
and NO Python (Weinberger et al. 2009, "Feature Hashing for Large Scale
Multitask Learning" — the classic pre-neural representation): each
token hashes to a component index and a ±1 sign; a document's embedding
is the signed sum of its token counts per component. Two documents
sharing vocabulary land close in cosine, which is exactly what the
similarity tier (A10 ANN, E8 SemDeDup, E23 k-NN graph) needs as input
when no neural embedding column exists — this operator is the bridge
from the raw `documents.text` column into that tier at 100 TB, where a
vocabulary-building pass (tfidf's dfreq join) may be the step you
cannot afford. The reference has no embedding facility at all; its
fixed-keyword scan (app.py:93-149) is the closest analogue.

Scale shape (pure DataFrame):
- ONE tokenize→explode pass, ONE map-side-combined (doc, token) tf
  aggregate, ONE (doc, component) re-aggregate. No joins, no vocabulary
  state, no driver collection — hashing replaces the vocab lookup, the
  property that makes the trick streaming- and shard-friendly.
- The dense form pivots on the KNOWN component range (explicit pivot
  values — no extra distinct pass) and assembles one `array()` call per
  doc: built-in expressions only, no per-element lambdas (the NOTES
  interpreted-HOF rule).

Determinism (cross-engine, exact): the component index and sign come
from md5 hex digits via ``instr`` arithmetic — byte-identical in Spark
and DuckDB (both emit lowercase-hex md5) — and the values are INTEGER
signed counts: no float enters the operator at all, so the SQL oracle
hash-matches exactly and any partitioning sums identically. Cosine
downstream is scale-invariant, so unnormalized integer vectors feed it
directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from audience_finder_pro_spark.functions.text import tokens

_HEX = "0123456789abcdef"


def _hex_digit(pos: int) -> Column:
    """Value 0-15 of hex digit ``pos`` (1-based) of the ``_hx`` md5
    column — instr over a constant alphabet, reproducible in any ANSI
    engine (DuckDB's instr/substr behave identically)."""
    return F.expr(f"instr('{_HEX}', substring(_hx, {pos}, 1))") - 1


def hashed_embedding_long(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """Sparse (long) form: (id, component, val) for every OCCUPIED
    component — the SQL-oracle-able core. ``val`` = Σ sign(token)·tf
    over tokens hashing to the component; absent components are zero.

    Component = first three md5 hex digits (0-4095) mod ``dim`` (use a
    power-of-two/divisor of 4096 to keep the fold uniform); sign = parity
    of the fourth digit."""
    if not 1 <= dim <= 4096:
        raise ValueError("hashed_embedding needs 1 <= dim <= 4096")
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("_tok"))
    tf = tok.groupBy(id_col, "_tok").agg(F.count(F.lit(1)).alias("_tf"))
    hx = tf.withColumn("_hx", F.md5("_tok"))
    comp = hx.select(
        F.col(id_col),
        (
            (_hex_digit(1) * 256 + _hex_digit(2) * 16 + _hex_digit(3)) % dim
        ).cast("int").alias("component"),
        F.when(_hex_digit(4) % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).alias("_sign"),
        F.col("_tf"),
    )
    return comp.groupBy(id_col, "component").agg(
        F.sum(F.col("_sign") * F.col("_tf")).alias("val")
    )


def hashed_embedding(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    out_col: str = "embedding",
) -> DataFrame:
    """Dense form: (id, embedding array<float> of width ``dim``) — the
    drop-in input for the similarity tier (cosine is scale-invariant,
    so the integer counts feed it unnormalized). Zero-filled where no
    token hashed; a zero-token doc gets the all-zero vector (the tier's
    zero-norm guards already handle it). Pivot on the known component
    range — one wide aggregate, one array() call per doc."""
    long = hashed_embedding_long(df, id_col, text_col, dim)
    wide = long.groupBy(id_col).pivot("component", list(range(dim))).sum("val")
    dense = wide.select(
        F.col(id_col),
        F.array(
            *[F.coalesce(F.col(str(i)), F.lit(0)).cast("float") for i in range(dim)]
        ).alias(out_col),
    )
    # docs with zero tokens never reach the long form — reattach with zeros
    return (
        df.select(id_col)
        .distinct()
        .join(dense, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                F.col(out_col),
                F.array(*[F.lit(0.0).cast("float")] * dim),
            ).alias(out_col),
        )
    )


def contrastive_negatives(
    df: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    label_col: str = "label",
    salt: str = "cn",
    oversample: int | None = None,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training (E75):
    for every anchor row, up to ``k`` pseudo-random rows with a
    DIFFERENT label — the (anchor, negative) pairs an embedding-model
    trainer exports alongside its positives. Seed-free and
    partitioning-proof: probe j of anchor a targets id
    ``pmod(md5('{salt}:a:j'), max_id+1)`` (the E4 salted-hash
    machinery), so the same corpus yields the same pairs on any engine
    — the property that makes the export reproducible and the SQL
    oracle exact.

    Contract: the id domain should be DENSE integers in [0, max_id]
    (the natural shape of a pipeline-assigned row id; `pack_sequences`
    order output or a parquet row index both qualify). Probes landing
    on a missing id, on the anchor itself, or on the anchor's own label
    are dropped; ``2k + 4`` probes are drawn per anchor (override with
    ``oversample``) so a per-anchor shortfall below k needs heavy id
    sparsity or a dominant label — possible, documented, and visible in
    the output (fewer than k rows for that anchor), never silently
    padded. Duplicate hits of one candidate keep the earliest probe.

    Returns (id_col, neg_id, neg_label, pick) with pick = 1..k in probe
    order. Scale shape: anchors × (2k+4) probe rows equi-joined to the
    corpus on the id — two linear hash-partitioned exchanges; max_id is
    a 1-row broadcast; no global window, no all-pairs anything."""
    if k < 1:
        raise ValueError("contrastive_negatives needs k >= 1")
    m = oversample if oversample is not None else 2 * k + 4
    if m < k:
        raise ValueError("contrastive_negatives needs oversample >= k")
    anchors = df.select(
        F.col(id_col).alias("_a"), F.col(label_col).alias("_al")
    ).filter(F.col("_a").isNotNull())
    bound = df.agg(F.max(id_col).alias("_maxid"))
    probes = (
        anchors.crossJoin(F.broadcast(bound))
        .select(
            "_a",
            "_al",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("_j"),
            "_maxid",
        )
        .withColumn(
            "_pos",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(f"{salt}:"),
                                F.col("_a").cast("string"),
                                F.lit(":"),
                                F.col("_j").cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.col("_maxid") + 1,
            ),
        )
    )
    cands = df.select(
        F.col(id_col).alias("_c"), F.col(label_col).alias("_cl")
    )
    hits = (
        probes.join(cands, probes["_pos"] == cands["_c"])
        .filter((F.col("_cl") != F.col("_al")) & (F.col("_c") != F.col("_a")))
        .groupBy("_a", "_c", "_cl")
        .agg(F.min("_j").alias("_j"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_a").orderBy(F.col("_j").asc(), F.col("_c").asc())
    return (
        hits.withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= k)
        .select(
            F.col("_a").alias(id_col),
            F.col("_c").alias("neg_id"),
            F.col("_cl").alias("neg_label"),
            "pick",
        )
    )
