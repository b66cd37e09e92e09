"""Benchmark decontamination — drop training docs that leak eval data.

Standard practice before pretraining: remove documents that contain
benchmark/eval text, exactly (copied question strings) or nearly
(reformatted copies). Both forms compose the engine's existing dedup
machinery across TWO frames instead of within one:

- ``exact_decontaminate``: anti-join on the normalized-text fingerprint
  (``norm_text_hash`` — the exact_dedup key). The benchmark side is
  tiny relative to a 100 TB corpus, so the join broadcasts; the corpus
  is never shuffled.
- ``ngram_decontaminate``: the n-gram overlap rule (13-gram word
  shingles are the published convention): a training doc is contaminated
  when ≥ ``min_hits`` of its shingles appear anywhere in the benchmark.
  Benchmark shingles are hashed (xxhash64, the MinHash trick — longs
  join faster than strings and the benchmark shingle set is collected
  nowhere) and deduplicated, then the corpus shingle stream semi-joins
  against them. Scale shape: the benchmark shingle table is small →
  broadcast join against the corpus stream; one groupBy(doc) counts
  hits; the only wide exchange is doc-keyed.

Returns are corpus-shaped (full rows), so both steps drop into a
curation pipeline between dedup and the quality gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from audience_finder_pro_spark.functions.text import hashed_shingle_stream, norm_text_hash


def exact_decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    benchmark_text_col: str | None = None,
) -> DataFrame:
    """Training rows whose normalized text does NOT appear in the benchmark."""
    bcol = benchmark_text_col or text_col
    bench_hashes = benchmark.select(norm_text_hash(bcol).alias("_bh")).distinct()
    return train.join(
        F.broadcast(bench_hashes),
        norm_text_hash(text_col) == F.col("_bh"),
        "left_anti",
    )


def ngram_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    benchmark_text_col: str | None = None,
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """(id, n_contaminated_shingles) for every training doc with ≥min_hits
    distinct n-gram shingles present in the benchmark. Docs shorter than
    ``n`` tokens produce no shingles and cannot be flagged (matching the
    published n-gram rule's behavior on short docs)."""
    bcol = benchmark_text_col or text_col
    # one UNIQUE id per benchmark row. Historical: the r5 window-based
    # shingler partitioned on the id, so a shared literal id interleaved
    # the token streams of different benchmark docs and shingled across
    # document boundaries (caught when a multi-doc benchmark produced
    # zero true shingles). The r6 zip-sliced gram_stream shingles each
    # ROW independently, so duplicate ids are no longer hazardous — but
    # unique ids stay: they keep downstream per-benchmark-doc semantics
    # well-defined and guard against any future id-keyed consumer.
    bench_sh = (
        hashed_shingle_stream(
            benchmark.select(F.monotonically_increasing_id().alias("_bid"), F.col(bcol)),
            "_bid",
            bcol,
            n,
        )
        .select(F.col("h").alias("_h"))
        .distinct()
    )
    # Semi-join BEFORE any dedup: the broadcast filter shrinks the corpus
    # shingle stream to contaminated hits only (usually ~zero), so the
    # distinct count pays its exchange on the flagged remnant, never on
    # the full corpus stream (count_distinct dedups repeated shingles
    # within a doc — min_hits counts DISTINCT leaked n-grams).
    # hashed stream on BOTH sides (hash-equality is all the rule needs):
    # skips the 13-token string materialization that was ~75% of the
    # pipeline cost (functions/text.hashed_shingle_stream)
    train_sh = hashed_shingle_stream(train, id_col, text_col, n).select(
        id_col, F.col("h").alias("_h")
    )
    hits = (
        train_sh.join(F.broadcast(bench_sh), "_h", "left_semi")
        .groupBy(id_col)
        .agg(F.count_distinct("_h").alias("n_contaminated_shingles"))
        .filter(F.col("n_contaminated_shingles") >= min_hits)
    )
    return hits


def ngram_decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    benchmark_text_col: str | None = None,
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Training rows NOT flagged by ``ngram_contamination`` (anti-join on id).

    No broadcast hint on the flagged set: its size is data-dependent
    (usually tiny, but a heavily contaminated corpus is exactly when it
    isn't) — AQE picks broadcast when it fits."""
    flagged = ngram_contamination(
        train, benchmark, id_col, text_col, benchmark_text_col, n, min_hits
    ).select(id_col)
    return train.join(flagged, id_col, "left_anti")
