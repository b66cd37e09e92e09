#!/usr/bin/env python
"""End-to-end LLM training-data curation walkthrough.

Run: python examples/curation_pipeline.py [sf_dir] [out_dir]
     (defaults: /root/testdata/sf0.001, a temp directory)

The canonical corpus-to-training-shards path, every stage an operator
from this engine, chained on one SparkSession:

  1. validate   — Deequ-style constraint gate on the raw batch
  2. diff       — what changed vs the previous snapshot (here: self)
  3. clean      — C4 line rules + Gopher heuristic quality gate
  4. dedup      — exact + MinHash-LSH near-dup → CC clusters → keep-best
  5. decontaminate — 13-gram overlap vs a benchmark set
  6. score      — trainable quality classifier + DSIR importance
  7. select     — Gumbel-top-k importance resample
  8. mix/split  — deterministic train/val/test + mixture subsample
  9. pack+ship  — token-budgeted JSONL shards + manifest

Each stage prints row counts so the funnel is visible. All stages are
lazy DataFrame plans until their action; at 100 TB the same code runs
under spark-submit with the knobs in README "Deploying on a real
cluster".
"""
import sys
import tempfile

sys.path.insert(0, ".")
from pyspark.sql import functions as F

from audience_finder_pro_spark.operators.decontaminate import ngram_contamination
from audience_finder_pro_spark.operators.dedup import corpus_dedup
from audience_finder_pro_spark.operators.filtering import c4_filters, gopher_filters
from audience_finder_pro_spark.operators.profile import snapshot_diff
from audience_finder_pro_spark.operators.relevance import (
    classifier_features,
    fit_quality_classifier,
    importance_score,
    score_quality_classifier,
)
from audience_finder_pro_spark.operators.sampling import gumbel_topk, hash_split
from audience_finder_pro_spark.operators.validate import validate_table
from audience_finder_pro_spark.session import get_spark, load_table
from audience_finder_pro_spark.sources.sinks import write_training_shards


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="shards_")
    spark = get_spark("curation-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf, "documents", fan_out=True)
    n0 = docs.count()
    print(f"raw corpus: {n0} docs")

    # 1. validate the batch before anything touches it
    report = validate_table(
        docs,
        [
            ("id_not_null", "not_null", {"col": "doc_id"}),
            ("id_unique", "unique", {"cols": ["doc_id"]}),
            ("text_not_null", "not_null", {"col": "text"}),
        ],
    )
    report.show(truncate=False)
    assert all(r.passed for r in report.collect()), "validation gate failed"

    # 2. snapshot diff vs the previous version (self-diff here: all unchanged)
    diff = snapshot_diff(docs, docs)
    diff.groupBy("status").count().show()

    # 3. line-level clean (C4) + heuristic quality gate (Gopher)
    cleaned = c4_filters(docs, min_words_per_line=5, require_terminal_punct=False,
                         min_sentences=0)
    keep_c4 = cleaned.filter("keep").select("doc_id")
    quality = gopher_filters(docs, min_words=10, min_stop_words=0, min_alpha_frac=0.0)
    keep_q = quality.filter("keep").select("doc_id")
    gated = docs.join(keep_c4, "doc_id").join(keep_q, "doc_id")
    print(f"after clean+quality gates: {gated.count()} docs")

    # 4. full dedup: exact + near evidence -> clusters -> keep-best canonical
    deduped = corpus_dedup(gated)
    keepers = gated.join(deduped.filter("keep").select("doc_id"), "doc_id")
    print(f"after dedup: {keepers.count()} docs")

    # 5. decontaminate vs a benchmark set (here: 20 fixture docs stand in)
    bench = docs.filter(F.col("doc_id") % 29 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    contam = ngram_contamination(keepers, bench, n=13)  # returns flagged docs
    clean_docs = keepers.join(contam.select("doc_id"), "doc_id", "left_anti")
    print(f"after decontamination: {clean_docs.count()} docs")

    # 6. score: source-discriminator classifier + DSIR importance
    feats = classifier_features(
        clean_docs, label=(F.col("source") == "src0").cast("int")
    ).filter(F.col("n_tok") > 0)
    w = fit_quality_classifier(feats)
    clf = score_quality_classifier(feats, w).select("doc_id", "clf_score")
    target = clean_docs.filter(F.col("source") == "src0")
    dsir = importance_score(clean_docs, target).select(
        "doc_id", F.col("dsir_logratio").alias("score"), "n_tokens"
    )
    scored = clean_docs.join(clf, "doc_id").join(dsir, "doc_id")

    # 7. select the best half by Gumbel-top-k on the DSIR score
    k = max(10, scored.count() // 2)
    selected = gumbel_topk(scored, k=k).drop("gumbel_key")
    print(f"selected for training: {selected.count()} docs (gumbel top-{k})")

    # 8. deterministic split
    split = hash_split(selected, "doc_id")
    split.groupBy("split").count().show()

    # 9. pack into token-budgeted shards + manifest
    manifest = write_training_shards(
        split.filter("split = 'train'"), out,
        shard_tokens=2048, token_col="n_tokens", compression=None,
    )
    print(f"shards written to {out}:")
    manifest.show()
    print("curation pipeline complete")


if __name__ == "__main__":
    main()
