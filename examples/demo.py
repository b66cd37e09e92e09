#!/usr/bin/env python
"""End-to-end tour of the engine for a new user.

Run: python examples/demo.py [sf_dir]   (defaults to the sf0.001 fixtures)

Covers the reference's two pipelines plus one operator from each added
tier — relational, dedup, similarity, text, streaming-batch — all pure
DataFrame plans on one SparkSession.
"""
import sys

sys.path.insert(0, ".")
from pyspark.sql import functions as F

from audience_finder_pro_spark.operators import (
    brute_force_topk,
    exact_dedup,
    minhash_lsh_pairs,
    salted_agg,
)
from audience_finder_pro_spark.plans.audience import discover_communities, scan_signals
from audience_finder_pro_spark.session import get_spark, load_table, register_catalog


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("demo")
    spark.sparkContext.setLogLevel("ERROR")

    print("== reference pipeline 1: community discovery ==")
    discover_communities(spark, sf, queries=["spark", "vector"]).show(5, truncate=40)

    print("== reference pipeline 2: signal scan ==")
    scan_signals(spark, sf, ["src1", "src2"], ["spark", "dup"]).show(5, truncate=40)

    print("== relational tier (SQL facade over the catalog) ==")
    register_catalog(spark, sf)
    spark.sql(
        """SELECT l_returnflag, round(sum(l_extendedprice), 2) AS revenue
           FROM lineitem GROUP BY l_returnflag ORDER BY revenue DESC"""
    ).show()

    print("== skew-safe aggregation ==")
    salted_agg(
        load_table(spark, sf, "lineitem"),
        ["l_returnflag"],
        {"total_qty": ("l_quantity", "sum"), "n": ("*", "count")},
    ).show()

    print("== dedup tier ==")
    docs = load_table(spark, sf, "documents")
    print("docs:", docs.count(), "| exact-dedup reps:", exact_dedup(docs).count())
    minhash_lsh_pairs(docs, threshold=0.5).show(5)

    print("== similarity tier ==")
    emb = load_table(spark, sf, "embeddings")
    queries = emb.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    brute_force_topk(emb, queries, k=3).show()

    print("== curation tier: pairs -> clusters -> gate -> mixture ==")
    from audience_finder_pro_spark.operators.dedup import ngram_jaccard_pairs
    from audience_finder_pro_spark.operators.graph import dedup_clusters
    from audience_finder_pro_spark.operators.sampling import hash_split, mixture_sample
    from audience_finder_pro_spark.streaming.jobs import quality_gate

    pairs = ngram_jaccard_pairs(docs, threshold=0.8, df_cap_frac=0.05)
    clusters = dedup_clusters(docs, pairs)
    kept = clusters.filter(F.col("doc_id") == F.col("cluster_id"))
    print(
        "near-dup pairs:", pairs.count(),
        "| docs:", docs.count(),
        "| cluster representatives kept:", kept.count(),
    )
    gated = quality_gate(docs.join(kept.select("doc_id"), "doc_id", "left_semi"))
    gated.groupBy("passes_gate").count().show()
    final = mixture_sample(
        hash_split(gated.filter("passes_gate")), F.lit(0.5), "doc_id"
    )
    final.groupBy("split", "sampled").count().orderBy("split", "sampled").show()

    print("== semantic dedup (SemDeDup): cluster-blocked embedding near-copies ==")
    from audience_finder_pro_spark.operators.similarity import semantic_dedup

    corpus = emb.unionByName(
        emb.limit(3).select((F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label")
    )
    semantic_dedup(corpus, threshold=0.95, n_clusters=8, assignment="arrow").filter(
        "is_dup"
    ).show()

    print("== packing tier: fixed token-budget bins ==")
    from audience_finder_pro_spark.operators.packing import pack_sequences

    packed = pack_sequences(
        final.filter("sampled").withColumn("n_tokens", F.col("n_tokens")),
        budget=2048,
    )
    packed.groupBy("bin_id").agg(
        F.count("*").alias("docs"), F.sum("n_tokens").alias("bin_tokens")
    ).orderBy("bin_id").show(5)

    print("== multimodal tier: real stdlib PNG decode ==")
    import struct
    import zlib
    from binascii import crc32

    from audience_finder_pro_spark.multimodal import decode_features

    def _chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", crc32(ctype + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress((b"\x00" + bytes([40, 80, 120] * 8)) * 8))
        + _chunk(b"IEND", b"")
    )
    media = spark.createDataFrame(
        [(0, bytearray(png), "image/png"), (1, bytearray(b"opaque"), "video/mp4")],
        "doc_id long, payload binary, media_type string",
    )
    decode_features(media).show()

    print("== relevance tier: TF-IDF keywords + bigram-LM fluency ==")
    from audience_finder_pro_spark.operators.relevance import (
        lm_score_docs,
        tfidf_top_terms,
    )

    tfidf_top_terms(docs, k=3).show(6)
    lm_score_docs(docs, docs).orderBy(F.desc("lm_logprob")).show(3)

    print("== profiling + curriculum: sketches, deciles, eval sample ==")
    from audience_finder_pro_spark.operators.profile import corpus_profile
    from audience_finder_pro_spark.operators.sampling import (
        quantile_bins,
        stratified_sample_k,
    )

    corpus_profile(docs).show(3)
    quantile_bins(
        docs.select("doc_id", F.length("text").alias("chars")), "chars", n_bins=4
    ).groupBy("bin").count().orderBy("bin").show()
    stratified_sample_k(docs, "source", k=1).show(3)

    print("== subword tokenizer: BPE train-on-sample + distributed encode ==")
    from audience_finder_pro_spark.operators.bpe import bpe_encode, train_bpe

    merges = train_bpe(docs, n_merges=60, sample_docs=200)
    print("first merges:", merges[:8])
    bpe_encode(docs, merges).select("doc_id", "n_subwords").show(3)

    print("== media embeddings: payload -> vector -> near-dup ==")
    from audience_finder_pro_spark.multimodal import embed_media

    embed_media(media).select(
        "doc_id", F.slice("embedding", 1, 4).alias("embedding_head")
    ).show(truncate=60)

    print("demo complete")


if __name__ == "__main__":
    main()
