#!/usr/bin/env python
"""Scale-stress: run the dedup tier on an N-times-replicated corpus.

Each replica perturbs the text tail, planting ~doc_count * N*(N-1)/2 true
near-dup pairs — candidate volume equals the answer size, so throughput
here measures the pipeline, not wasted comparisons.

Usage: python scripts/scale_stress.py [factor] [sf_dir]
"""
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F

from audience_finder_pro_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from audience_finder_pro_spark.session import get_spark, load_table


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    big = (
        docs.select(
            F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep"), "doc_id", "text"
        )
        .select(
            (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
            F.concat("text", F.lit(" tail"), F.col("rep").cast("string")).alias("text"),
        )
        .repartition(spark.sparkContext.defaultParallelism * 2)
    )
    n = big.count()
    t0 = time.time()
    mh = minhash_lsh_pairs(big, threshold=0.9)
    pairs = mh.count()
    t_mh = time.time() - t0
    # release the operator's checkpointed candidate/shingle blocks before the
    # next stage — resident storage is exactly the memory pressure that made
    # the window-form exact_dedup's sort spill (40.7s vs 5.1s, see dedup.py)
    from audience_finder_pro_spark.caching import free_checkpoint

    free_checkpoint(mh)
    del mh
    t0 = time.time()
    kept = exact_dedup(big).count()
    t_ex = time.time() - t0
    print(
        f"docs={n} | minhash(th=0.9): {pairs} verified pairs in {t_mh:.1f}s "
        f"({pairs / max(t_mh, 1e-9):,.0f} pairs/s) | exact_dedup: {kept} reps in {t_ex:.1f}s"
    )

    # Hot-shingle stress for the capped exact-Jaccard path: every doc gets the
    # SAME boilerplate tail, so without a df-cap those shingles join all docs
    # pairwise (quadratic blowup on one key); with the relative cap the join
    # cost must track the true near-dup volume. Smaller replica factor — exact
    # Jaccard's answer itself is O(replicas² per original).
    factor_j = min(factor, 10)
    boiler = (
        docs.select(
            F.explode(F.sequence(F.lit(0), F.lit(factor_j - 1))).alias("rep"), "doc_id", "text"
        )
        .select(
            (F.col("doc_id") * factor_j + F.col("rep")).alias("doc_id"),
            F.concat(
                "text",
                F.lit(" tail"),
                F.col("rep").cast("string"),
                F.lit(" all rights reserved by the example corporation boilerplate notice"),
            ).alias("text"),
        )
        .repartition(spark.sparkContext.defaultParallelism * 2)
    )
    nj = boiler.count()
    t0 = time.time()
    jp = ngram_jaccard_pairs(boiler, threshold=0.9, df_cap_frac=0.001).count()
    t_j = time.time() - t0
    print(
        f"jaccard hot-shingle stress: docs={nj} (universal boilerplate tail) | "
        f"capped(df_cap_frac=0.001, th=0.9): {jp} pairs in {t_j:.1f}s "
        f"({jp / max(t_j, 1e-9):,.0f} pairs/s)"
    )

    # Text-analysis tier at scale: the quality/fingerprint plans are pure
    # window+agg pipelines, so cost should track token volume ~linearly.
    from audience_finder_pro_spark.queries.llm import doc_fingerprint, quality_signals

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        big.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        bigdocs = spark.read.parquet(f"{td}/documents.parquet").select(
            "doc_id", "text", F.lit("src0").alias("source")
        )
        bigdocs.write.mode("overwrite").parquet(f"{td}2/documents.parquet")
        # noop sink, not count(): count would prune the computed metric
        # columns from a bare projection (see bench.py docstring)
        t0 = time.time()
        quality_signals(spark, f"{td}2").write.format("noop").mode("overwrite").save()
        t_q = time.time() - t0
        nq = quality_signals(spark, f"{td}2").count()
        t0 = time.time()
        doc_fingerprint(spark, f"{td}2").write.format("noop").mode("overwrite").save()
        t_f = time.time() - t0
        nf = doc_fingerprint(spark, f"{td}2").count()
        print(
            f"text tier at {factor}x: quality_signals {nq} rows in {t_q:.1f}s | "
            f"doc_fingerprint (winnowing) {nf} rows in {t_f:.1f}s"
        )

        # Relevance tier at scale: TF-IDF (tf/df agg + token join + per-doc
        # group-limit window) and the bigram LM (stacked model aggregate +
        # weighted score join) are shuffle-heavier than the projection tier
        # — cost should still track token volume ~linearly because every
        # exchange carries combined rows.
        from audience_finder_pro_spark.operators.relevance import (
            lm_score_docs,
            tfidf_top_terms,
        )
        from audience_finder_pro_spark.operators.sampling import quantile_bins

        t0 = time.time()
        n_tfidf = tfidf_top_terms(bigdocs, k=5).count()
        t_t = time.time() - t0
        t0 = time.time()
        lm = lm_score_docs(bigdocs, bigdocs)
        lm.write.format("noop").mode("overwrite").save()
        t_l = time.time() - t0
        t0 = time.time()
        binned = quantile_bins(
            bigdocs.select("doc_id", F.length("text").alias("s")), "s", n_bins=10
        )
        binned.write.format("noop").mode("overwrite").save()
        t_b = time.time() - t0
        print(
            f"relevance tier at {factor}x: tfidf_top_terms {n_tfidf} rows in "
            f"{t_t:.1f}s | lm_score_docs in {t_l:.1f}s | quantile_bins(10) in "
            f"{t_b:.1f}s"
        )

    # Aggregation-skew stress: 95% of rows share ONE group key, so a naive
    # groupBy lands ~95% of the volume on a single reducer task while the
    # salted two-phase form stays uniform. (AQE splits skewed JOINS, not
    # aggregations — SPARK-35725.) Results must be identical.
    from audience_finder_pro_spark.operators.skew import salted_agg

    n_skew = 2_000_000 * factor // 10
    skewed = (
        spark.range(n_skew)
        .select(
            F.when(F.col("id") % 20 != 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
            .alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
        .repartition(64)
        .persist()
    )
    skewed.count()
    t0 = time.time()
    naive = skewed.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("n"))
    n_naive = naive.count()
    t_naive = time.time() - t0
    t0 = time.time()
    salted = salted_agg(skewed, ["k"], {"s": ("v", "sum"), "n": ("*", "count")}, salt=64)
    n_salt = salted.count()
    t_salt = time.time() - t0
    assert n_naive == n_salt
    diff = naive.join(salted, "k").filter(
        (F.abs(naive.s - salted.s) > 1e-6) | (naive.n != salted.n)
    ).count()
    assert diff == 0, "salted aggregation diverged from naive groupBy"
    skewed.unpersist()
    print(
        f"skew stress: {n_skew} rows, 95% one key | naive groupBy {t_naive:.1f}s"
        f" | salted_agg(64) {t_salt:.1f}s | identical results"
    )

    # Connected-components worst case: ONE path graph of n_chain nodes
    # (diameter = n_chain-1). Plain min-label propagation needs O(diameter)
    # rounds — utterly infeasible here; pointer jumping must close it in
    # ~log2(n_chain) iterations or the operator's 100 TB story is wrong.
    from audience_finder_pro_spark.operators.graph import connected_components

    n_chain = 100_000 * factor // 50
    chain = (
        spark.range(n_chain - 1)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    t0 = time.time()
    cc = connected_components(chain, max_iter=40, driver_max_edges=0)
    n_comp = cc.select("comp").distinct().count()
    t_cc = time.time() - t0
    assert n_comp == 1, f"path graph must collapse to one component, got {n_comp}"
    print(
        f"cc chain stress: {n_chain}-node path (diameter {n_chain - 1}) -> "
        f"1 component in {t_cc:.1f}s"
    )

    # Connected-components SKEW case: a star/power-law graph — one hub in
    # 95% of edges. The propagate join's build side is uniform (labels) but
    # the probe side piles ~all edges on one key; map-side partial
    # aggregation in the groupBy(u).min must absorb it (AQE splits skewed
    # joins, and the min-agg combines locally — no single-reducer cliff).
    n_star = 1_000_000 * factor // 50
    star = (
        spark.range(n_star)
        .select(
            F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id")).alias("id_a"),
            (F.col("id") + 1).alias("id_b"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    t0 = time.time()
    cc = connected_components(star, max_iter=40, driver_max_edges=0)
    n_comp = cc.select("comp").distinct().count()
    t_cc = time.time() - t0
    print(
        f"cc star stress: {n_star} edges, hub node in 95% -> "
        f"{n_comp} components in {t_cc:.1f}s (skewed propagate key absorbed)"
    )

    # Sequence packing at scale: partition-scoped running-sum binning (the
    # global-window form would serialize on one task — the per-source
    # scope is the 100 TB shape). Invariant spot-check: every bin under
    # budget once its boundary-crossing last doc is removed.
    from audience_finder_pro_spark.operators.packing import pack_sequences

    n_pack = 2_000_000 * factor // 50
    pack_docs = spark.range(n_pack).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 200).cast("string").alias("source"),
        (7 + F.pmod(F.col("id") * 37, F.lit(60))).alias("n_tokens"),
    )
    t0 = time.time()
    packed = pack_sequences(pack_docs, budget=2048, partition_by="source")
    stats = packed.groupBy("source", "bin_id").agg(
        F.sum("n_tokens").alias("fill"), F.max("n_tokens").alias("last_max")
    )
    n_bins = stats.count()
    overflow = stats.filter(F.col("fill") - F.col("last_max") >= 2048).count()
    t_pack = time.time() - t0
    assert overflow == 0, f"{overflow} bins over budget beyond the crossing doc"
    print(
        f"packing stress: {n_pack} docs -> {n_bins} bins (budget 2048, 200 sources) "
        f"in {t_pack:.1f}s, overflow invariant holds"
    )

    # Decontamination at 50x: hashed 13-gram overlap rule against a planted
    # benchmark (every 50th doc verbatim). Hashed shingle stream (no string
    # materialization); hits = exactly the planted copies' doc population.
    from audience_finder_pro_spark.operators.decontaminate import ngram_contamination

    bench = big.filter(F.col("doc_id") % 50 == 0).select(F.col("text"))
    t0 = time.time()
    flagged = ngram_contamination(big, bench).count()
    t_dc = time.time() - t0
    print(
        f"decontaminate stress: {n} docs vs {bench.count()}-doc benchmark -> "
        f"{flagged} flagged in {t_dc:.1f}s (hashed 13-gram rule)"
    )

    # Chunking throughput: overlapping 256/32 token windows over the same
    # corpus — zero-exchange explode+slice; count forces the full stream.
    from audience_finder_pro_spark.operators.packing import chunk_documents

    chunks = chunk_documents(big, chunk_tokens=64, overlap=16)
    t0 = time.time()
    # noop sink, NOT count(): count would let Catalyst prune the chunk_text
    # join/array work and time only the index explode (bench.py gotcha)
    chunks.write.format("noop").mode("overwrite").save()
    t_ch = time.time() - t0
    n_chunks = chunks.count()
    print(f"chunking stress: {n} docs -> {n_chunks} chunks (64/16) in {t_ch:.1f}s")

    # Semantic dedup at scale: arrow assignment (single corpus shuffle) over
    # a synthetic corpus with planted exact copies. Centered rand vectors
    # keep natural cosines away from the 0.95 threshold, so the planted
    # copies are exactly the expected dup set.
    from audience_finder_pro_spark.operators.similarity import semantic_dedup

    n_emb = 200_000 * factor // 50
    base_emb = (
        spark.range(n_emb)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(64)), lambda _: (F.rand(7) - 0.5).cast("float")
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    copies = base_emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + n_emb).alias("vec_id"), "embedding"
    )
    corpus = base_emb.unionByName(copies)
    t0 = time.time()
    flags = semantic_dedup(corpus, threshold=0.95, n_clusters=256, assignment="arrow")
    agg = flags.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("is_dup") & (F.col("vec_id") >= n_emb), 1).otherwise(0)).alias(
            "copies_flagged"
        ),
    ).collect()[0]
    t_sd = time.time() - t0
    n_copies = n_emb // 10
    assert agg["n"] == n_emb + n_copies, agg
    assert agg["copies_flagged"] == n_copies, (
        f"planted copies flagged {agg['copies_flagged']}/{n_copies}"
    )
    from audience_finder_pro_spark.caching import free_checkpoint as _fc

    _fc(base_emb)
    print(
        f"semantic_dedup stress: {agg['n']} vectors (dim 64, 256 clusters, arrow assign) "
        f"in {t_sd:.1f}s, all {n_copies} planted copies flagged"
    )

    # Cosine dispatch crossover: expression fold vs Arrow-batched numpy at
    # increasing vector widths (functions/vectors.py VECTORIZE_MIN_DIM).
    from audience_finder_pro_spark.functions.vectors import _cosine_arrow, dot, l2_norm

    n_vec = 50_000 * factor // 50
    print(f"cosine crossover ({n_vec} float32 row-pairs, fold vs arrow, best-of-2):")
    for d in (64, 512, 768, 1536):
        pairs = (
            spark.range(n_vec)
            .select(
                F.transform(
                    F.sequence(F.lit(1), F.lit(d)), lambda _: F.rand(1).cast("float")
                ).alias("va"),
                F.transform(
                    F.sequence(F.lit(1), F.lit(d)), lambda _: F.rand(2).cast("float")
                ).alias("vb"),
            )
            .localCheckpoint(eager=True)
        )
        fold_expr = dot(F.col("va"), F.col("vb")) / (l2_norm(F.col("va")) * l2_norm(F.col("vb")))

        def best_of_2(expr):
            best = float("inf")
            for i in range(3):  # run 0 is warmup
                t0 = time.time()
                pairs.select(expr.alias("c")).agg(F.sum("c")).collect()
                if i > 0:
                    best = min(best, time.time() - t0)
            return best

        t_fold = best_of_2(fold_expr)
        t_arrow = best_of_2(_cosine_arrow()(F.col("va"), F.col("vb")))
        from audience_finder_pro_spark.caching import free_checkpoint

        free_checkpoint(pairs)
        print(
            f"  dim={d:5d}: fold {t_fold:6.2f}s | arrow {t_arrow:6.2f}s"
            f" | fold/arrow {t_fold / t_arrow:.2f}x"
        )

    # ---------------------------------------------------------------- r6 ops
    # Incremental ingest vs full-batch re-dedup: the selling point is that a
    # 10% daily batch costs a fraction of re-pairing the whole corpus. The
    # replicated corpus plays the deduped snapshot; a perturbed 10% slice
    # plays the crawl.
    from audience_finder_pro_spark.operators.dedup import (
        corpus_dedup,
        incremental_dedup,
        repeated_passages,
    )

    existing = big
    incoming = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(max(factor // 10, 1) - 1))).alias("rep"),
            "doc_id",
            "text",
        )
        .select(
            (F.lit(10_000_000) + F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
            F.concat("text", F.lit(" tail"), F.col("rep").cast("string")).alias("text"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    n_inc = incoming.count()
    t0 = time.time()
    inc = incremental_dedup(existing, incoming, threshold=0.9)
    verdicts = {r["status"]: r["cnt"] for r in inc.groupBy("status").agg(F.count("*").alias("cnt")).collect()}
    t_inc = time.time() - t0
    free_checkpoint(inc)
    del inc
    print(
        f"incremental_dedup: {n_inc} incoming vs {n} existing in {t_inc:.1f}s "
        f"(verdicts {verdicts}; full-batch minhash above took {t_mh:.1f}s on the snapshot alone)"
    )

    # repeated_passages at factor: the occurrence count rides the replicated
    # boilerplate (every doc repeated `factor` times with distinct tails), so
    # flagged volume is large by construction — worst-case-ish span merging.
    t0 = time.time()
    rp = repeated_passages(big, n=8, min_count=2)
    n_rp = rp.filter(F.col("n_repeated_grams") > 0).count()
    t_rp = time.time() - t0
    print(f"repeated_passages: {n_rp}/{n} docs flagged in {t_rp:.1f}s")

    # corpus_dedup end-to-end at the jaccard factor (pair volume bound)
    big_j2 = (
        docs.select(
            F.explode(F.sequence(F.lit(0), F.lit(factor_j - 1))).alias("rep"), "doc_id", "text"
        )
        .select(
            (F.col("doc_id") * factor_j + F.col("rep")).alias("doc_id"),
            F.concat("text", F.lit(" tail"), F.col("rep").cast("string")).alias("text"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    n_j = big_j2.count()
    t0 = time.time()
    cd = corpus_dedup(big_j2, threshold=0.9)
    n_keep = cd.filter("keep").count()
    t_cd = time.time() - t0
    free_checkpoint(cd)
    del cd
    print(f"corpus_dedup: {n_j} docs -> {n_keep} keepers in {t_cd:.1f}s")

    # knn_graph IVF throughput + planted-copy sanity: every vector gets one
    # exact duplicate; the duplicate must surface as its rank-1 neighbor
    # through the multi-probe path (no exact run needed at this size).
    from audience_finder_pro_spark.operators.similarity import knn_graph

    n_knn = 100_000 * factor // 50
    base_v = spark.range(n_knn // 2).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(64)), lambda _: F.rand(11).cast("double")).alias(
            "embedding"
        ),
    )
    dup_v = base_v.select((F.col("vec_id") + n_knn).alias("vec_id"), "embedding")
    vecs = base_v.unionByName(dup_v).repartition(spark.sparkContext.defaultParallelism)
    vecs = vecs.localCheckpoint(eager=True)
    t0 = time.time()
    g = knn_graph(vecs, k=5, method="ivf", n_lists=64, n_probe=4)
    found = g.filter(
        (F.col("rnk") == 1)
        & ((F.col("nbr_id") - F.col("vec_id") == n_knn) | (F.col("vec_id") - F.col("nbr_id") == n_knn))
    ).count()
    t_knn = time.time() - t0
    print(
        f"knn_graph ivf: {n_knn} vectors (dim 64, 64 lists, probe 4) in {t_knn:.1f}s; "
        f"planted duplicate is rank-1 for {found}/{n_knn} vectors"
    )

    # pagerank over a synthetic power-law-ish graph: hubs + random edges.
    # The per-iteration shape (ranks join + groupBy dst) is what scales;
    # rank mass must stay conserved (mean-1 form invariant).
    from audience_finder_pro_spark.operators.graph import pagerank

    n_nodes = 200_000 * factor // 50
    edges = (
        spark.range(n_nodes * 10)
        .select(
            (F.xxhash64(F.col("id"), F.lit(1)) % n_nodes).alias("src"),
            F.when(
                F.col("id") % 10 < 3,  # 30% of edges point at the 100 hub nodes
                F.abs(F.xxhash64(F.col("id"), F.lit(2))) % 100,
            )
            .otherwise(F.abs(F.xxhash64(F.col("id"), F.lit(3))) % n_nodes)
            .alias("dst"),
        )
        .select(F.abs(F.col("src")).alias("src"), "dst")
    )
    t0 = time.time()
    pr = pagerank(edges, n_iter=10)
    total_mass = pr.agg(F.sum("pagerank")).first()[0]
    n_ranked = pr.count()
    t_pr = time.time() - t0
    print(
        f"pagerank: {n_nodes} nodes / {n_nodes * 10} edges, 10 iterations in {t_pr:.1f}s; "
        f"{n_ranked} ranked, mass {total_mass:.0f} (conserved ≈ n)"
    )

    # quality classifier: fit+score throughput — one sufficient-stats
    # aggregate over the big frame, driver solve, literal scoring pass
    n_docs = 2_000_000 * factor // 50
    from audience_finder_pro_spark.operators.relevance import (
        classifier_features,
        fit_quality_classifier,
        score_quality_classifier,
    )

    big_docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("sample text with the and that have with words repeated "),
            (F.col("id") % 97).cast("string"),
        ).alias("text"),
        (F.col("id") % 7 == 0).cast("int").alias("y"),
    )
    t0 = time.time()
    feats = classifier_features(big_docs, label=F.col("y")).filter(F.col("n_tok") > 0)
    w = fit_quality_classifier(feats)
    score_quality_classifier(feats, w).write.format("noop").mode("overwrite").save()
    t_clf = time.time() - t0
    print(f"quality_classifier: fit+score {n_docs} docs in {t_clf:.1f}s; weights {w}")

    # c4 line cleaning: per-doc rewrite throughput (multi-line docs)
    from audience_finder_pro_spark.operators.filtering import c4_filters

    lines_docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "\n",
            F.lit("a good long sentence with enough words to survive the filter."),
            F.lit("short line."),
            F.lit("another perfectly fine sentence that keeps plenty of words around."),
            (F.col("id") % 13).cast("string"),
        ).alias("text"),
    )
    t0 = time.time()
    c4_filters(lines_docs).write.format("noop").mode("overwrite").save()
    t_c4 = time.time() - t0
    print(f"c4_filters: {n_docs} multi-line docs rewritten in {t_c4:.1f}s")

    # gumbel top-k: global TakeOrderedAndProject over the scored frame
    from audience_finder_pro_spark.operators.sampling import gumbel_topk

    scored_docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), (F.col("id") % 1000 / 100.0).alias("score")
    )
    t0 = time.time()
    picked = gumbel_topk(scored_docs, k=1000).count()
    t_g = time.time() - t0
    print(f"gumbel_topk: {picked} of {n_docs} docs selected in {t_g:.1f}s")

    # ------- r8: 50x datapoints for the newly driver-badged tier (VERDICT r7 #5)
    # validate_table: planted-violation table — every count must come back EXACT
    from audience_finder_pro_spark.operators.validate import validate_table

    vt = spark.range(n_docs).select(
        F.col("id"),
        F.when(F.col("id") % 1000 != 0, F.col("id")).alias("maybe_null"),
        (F.col("id") % 100).alias("val"),
        (F.col("id") - F.col("id") % 2).alias("dup_key"),
        (F.col("id") % 11).alias("fk"),
    )
    ref = spark.range(11).filter(F.col("id") != 10).select(F.col("id").alias("ref_id"))
    t0 = time.time()
    got = {
        r.rule: r.n_violations
        for r in validate_table(
            vt,
            [
                ("nn", "not_null", {"col": "maybe_null"}),
                ("rng", "in_range", {"col": "val", "lo": 0, "hi": 98}),
                ("uq", "unique", {"cols": ["dup_key"]}),
                ("fk", "ref_integrity", {"col": "fk", "ref": ref, "ref_col": "ref_id"}),
            ],
        ).collect()
    }
    t_val = time.time() - t0
    expect = {
        "nn": (n_docs + 999) // 1000,
        "rng": n_docs // 100,
        "uq": n_docs - (n_docs + 1) // 2,
        "fk": n_docs // 11,
    }
    assert got == expect, (got, expect)
    print(f"validate_table: 4 rules over {n_docs} rows in {t_val:.1f}s; planted counts exact")

    # funnel + cohort: planted progressive dropout — step counts must be
    # exactly [n, n/2, n/4] and monotonically non-increasing
    from audience_finder_pro_spark.operators.funnel import cohort_retention, funnel

    n_users = n_docs // 4
    base = spark.range(n_users)
    ev = (
        base.select(F.col("id").alias("user_id"), F.lit("view").alias("event_type"),
                    F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") % 1000).alias("ts"))
        .unionByName(
            base.filter(F.col("id") % 2 == 0).select(
                F.col("id").alias("user_id"), F.lit("cart").alias("event_type"),
                F.timestamp_seconds(F.lit(1_700_100_000) + F.col("id") % 1000).alias("ts"))
        )
        .unionByName(
            base.filter(F.col("id") % 4 == 0).select(
                F.col("id").alias("user_id"), F.lit("purchase").alias("event_type"),
                F.timestamp_seconds(F.lit(1_700_200_000) + F.col("id") % 1000).alias("ts"))
        )
    )
    t0 = time.time()
    steps = {r.step: r.n_users for r in funnel(ev, steps=("view", "cart", "purchase")).collect()}
    t_fun = time.time() - t0
    assert steps["view"] == n_users and steps["cart"] == (n_users + 1) // 2
    assert steps["view"] >= steps["cart"] >= steps["purchase"]
    # ceil-based to match the planted id%2==0 / id%4==0 populations exactly
    # (ADVICE r8: the floor form over-/under-counted by up to 2 for odd n)
    n_events = n_users + (n_users + 1) // 2 + (n_users + 3) // 4
    print(f"funnel: 3 steps over {n_users} users ({n_events} events) "
          f"in {t_fun:.1f}s; planted dropout exact + monotone")

    # cohort: signups spread over 4 weeks, activity over 0-2 week offsets;
    # offset-0 retention is 1.0 for every cohort by construction
    cohort_ev = (
        base.select(F.col("id").alias("user_id"), F.lit("signup").alias("event_type"),
                    F.timestamp_seconds((F.col("id") % 4) * 604800 + 1000).alias("ts"))
        .unionByName(
            base.select(F.col("id").alias("user_id"), F.lit("click").alias("event_type"),
                        F.timestamp_seconds(((F.col("id") % 4) + (F.col("id") % 3)) * 604800 + 2000).alias("ts"))
        )
    )
    t0 = time.time()
    tri = cohort_retention(cohort_ev).collect()
    t_coh = time.time() - t0
    off0 = [r for r in tri if r.week_offset == 0]
    assert len(off0) == 4 and all(r.retention == 1.0 for r in off0), off0
    assert all(r.n_active <= r.n_cohort for r in tri)
    print(f"cohort_retention: {len(tri)} triangle cells over {n_users * 2} events "
          f"in {t_coh:.1f}s; offset-0 retention exactly 1.0 x4")

    # snapshot_diff: planted add/remove/change — statuses must sum to
    # |old ∪ new| and each class must come back exact
    from audience_finder_pro_spark.operators.profile import snapshot_diff

    old = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), (F.col("id") % 9973).cast("string")).alias("text"),
    )
    new = (
        old.filter(F.col("doc_id") % 7 != 0)
        .select("doc_id",
                F.when(F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2")))
                .otherwise(F.col("text")).alias("text"))
        .unionByName(
            spark.range(n_docs // 10).select(
                # offset by n_docs, not a fixed constant: added ids can then
                # never overlap the old id range at ANY stress factor
                # (ADVICE r8: a fixed 10M offset collides from factor ~250)
                (F.col("id") + F.lit(n_docs)).alias("doc_id"),
                F.concat(F.lit("fresh "), F.col("id").cast("string")).alias("text"))
        )
    )
    t0 = time.time()
    diff = {r.status: r.n for r in snapshot_diff(old, new).groupBy("status")
            .agg(F.count("*").alias("n")).collect()}
    t_diff = time.time() - t0
    n_removed = (n_docs + 6) // 7
    n_changed = (
        sum(1 for i in range(35) if i % 7 != 0 and i % 5 == 0) * (n_docs // 35)
        + sum(1 for i in range(n_docs % 35) if i % 7 != 0 and i % 5 == 0)
    )
    assert diff["removed"] == n_removed and diff["added"] == n_docs // 10, diff
    assert diff["changed"] == n_changed, (diff, n_changed)
    assert sum(diff.values()) == n_docs + n_docs // 10
    print(f"snapshot_diff: {n_docs}-doc old vs perturbed new in {t_diff:.1f}s; "
          f"statuses {diff} sum to |old ∪ new|")

    # Spark-4 VARIANT fold (the q24/q31 leg): parse_json -> typed extraction
    # -> aggregate at volume; the sum must equal the closed form
    jdocs = spark.range(n_docs).select(
        F.concat(F.lit('{"a": '), (F.col("id") % 1000).cast("string"),
                 F.lit(', "b": {"c": "x"}}')).alias("js")
    )
    t0 = time.time()
    vsum = (
        jdocs.select(F.try_variant_get(F.parse_json(F.col("js")), "$.a", "bigint").alias("a"))
        .agg(F.sum("a").alias("s")).first().s
    )
    t_var = time.time() - t0
    expect_sum = (n_docs // 1000) * (999 * 1000 // 2) + sum(i for i in range(n_docs % 1000))
    assert vsum == expect_sum, (vsum, expect_sum)
    print(f"variant_fold: parse_json+try_variant_get over {n_docs} docs in {t_var:.1f}s; "
          f"closed-form sum exact")

    # ------- r9: 50x datapoints for the remaining r8-promoted tier (VERDICT r8 #4)
    # corpus drift: two engineered uniform slices — half the vocabulary is
    # shared (zero contribution), half of A's vocab is missing from B, and
    # B brings the same count of novel tokens, so every smoothed divergence
    # has a closed form; movers are a 10000-way |delta| tie broken on token
    import math

    from audience_finder_pro_spark.operators.profile import distribution_drift

    v = 10_000
    n_side = max(n_docs // v, 1) * v  # multiple of V -> exactly uniform counts
    tok_a = F.concat(F.lit("t"), F.format_string("%04d", (F.col("id") % v).cast("int")))
    side_a = spark.range(n_side).select(tok_a.alias("text"))
    side_b = spark.range(n_side).select(
        F.when(F.col("id") % v < v // 2, tok_a)
        .otherwise(F.concat(F.lit("x"), F.format_string("%04d", (F.col("id") % v).cast("int"))))
        .alias("text")
    )
    t0 = time.time()
    drift_rows = distribution_drift(side_a, side_b, k=10).collect()
    t_dr = time.time() - t0
    c, big_v, alpha = n_side / v, v + v // 2, 0.5
    d_norm = n_side + alpha * big_v
    p1, p0 = (c + alpha) / d_norm, alpha / d_norm  # present / smoothed-absent prob
    kl = (v // 2) * (p1 * math.log(p1 / p0) + p0 * math.log(p0 / p1))
    m1, m0 = (p1 + p0) / 2.0, (p0 + p1) / 2.0
    js = (v // 2) * (p1 * math.log(p1 / m1) + p0 * math.log(p0 / m0))  # per side; symmetric
    expect_metrics = {
        "kl_pq": kl, "kl_qp": kl, "js_divergence": js,
        "tvd": 0.5 * v * (p1 - p0), "vocab_size": float(big_v),
        "novel_mass_b": (v // 2) * p1,
    }
    got_metrics = {r.token: r.delta for r in drift_rows if r.kind == "metric"}
    for k_, exp in expect_metrics.items():
        assert abs(got_metrics[k_] - exp) <= 1e-9 * max(abs(exp), 1.0), (k_, got_metrics[k_], exp)
    movers = [r for r in drift_rows if r.kind == "mover"]
    assert [r.token for r in movers] == [f"t{i:04d}" for i in range(v // 2, v // 2 + 10)], movers
    assert all(abs(r.delta - (p1 - p0)) <= 1e-12 for r in movers)
    print(f"corpus_drift: {2 * n_side} tokens / {big_v}-token union vocab in {t_dr:.1f}s; "
          f"all 6 metrics + tie-broken movers closed-form exact")

    # mixture weights: 4 sources with planted doc/token populations — the
    # single map-side-combined aggregate must return exact counts and
    # closed-form temperature shares
    from audience_finder_pro_spark.operators.sampling import mixture_weights

    mdocs = spark.range(n_docs).select(
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
        F.expr("repeat('w ', cast(id % 4 as int) + 1)").alias("text"),
    )
    t0 = time.time()
    mw = {r.source: r for r in mixture_weights(mdocs).collect()}
    t_mw = time.time() - t0
    cnt = [n_docs // 4 + (1 if s < n_docs % 4 else 0) for s in range(4)]
    toks = [cnt[s] * (s + 1) for s in range(4)]
    tot_t, tot_pw = sum(toks), sum(t**0.7 for t in toks)
    for s in range(4):
        r = mw[f"src{s}"]
        assert (r.n_docs, r.n_tokens) == (cnt[s], toks[s]), (s, r)
        assert abs(r.raw_share - toks[s] / tot_t) <= 1e-9
        assert abs(r.weight - toks[s] ** 0.7 / tot_pw) <= 1e-9
    print(f"mixture_weights: {n_docs} docs / 4 sources in {t_mw:.1f}s; "
          f"counts exact, temperature shares closed-form exact")

    # ------- r9: BM25 retrieval (E36) — closed-form planted scores at scale.
    # Every doc has exactly L=8 tokens (avgdl == dl -> the length normalizer
    # is exactly 1); even ids carry 'needle' once, odd ids never. Query
    # 'needle' -> every even doc scores idf*(1*(k1+1))/(1+k1) = idf exactly,
    # rank ties break on doc_id ascending, so top-k = the first k even ids.
    from audience_finder_pro_spark.operators.relevance import bm25_retrieve

    bdocs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") % 2 == 0, F.lit("needle")).otherwise(F.lit("hay0")),
            F.lit(" hay1 hay2 hay3 hay4 hay5 hay6 hay7"),
        ).alias("text"),
    )
    bq = spark.createDataFrame([(0, "needle")], "query_id int, query_text string")
    t0 = time.time()
    hits = bm25_retrieve(bdocs, bq, k=25).collect()
    t_bm = time.time() - t0
    n_match = (n_docs + 1) // 2
    idf = math.log(1.0 + (n_docs - n_match + 0.5) / (n_match + 0.5))
    assert [r.doc_id for r in sorted(hits, key=lambda r: r.rnk)] == [2 * i for i in range(25)]
    assert all(abs(r.score - round(idf, 4)) <= 5e-5 for r in hits), (hits[0], idf)
    print(f"bm25_retrieve: {n_docs} docs x 8 tokens, 1 query in {t_bm:.1f}s; "
          f"top-25 ids exact, scores == closed-form idf")

    # ------- r10: BM25 hot-term guard (max_df_frac) — every doc contains the
    # stopword 'hay1', so the unguarded query 'needle hay1' mints an O(corpus)
    # candidate set; with max_df_frac=0.5 the guard drops it pre-join and the
    # top-25 equals the clean 'needle' query's ids exactly (idf-floor
    # semantics), with the guarded runtime staying at the clean query's scale.
    bq_hot = spark.createDataFrame(
        [(0, "needle hay1")], "query_id int, query_text string"
    )
    t0 = time.time()
    hits_g = bm25_retrieve(bdocs, bq_hot, k=25, max_df_frac=0.5).collect()
    t_bg = time.time() - t0
    assert [r.doc_id for r in sorted(hits_g, key=lambda r: r.rnk)] == [
        2 * i for i in range(25)
    ]
    assert all(abs(r.score - round(idf, 4)) <= 5e-5 for r in hits_g)
    print(f"bm25 max_df_frac guard: stopword query over {n_docs} docs in "
          f"{t_bg:.1f}s (clean-query leg above: {t_bm:.1f}s); "
          f"top-25 == clean query exactly")

    # ------- r10: feature-hashing embedder (E44) — closed-form planted sums.
    # Doc i's text is the token 'needle' repeated (i % 7) + 1 times plus one
    # 'hay{i%5}' marker: 'needle' always hashes to ONE fixed (component,
    # sign), so its component's |val| equals the repeat count exactly, for
    # every doc, at any partitioning — the integer-sum determinism the
    # operator claims, checked at factor-50 scale.
    from audience_finder_pro_spark.operators.embedding import hashed_embedding_long

    hdocs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.expr("repeat('needle ', CAST(id % 7 AS INT) + 1)"),
            F.concat(F.lit("hay"), (F.col("id") % 5).cast("string")),
        ).alias("text"),
    )
    t0 = time.time()
    emb_long = hashed_embedding_long(hdocs, dim=64)
    import hashlib as _hl
    hx = _hl.md5(b"needle").hexdigest()
    hexv = "0123456789abcdef".index
    needle_comp = (hexv(hx[0]) * 256 + hexv(hx[1]) * 16 + hexv(hx[2])) % 64
    needle_sign = 1 if hexv(hx[3]) % 2 == 0 else -1
    got = {
        r.doc_id: r.val
        for r in emb_long.filter(F.col("component") == needle_comp).collect()
        # hay tokens may collide into needle's component for some i%5 — only
        # check docs whose hay token provably lands elsewhere
    }
    t_he = time.time() - t0
    hay_comps = {}
    for s in range(5):
        hh = _hl.md5(f"hay{s}".encode()).hexdigest()
        hay_comps[s] = (hexv(hh[0]) * 256 + hexv(hh[1]) * 16 + hexv(hh[2])) % 64
    checked = 0
    for i in range(0, n_docs, max(1, n_docs // 1000)):
        if hay_comps[i % 5] != needle_comp:
            assert got[i] == needle_sign * ((i % 7) + 1), (i, got.get(i))
            checked += 1
    print(f"hashed_embedding: {n_docs} docs in {t_he:.1f}s; "
          f"{checked} sampled docs match the closed-form signed count")




    # ------- r9: k-anonymity audit (E39) — engineered class populations.
    # n_docs rows spread over 1000 equal residue classes (quasi1 = id%1000)
    # plus 37 planted singletons in a disjoint quasi range; sensitive =
    # (id//1000)%5 cycles all 5 values inside every residue class. Every
    # class size, risky flag and l-diversity count has a closed form.
    from audience_finder_pro_spark.operators.privacy import k_anonymity_audit

    n_even = n_docs - n_docs % 1000  # multiple of 1000 -> exactly equal classes
    pdf = (
        spark.range(n_even).select(
            (F.col("id") % 1000).alias("quasi"),
            ((F.col("id") / 1000).cast("long") % 5).alias("sensitive"),
        )
        .unionByName(
            spark.range(37).select(
                (F.col("id") + 10_000).alias("quasi"), F.lit(0).alias("sensitive")
            )
        )
    )
    t0 = time.time()
    pa = k_anonymity_audit(pdf, ["quasi"], k=5, sensitive_col="sensitive", l=5)
    pagg = pa.agg(
        F.count("*").alias("classes"),
        F.sum("risky").alias("risky"),
        F.sum("diverse").alias("diverse"),
        F.sum(F.when(F.col("class_size") == n_even // 1000, 1).otherwise(0)).alias("even"),
        F.sum("class_size").alias("rows_total"),
    ).first()
    t_pa = time.time() - t0
    assert pagg.classes == 1037 and pagg.risky == 37 and pagg.diverse == 1000, pagg
    assert pagg.even == 1000 and pagg.rows_total == n_even + 37, pagg
    print(f"k_anonymity_audit: {n_even + 37} rows / 1037 classes in {t_pa:.1f}s; "
          f"sizes, risky and l-diversity counts closed-form exact")

    # ------- r9: rolling anomaly scan (E40) — planted spike per key.
    # Every key gets the same 10-day series: alternating 2/3 counts for
    # 9 days then a 30-event spike; the spike's z has ONE closed-form
    # value (same integer-sum formula), mid-series |z| ~ 1 stays
    # unflagged, so anomalies == n_keys exactly and the distinct
    # (day, z) surface is tiny and fully checkable.
    from audience_finder_pro_spark.operators.timeseries import rolling_anomaly

    counts = [2, 3, 2, 3, 2, 3, 2, 3, 2, 30]
    offsets = [d for d, c in enumerate(counts) for _ in range(c)]  # 52 per key
    per_key = len(offsets)
    n_keys = max(n_docs // per_key, 1)
    day_arr = F.array(*[F.lit(d) for d in offsets])
    aev = spark.range(n_keys * per_key).select(
        F.concat(F.lit("k"), (F.col("id") / per_key).cast("long").cast("string")).alias(
            "event_type"
        ),
        F.timestamp_seconds(
            F.element_at(day_arr, (F.col("id") % per_key + 1).cast("int")) * 86400
            + F.col("id") % per_key
        ).alias("ts"),
    )
    t0 = time.time()
    an = rolling_anomaly(aev, step_seconds=86400, window=7, z_thresh=3.0)
    aagg = an.agg(
        F.count("*").alias("n"),
        F.sum("is_anomaly").alias("flagged"),
        F.sum(F.when(F.col("z").isNull(), 1).otherwise(0)).alias("nulls"),
    ).first()
    t_an = time.time() - t0
    base = counts[2:9]
    s, sq, c = float(sum(base)), float(sum(b * b for b in base)), float(len(base))
    z_spike = (30.0 - s / c) / (((sq - s * s / c) / (c - 1.0)) ** 0.5)
    spike_rows = an.filter(F.col("is_anomaly") == 1).select("z").distinct().collect()
    assert aagg.n == n_keys * 10 and aagg.flagged == n_keys, aagg
    assert aagg.nulls == 2 * n_keys, aagg  # first two buckets per key: c < 2
    assert [r.z for r in spike_rows] == [round(z_spike, 4) + 0.0], spike_rows
    print(f"rolling_anomaly: {n_keys * per_key} events / {n_keys} keys x 10 days "
          f"in {t_an:.1f}s; spike z closed-form exact, anomalies == n_keys")



    # ------- r9: incremental rollup merge (E41) — merge-vs-direct at volume.
    # n_docs events over 5 keys with quarter-valued measures (0.25 steps are
    # exact in double AND decimal, so the Python closed form is exact too);
    # the 7-way interleaved split merged through merge_rollup_states must
    # equal the direct single-pass state row-for-row, and the global total
    # must hit the arithmetic-series closed form.
    from audience_finder_pro_spark.operators.incremental import (
        merge_rollup_states,
        rollup_state,
    )

    iev = spark.range(n_docs).select(
        (F.col("id") % 5).alias("key"),
        ((F.col("id") % 997).cast("double") * 0.25).alias("value"),
        F.col("id"),
    )
    t0 = time.time()
    direct = rollup_state(iev.drop("id"), ["key"], "value")
    merged = merge_rollup_states(
        [rollup_state(iev.filter(F.col("id") % 7 == i).drop("id"), ["key"], "value")
         for i in range(7)]
    )
    diff_rows = merged.exceptAll(direct).count() + direct.exceptAll(merged).count()
    tot = merged.agg(F.sum("n").alias("n"), F.sum("sum_value").alias("s")).first()
    t_inc = time.time() - t0
    cyc, rem = divmod(n_docs, 997)
    expect_total = 0.25 * (cyc * (996 * 997 // 2) + rem * (rem - 1) // 2)
    assert diff_rows == 0, diff_rows
    assert tot.n == n_docs and float(tot.s) == expect_total, (tot, expect_total)
    print(f"incremental_rollup: {n_docs} events, 7-way merge vs direct in "
          f"{t_inc:.1f}s; states identical, closed-form total exact")


    # ------- r9: hybrid RRF fusion (E37) — engineered dual-leg ranked lists.
    # For query q, the sparse leg ranks docs q*100+o at rank o (o=1..20) and
    # the dense leg ranks docs q*100+o at rank o-10 (o=11..30). Docs with
    # BOTH legs (o=11..20) each beat every single-leg doc — score(o) =
    # 1/(60+o) + 1/(50+o) > 1/61 >= any single contribution — so the fused
    # top-10 per query is EXACTLY o=11..20 in order, with a rank-determined
    # closed-form score. Input volume scales with n_queries (the combiner's
    # scale axis: its input is per-query bounded, never corpus-sized).
    from audience_finder_pro_spark.operators.relevance import rrf_fuse

    n_q = 200_000 * factor // 50
    base20 = spark.range(n_q * 20).select(
        (F.col("id") / 20).cast("long").alias("query_id"),
        (F.col("id") % 20 + 1).cast("int").alias("r"),
    )
    sparse_leg = base20.select(
        "query_id", (F.col("query_id") * 100 + F.col("r")).alias("doc_id"),
        F.col("r").alias("rnk"),
    )
    dense_leg = base20.select(
        "query_id", (F.col("query_id") * 100 + F.col("r") + 10).alias("doc_id"),
        F.col("r").alias("rnk"),
    )
    t0 = time.time()
    fused = rrf_fuse([("sparse", sparse_leg), ("dense", dense_leg)], k=10)
    agg = fused.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("doc_id") % 100 == F.col("rnk") + 10, 1).otherwise(0)).alias("ok_doc"),
        F.sum(F.when(F.col("n_legs") == 2, 1).otherwise(0)).alias("dual"),
        F.count_distinct(F.struct("rnk", "rrf_score")).alias("rank_scores"),
    ).first()
    t_rrf = time.time() - t0
    assert agg.n == n_q * 10 and agg.ok_doc == agg.n and agg.dual == agg.n, agg
    assert agg.rank_scores == 10, agg  # score is a pure function of rank
    top = fused.filter((F.col("query_id") == n_q - 1) & (F.col("rnk") == 1)).first()
    assert top.rrf_score == round(1 / 71 + 1 / 61, 6), top
    print(f"rrf_fuse: {n_q} queries x 2 legs x 20 in {t_rrf:.1f}s; "
          f"fused top-10 closed-form exact (o=11..20 per query)")

    # ------- r9: fuzzy record linkage (E38) — hand-computed per-block
    # template distances. Each of n_blocks prefix-7 blocks holds exactly
    # 2 left + 2 right records: left <base>kitten / <base>sitten, right
    # <base>kitte (planted partner) / <base>zzzzzzz (over budget: the DP
    # early-exits at distance 7). Every left record must link to the
    # block's kitte row — evens at dist 1 (one deletion), odds at dist 2
    # (substitute + delete) — and blocking confines comparisons to 4
    # pairs per block (linear total volume, never the cross join).
    from audience_finder_pro_spark.operators.linkage import fuzzy_link

    n_blocks = 1_000_000 * factor // 50
    off = 100_000_000
    lnames = spark.range(2 * n_blocks).select(
        F.col("id").alias("left_id"),
        F.concat(
            F.format_string("%07d", (F.col("id") / 2).cast("long")),
            F.when(F.col("id") % 2 == 0, F.lit("kitten")).otherwise(F.lit("sitten")),
        ).alias("left_name"),
    )
    rnames = spark.range(2 * n_blocks).select(
        (F.col("id") + off).alias("right_id"),
        F.concat(
            F.format_string("%07d", (F.col("id") / 2).cast("long")),
            F.when(F.col("id") % 2 == 0, F.lit("kitte")).otherwise(F.lit("zzzzzzz")),
        ).alias("right_name"),
    )
    t0 = time.time()
    link_agg = (
        fuzzy_link(lnames, rnames, max_dist=2, prefix_len=7, suffix_len=0)
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    (F.col("right_id") == F.col("left_id") - F.col("left_id") % 2 + off)
                    & (F.col("dist") == 1 + F.col("left_id") % 2),
                    1,
                ).otherwise(0)
            ).alias("ok"),
        )
        .first()
    )
    t_link = time.time() - t0
    assert link_agg.n == 2 * n_blocks and link_agg.ok == link_agg.n, link_agg
    print(f"fuzzy_link: {2 * n_blocks} left x {2 * n_blocks} right over {n_blocks} "
          f"blocks in {t_link:.1f}s; every planted partner + template distance exact")

    # ------- r10: theta audience overlap (E48) — the SAMPLED regime the
    # exact-mode oracle gate can't reach: three groups far above nominal
    # (a=[0,2M), b=[1M,3M), c=[0,200k)) with closed-form intersections.
    # lg_k=14 (NOT 12): intersection error scales with union/intersection —
    # measured at this shape: lg_k=12 read a-c 6.8% off, lg_k=14 reads every
    # pair within 1.2% of min(|A|,|B|). Bounds: cardinalities within 2%,
    # intersections within 3% of the smaller set, Jaccard within 0.02.
    from audience_finder_pro_spark.operators.incremental import audience_overlap

    n_ids = 40_000 * factor  # 2M at factor 50
    grp = (
        spark.range(n_ids).select(F.lit("a").alias("g"), F.col("id").alias("v"))
        .unionByName(
            spark.range(n_ids // 2, n_ids // 2 + n_ids).select(
                F.lit("b").alias("g"), F.col("id").alias("v"))
        )
        .unionByName(
            spark.range(n_ids // 10).select(F.lit("c").alias("g"),
                                            F.col("id").alias("v"))
        )
        .repartition(spark.sparkContext.defaultParallelism * 2)
    )
    t0 = time.time()
    ov = {
        (r.group_a, r.group_b): r
        for r in audience_overlap(grp, "g", "v", lg_k=14).collect()
    }
    t_ov = time.time() - t0
    true = {
        ("a", "b"): (n_ids, n_ids, n_ids // 2),
        ("a", "c"): (n_ids, n_ids // 10, n_ids // 10),
        ("b", "c"): (n_ids, n_ids // 10, 0),
    }
    for pair, (ta, tb, ti) in true.items():
        r = ov[pair]
        assert abs(r.n_a - ta) / ta < 0.02, (pair, r.n_a, ta)
        assert abs(r.n_b - tb) / tb < 0.02, (pair, r.n_b, tb)
        tol = 0.03 * min(ta, tb)  # intersection err scales with the smaller set
        assert abs(r.n_overlap - ti) <= tol, (pair, r.n_overlap, ti)
        tj = ti / (ta + tb - ti)
        assert abs(r.jaccard - tj) < 0.02, (pair, r.jaccard, tj)
    print(f"audience_overlap: 3 groups over {n_ids + n_ids + n_ids // 10:,} ids "
          f"in {t_ov:.1f}s; sampled-regime estimates within 2% of closed form")

    # ------- r10: exact group quantiles (E50) — the engineered hot key:
    # 95% of rows (38 of 40 id residues) land on ONE key, the shape that
    # parks a sort-based median on a single task. v=(id//40)%100+1 is
    # INDEPENDENT of the id%40 key residue and n is a multiple of 4000,
    # so every key sees exactly uniform counts over 1..100 and
    # quantile_disc(q) = 100q in closed form; the distinct-value frame
    # the operator shuffles is 100 rows per key regardless of volume.
    from audience_finder_pro_spark.operators.skew import exact_group_quantiles

    n_rows = 40_000 * factor  # 2M at factor 50; multiple of 4000 by construction
    qdf = (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") % 40 < 38, F.lit("hot"))
            .otherwise(F.concat(F.lit("cold"), (F.col("id") % 40 - 38).cast("string")))
            .alias("k"),
            ((F.col("id") / 40).cast("long") % 100 + 1).cast("int").alias("v"),
        )
        .repartition(spark.sparkContext.defaultParallelism * 2)
    )
    t0 = time.time()
    qs_got = {
        (r.k, r.q): r.quantile
        for r in exact_group_quantiles(qdf, ["k"], "v", [0.25, 0.5, 0.75]).collect()
    }
    t_q = time.time() - t0
    for k in ("hot", "cold0", "cold1"):
        for q in (0.25, 0.5, 0.75):
            assert qs_got[(k, q)] == int(100 * q), (k, q, qs_got[(k, q)])
    print(f"exact_quantiles: {n_rows:,} rows, 95% on one hot key, in {t_q:.1f}s; "
          f"all 9 quantiles closed-form exact")

    # ------- r10: label propagation (E52) — 3M planted edges (factor-50):
    # disjoint 4-cliques, whose synchronous-LP fixed point is the clique
    # min by sweep 2 (hand-walk in tests/test_llm_ops.py), so every one
    # of the 2M labels is closed-form checkable after 3 sweeps.
    from audience_finder_pro_spark.operators.graph import label_propagation

    n_cliques = 10_000 * factor  # 500k cliques / 2M nodes / 3M edges at 50
    pair_offsets = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    lp_edges = (
        spark.range(n_cliques)
        .select(
            F.explode(
                F.array(*[F.struct(F.lit(i).alias("i"), F.lit(j).alias("j"))
                          for i, j in pair_offsets])
            ).alias("p"),
            F.col("id"),
        )
        .select(
            (F.col("id") * 4 + F.col("p.i")).alias("src"),
            (F.col("id") * 4 + F.col("p.j")).alias("dst"),
        )
        .repartition(spark.sparkContext.defaultParallelism * 2)
    )
    t0 = time.time()
    bad = (
        label_propagation(lp_edges, n_iter=3)
        .filter(F.col("community") != (F.col("node") - F.col("node") % 4))
        .count()
    )
    t_lp = time.time() - t0
    assert bad == 0, f"{bad} nodes off the closed-form clique-min label"
    print(f"label_propagation: {n_cliques * 6:,} edges / {n_cliques * 4:,} nodes, "
          f"3 sweeps in {t_lp:.1f}s; every label == clique min (closed form)")

    # ------- r11: Misra-Gries heavy hitters (E59) — the SAMPLED regime at
    # scale: 200k*factor rows where item 0 takes 40%, item 1 takes 20%,
    # and the tail is ~0.4*n DISTINCT items (so capacity 1,000 is
    # overwhelmed ~4000x). Closed-form truths: n0 = 0.4n, n1 = 0.2n; the
    # mergeable-summaries contract demands n_lower <= true <= n_upper for
    # both heads AND rank order preserved, with base <= n/(capacity+1)
    # summed over the 4 slices.
    from audience_finder_pro_spark.operators.incremental import (
        merge_topk_states,
        topk_from_state,
        topk_state,
    )

    n_hh = 200_000 * factor
    hh = (
        spark.range(n_hh)
        .select(
            F.lit("k").alias("g"),
            F.when(F.col("id") % 10 < 4, F.lit(0))
            .when(F.col("id") % 10 < 6, F.lit(1))
            .otherwise(F.col("id"))
            .alias("item"),
            F.col("id"),
        )
        .repartition(spark.sparkContext.defaultParallelism * 2)
    )
    t0 = time.time()
    hh_states = [
        topk_state(hh.filter(F.col("id") % 4 == i).drop("id"), ["g"], "item",
                   capacity=1_000)
        for i in range(4)
    ]
    hh_top = {
        r.item: (r.rank, r.n_lower, r.n_upper)
        for r in topk_from_state(
            merge_topk_states(hh_states, capacity=1_000), k=2
        ).collect()
    }
    t_hh = time.time() - t0
    true0, true1 = n_hh * 4 // 10, n_hh * 2 // 10
    assert hh_top[0][0] == 1 and hh_top[1][0] == 2, hh_top
    assert hh_top[0][1] <= true0 <= hh_top[0][2], (hh_top[0], true0)
    assert hh_top[1][1] <= true1 <= hh_top[1][2], (hh_top[1], true1)
    err0 = (true0 - hh_top[0][1]) / true0
    print(f"topk_state: {n_hh:,} rows, ~{int(n_hh*0.4):,} distinct items vs "
          f"capacity 1,000 (4 slices merged) in {t_hh:.1f}s; heads ranked "
          f"correctly, bounds contain truth, head-0 undercount {err0:.1%}")

    # ------- r11: salted skew join (E60) — 95% of 200k*factor rows on ONE
    # key against a 1,000-row dimension; result row count must equal the
    # plain join's exactly (salting is a physical rewrite, never semantic).
    from audience_finder_pro_spark.operators.skew import salted_join

    big_j = (
        spark.range(n_hh)
        .select(
            F.when(F.col("id") % 20 != 0, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("rid"),
        )
        .repartition(spark.sparkContext.defaultParallelism * 2)
    )
    dim_j = spark.range(1000).select(
        F.col("id").alias("k"), F.concat(F.lit("seg"), F.col("id")).alias("seg")
    )
    t0 = time.time()
    n_salted = salted_join(big_j, dim_j, on="k", salt=32).count()
    t_sj = time.time() - t0
    t0 = time.time()
    n_plain = big_j.join(dim_j, "k").count()
    t_pj = time.time() - t0
    assert n_salted == n_plain, (n_salted, n_plain)
    print(f"salted_join: {n_hh:,} rows, 95% on one key, x1,000-row dim: "
          f"salted {t_sj:.1f}s vs plain {t_pj:.1f}s (AQE on), counts equal "
          f"({n_salted:,})")

    # ------- r11: the three new exact monoids (E63 decayed / E64 trend /
    # E65 experiment) at factor scale: 100k*factor events, 4 hash slices
    # merged must equal the one-pass state BIT-FOR-BIT (decimal/integer
    # sums — the E41 guarantee; this is the property float decay/variance
    # would lose at exactly this row count).
    from audience_finder_pro_spark.operators.experiment import (
        experiment_stats,
        merge_experiment_stats,
    )
    from audience_finder_pro_spark.operators.incremental import (
        decayed_state,
        merge_decayed_states,
        merge_trend_states,
        trend_state,
    )

    n_ev = 100_000 * factor
    ev_big = (
        spark.range(n_ev)
        .select(
            F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias("event_type"),
            (F.col("id") % 997 / F.lit(2.0)).alias("value"),
            F.timestamp_seconds(
                F.lit(1704067200) + (F.col("id") % (30 * 86400))
            ).alias("ts"),
            F.when(F.col("id") % 2 == 0, "A").otherwise("B").alias("variant"),
            F.col("id"),
        )
        .repartition(spark.sparkContext.defaultParallelism * 2)
    )
    slicer = lambda i: ev_big.filter(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(4)) == i).drop("id")
    one_pass = ev_big.drop("id")
    t0 = time.time()
    checks = [
        (
            "decayed_state",
            sorted(map(tuple, merge_decayed_states(
                [decayed_state(slicer(i), ["event_type"], "value", "ts",
                               ref_date="2024-02-01") for i in range(4)]
            ).collect())),
            sorted(map(tuple, decayed_state(one_pass, ["event_type"], "value",
                                            "ts", ref_date="2024-02-01").collect())),
        ),
        (
            "trend_state",
            sorted(map(tuple, merge_trend_states(
                [trend_state(slicer(i), ["event_type"], "ts", "value",
                             origin_date="2024-01-01") for i in range(4)]
            ).collect())),
            sorted(map(tuple, trend_state(one_pass, ["event_type"], "ts",
                                          "value", origin_date="2024-01-01").collect())),
        ),
        (
            "experiment_stats",
            sorted(map(tuple, merge_experiment_stats(
                [experiment_stats(slicer(i), ["event_type"], "variant", "value")
                 for i in range(4)]
            ).collect())),
            sorted(map(tuple, experiment_stats(one_pass, ["event_type"],
                                               "variant", "value").collect())),
        ),
    ]
    t_mono = time.time() - t0
    for name, merged_rows, one_rows in checks:
        assert merged_rows == one_rows, name
    print(f"exact monoids (E63/E64/E65): {n_ev:,} rows, 4-slice merge == "
          f"one-pass BIT-FOR-BIT for all three states, {t_mono:.1f}s total")


if __name__ == "__main__":
    main()
