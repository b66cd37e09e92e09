"""Corpus-statistics relevance scoring: TF-IDF keyword extraction and
bigram language-model (perplexity-style) document quality scoring.

Both are staple large-corpus curation steps the reference's keyword
matcher (app.py:93-149 substring scan) only gestures at: TF-IDF ranks
WHICH terms characterize a document against the whole corpus instead of
matching a fixed list, and the bigram LM score is the classic
CCNet/KenLM-style "does this read like natural language" filter used to
bucket web text by fluency before training.

Scale shapes (both pure DataFrame, zero Python UDFs):

- TF-IDF: explode → (doc, token) count with map-side combine → token
  document-frequency aggregate (input already one row per (doc, token),
  so the DF agg combines partials too) → shuffle hash join back on
  ``token`` (the model side is vocabulary-sized — sublinear in corpus
  bytes but far too big to assume broadcastable at 100 TB; AQE may still
  choose broadcast when it measures small) → per-doc top-k window.
  The window partitions on ``doc_id`` — billions of distinct keys, so no
  skew concentration (unlike the n_queries-key ANN window this repo
  already pre-prunes); Spark's WindowGroupLimit pushes the rank filter
  into a partial group-limit before the exchange.
- Corpus total-doc-count N enters as a broadcast nested-loop join of a
  ONE-ROW aggregate (no driver action, no collect; the scan of the doc
  table it costs is the same scan TF needs and AQE reuses nothing across
  the two, but at scale this is a count-only column-pruned pass).
- Bigram LM: one zip-sliced ``gram_stream`` (no window/sort — NOTES r6)
  over the TRAIN corpus builds unigram/bigram count models; the SCORE
  corpus's bigram stream left-joins both models on token keys (shuffle
  hash joins — the bigram model is the big side's same order of
  magnitude, never broadcast) and averages add-one-smoothed
  log-probabilities per document.

Determinism: token counts are integers, log-prob inputs are therefore
identical across partitionings; per-doc float means average ~50 terms
(fixture) — far below the 200k-row drift regime that forced q27 to
DECIMAL (NOTES gotcha), so round(4) is stable.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from audience_finder_pro_spark.functions.text import gram_stream, tokens


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by smoothed TF-IDF.

    score = tf * (ln((N + 1) / (df + 1)) + 1)  — the smoothed-IDF form
    (scikit-learn's default) so unseen/ubiquitous terms stay finite and
    positive. Ties break on token ascending for a deterministic cutoff.

    Returns (id_col, token, score, rnk) with rnk in 1..k.
    """
    tok = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    tf = tok.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))  # 1 row → broadcast NLJ below
    idf = dfreq.crossJoin(F.broadcast(n)).select(
        "token",
        (F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)).alias(
            "idf"
        ),
    )
    scored = tf.join(idf, "token").select(
        id_col, "token", (F.col("tf") * F.col("idf")).alias("score")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "token", "score", "rnk")
    )


def lm_score_docs(
    train: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean bigram log-probability under an add-one-smoothed
    bigram model counted from ``train``.

    logp(w2 | w1) = ln((c(w1,w2) + 1) / (c(w1) + V)), V = |train vocab|.
    Documents with < 2 tokens have no bigrams and drop out (same rule in
    the SQL oracle). Higher (less negative) = more fluent under the
    model; the canonical use is train=curated corpus, score=web crawl,
    keep the top fluency bucket. Returns (id_col, n_bigrams, lm_logprob).
    """
    # ONE evaluation of the train stream: per-(doc, t0, t1) position counts
    # (t1-null doc-tail rows kept — they carry the final token's unigram
    # occurrence). Both model tables then come out of ONE stacked aggregate
    # over m_train — ('uni', t0, null) + ('bi', t0, t1) rows grouped by
    # (kind, k1, k2) — instead of two separate groupBys (A/B at sf0.1:
    # 1.6s vs 1.9-2.2s; one exchange saved, and m_train's shuffle is
    # shared by the model branch and — when score IS train, the common
    # self-scoring case — the score side via ReusedExchange). m_train is
    # never larger than the raw stream (it's the distinct-bigram remnant),
    # so every downstream exchange carries combined rows, which is also
    # why the score side joins m (weighted by n) rather than raw
    # positions: at scale the join exchange then moves distinct per-doc
    # bigrams, not the token stream.
    m_train = (
        gram_stream(train, id_col, text_col, n=2)
        .groupBy(id_col, "t0", "t1")
        .agg(F.count("*").alias("n"))
    )
    vocab = (
        m_train.select("t0").distinct().agg(F.count("*").alias("v"))
    )  # 1 row → broadcast NLJ (distinct t0 = the train vocabulary)

    if score is train:
        # Self-scoring fast path (r13 opt; the common declared shape):
        # the scored rows ARE the model's distinct-bigram rows, so the
        # model counts ride them as window aggregates over their natural
        # partitionings — c1 = Σn over t0 (computed BEFORE the doc-tail
        # filter, so final-token unigram occurrences still count), c2 =
        # Σn over (t0, t1) — instead of two model joins whose branches
        # re-ran the stacked aggregate. Same integers, same logp.
        m_score = (
            m_train.withColumn(
                "c1", F.sum("n").over(Window.partitionBy("t0"))
            )
            .filter(F.col("t1").isNotNull())
            .withColumn(
                "c2", F.sum("n").over(Window.partitionBy("t0", "t1"))
            )
        )
    else:
        model = (
            m_train.select(
                F.expr(
                    "stack(2, 'uni', t0, cast(null as string), 'bi', t0, t1)"
                    " as (kind, k1, k2)"
                ),
                "n",
            )
            .filter(~((F.col("kind") == "bi") & F.col("k2").isNull()))
            .groupBy("kind", "k1", "k2")
            .agg(F.sum("n").alias("c"))
        )
        bim = model.filter(F.col("kind") == "bi").select(
            F.col("k1").alias("w1"), F.col("k2").alias("w2"), F.col("c").alias("c2")
        )
        uni = model.filter(F.col("kind") == "uni").select(
            F.col("k1").alias("w1"), F.col("c").alias("c1")
        )
        raw = (
            gram_stream(score, id_col, text_col, n=2)
            .filter(F.col("t1").isNotNull())
            .groupBy(id_col, "t0", "t1")
            .agg(F.count("*").alias("n"))
        )
        m_score = (
            raw.join(
                bim,
                (raw.t0 == bim.w1) & (raw.t1 == bim.w2),
                "left",
            )
            .drop("w1", "w2")
            .join(uni, raw.t0 == uni.w1, "left")
        )
    logp = (
        m_score.crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            "n",
            # ANSI guard: an EMPTY train corpus gives V=0 and c1 NULL → the
            # Laplace denominator is 0 for every scored bigram; NULL logp
            # (→ NULL lm_logprob) on that degenerate input, not DIVIDE_BY_ZERO
            F.when(
                F.coalesce(F.col("c1"), F.lit(0)) + F.col("v") > 0,
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1.0))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
                ),
            ).alias("logp"),
        )
    )
    return logp.groupBy(id_col).agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        (F.sum(F.col("n") * F.col("logp")) / F.sum("n")).alias("lm_logprob"),
    )


def importance_score(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR-style importance score: per-document mean token
    log-likelihood ratio between a TARGET corpus's and the RAW corpus's
    add-``alpha``-smoothed unigram models (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling" — the
    hashed-n-gram variant degenerates to this with exact token features).

    score(d) = mean over tokens w of
        ln((c_tgt(w)+a)/(N_tgt+aV)) - ln((c_raw(w)+a)/(N_raw+aV))

    with V = |union vocab|. High score = "looks like the target
    distribution"; the canonical use is target=curated corpus, raw=web
    crawl, keep the top-score tail (or gumbel-resample on it). Returns
    (id_col, n_tokens, dsir_logratio) for every ``raw`` document with at
    least one token.

    Scale shape (zero Python UDFs, two wide exchanges + one join):

    - BOTH unigram models come out of ONE tagged-union aggregate: the
      target stream is tagged ``is_tgt=1``, the raw stream ``0``, and a
      single (token) groupBy with conditional sums yields (token, c_tgt,
      c_raw) — one map-side-combined exchange instead of two, and each
      corpus's tokenizer subtree evaluates once (the lm_score_docs
      stacked-aggregate lesson).
    - Totals (N_tgt, N_raw, V) are a ONE-ROW aggregate of the model
      table, entering via broadcast nested-loop crossJoin — no driver
      action.
    - The scored side re-aggregates raw to per-(doc, token) counts so
      the model join moves DISTINCT per-doc tokens (combined rows on the
      wire), never the raw token stream; the join is a shuffle hash join
      on ``token`` (vocabulary-sized model side — sublinear in corpus
      bytes but not assumed broadcastable at 100 TB; AQE may still pick
      broadcast when it measures small).
    - The per-doc mean is weighted by the per-(doc, token) count n, so
      it equals the positional mean while keeping combined rows on every
      exchange.

    Determinism: all model inputs are integer counts; the per-doc float
    mean averages ~doc-length terms of ~1e0 magnitude — far below the
    drift regime that forced q27 to DECIMAL (NOTES gotcha), so round(4)
    is stable across partitionings.
    """
    tgt_tok = target.select(F.explode(tokens(text_col)).alias("token"), F.lit(1).alias("is_tgt"))
    raw_tok = raw.select(F.explode(tokens(text_col)).alias("token"), F.lit(0).alias("is_tgt"))
    model = (
        tgt_tok.unionByName(raw_tok)
        .groupBy("token")
        .agg(
            F.sum("is_tgt").alias("c_tgt"),
            F.sum(F.lit(1) - F.col("is_tgt")).alias("c_raw"),
        )
    )
    totals = model.agg(
        F.sum("c_tgt").alias("n_tgt"),
        F.sum("c_raw").alias("n_raw"),
        F.count("*").alias("v"),
    )  # 1 row → broadcast NLJ
    a = F.lit(float(alpha))
    per_doc = (
        raw.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("n"))
    )
    scored = (
        per_doc.join(model, "token", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            "n",
            (
                F.log((F.coalesce(F.col("c_tgt"), F.lit(0)) + a) / (F.col("n_tgt") + a * F.col("v")))
                - F.log(
                    (F.coalesce(F.col("c_raw"), F.lit(0)) + a) / (F.col("n_raw") + a * F.col("v"))
                )
            ).alias("logratio"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("n").cast("long").alias("n_tokens"),
        (F.sum(F.col("n") * F.col("logratio")) / F.sum("n")).alias("dsir_logratio"),
    )


# --------------------------------------------------------------------------
# E29: trainable quality classifier (source-discriminator, closed form)
# --------------------------------------------------------------------------

CLASSIFIER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def classifier_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label=None,
) -> DataFrame:
    """Cheap per-doc feature projection for the quality classifier:
    (id, n_tok, f_len, f_wordlen, f_stop, f_ttr [, y]).

    - ``f_len``      log(1 + token count) — length prior
    - ``f_wordlen``  mean token length (chars of all tokens / n_tok)
    - ``f_stop``     distinct Gopher stop words present / 8 — function-
                     word presence, the classic fasttext-era signal
    - ``f_ttr``      type-token ratio (distinct / total) — repetition

    All pure codegen (token chars via ``length(concat_ws('', tok))`` —
    a builtin, not a per-element fold), zero exchanges, SQL-replayable
    in DuckDB. Zero-token docs get NULL ratio features; callers filter
    ``n_tok > 0`` before fitting. ``label`` (optional Column over the
    input) is passed through as ``y`` for supervised fitting.
    """
    tok = tokens(F.col(text_col))
    staged = docs.select(
        F.col(id_col),
        *([] if label is None else [label.alias("y")]),
        tok.alias("_tok"),
    )
    n_tok = F.size(F.col("_tok"))
    out = staged.select(
        id_col,
        *([] if label is None else ["y"]),
        n_tok.cast("long").alias("n_tok"),
        F.log(F.lit(1.0) + n_tok).alias("f_len"),
        F.when(n_tok > 0, F.length(F.concat_ws("", F.col("_tok"))) / n_tok).alias("f_wordlen"),
        (
            F.size(
                F.array_intersect(
                    F.col("_tok"), F.array(*[F.lit(w) for w in CLASSIFIER_STOP_WORDS])
                )
            )
            / F.lit(float(len(CLASSIFIER_STOP_WORDS)))
        ).alias("f_stop"),
        F.when(n_tok > 0, F.size(F.array_distinct(F.col("_tok"))) / n_tok).alias("f_ttr"),
    )
    return out


FEATURE_COLS = ("f_len", "f_wordlen", "f_stop", "f_ttr")


def fit_quality_classifier(
    feats: DataFrame,
    label_col: str = "y",
    feature_cols: tuple[str, ...] = FEATURE_COLS,
    reg: float = 1.0,
) -> dict[str, float]:
    """Closed-form ridge fit of a linear source-discriminator — the
    GPT-3/PaLM "quality classifier" pattern (Brown et al. 2020 App. A:
    score web docs by a classifier trained to tell a curated corpus from
    the crawl) without any iterative training: ridge regression on 0/1
    labels, whose direction equals Fisher's LDA for two classes.

    Distributed shape is the textbook sufficient-statistics pattern —
    ONE map-side-combined global aggregate computes every Gramian entry
    (sum x_i x_j), moment (sum x_i y), and the count; that single row is
    bounded model state (d=5 incl. bias → 21 sums), solved on the driver
    with numpy (d×d), exactly the IVF-centroid precedent. The corpus is
    scanned once; nothing wide moves.

    Determinism: Gramian entries are float sums (partition-order
    dependent at ~1e-10 relative) — they are rounded to 6 dp before the
    solve, so the solve input (and therefore the weights, rounded to
    6 dp) is bit-stable across partitionings (NOTES float-sum gotcha,
    applied at the model layer instead of DECIMAL).

    Returns ``{"bias": w0, <feature>: w_i, ...}``.
    """
    import numpy as np

    aug = [F.lit(1.0).alias("_bias")] + [F.col(c) for c in feature_cols]
    names = ["_bias", *feature_cols]
    exprs = []
    for i in range(len(names)):
        for j in range(i, len(names)):
            exprs.append(F.sum(aug[i] * aug[j]).alias(f"g_{i}_{j}"))
        exprs.append(F.sum(aug[i] * F.col(label_col)).alias(f"b_{i}"))
    row = feats.agg(*exprs).first()
    if row["g_0_0"] is None:  # empty input: sums are NULL; no model to fit
        return {"bias": 0.0, **{c: 0.0 for c in feature_cols}}

    d = len(names)
    G = np.zeros((d, d))
    b = np.zeros(d)
    for i in range(d):
        for j in range(i, d):
            G[i, j] = G[j, i] = round(row[f"g_{i}_{j}"], 6)
        b[i] = round(row[f"b_{i}"], 6)
    A = G + float(reg) * np.diag([0.0] + [1.0] * (d - 1))  # bias unregularized
    w = np.linalg.solve(A, b)
    w = [round(float(x), 6) for x in w]
    return {"bias": w[0], **dict(zip(feature_cols, w[1:]))}


def score_quality_classifier(
    feats: DataFrame, weights: dict[str, float], score_col: str = "clf_score"
) -> DataFrame:
    """Apply fitted weights as a literal-coefficient projection: the
    linear prediction (≈ P(label=1) for the ridge-on-0/1 fit), rounded
    to 4 dp. Pure codegen — the model ships inside the plan, so at
    100 TB this is a scan-speed map with zero extra stages.
    """
    expr = F.lit(weights["bias"])
    for c, w in weights.items():
        if c != "bias":
            expr = expr + F.lit(w) * F.col(c)
    return feats.withColumn(score_col, F.round(expr, 4))


def cluster_topics(
    docs: DataFrame,
    assignments: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cluster_col: str = "cluster",
    k: int = 5,
) -> DataFrame:
    """c-TF-IDF topic labeling (Grootendorst 2022, BERTopic §2.3): treat
    each CLUSTER as one meta-document and rank the terms that
    characterize it — the standard "what is this embedding cluster
    about?" step after any clustering (IVF assignment, semantic_dedup
    clusters, or a ground-truth label column; ``assignments`` is any
    (id, cluster) frame, so all three compose).

        score(t, c) = tf_{t,c} * (ln((C + 1) / (cf_t + 1)) + 1)

    with C = number of clusters and cf_t = number of clusters containing
    t (the same smoothed-IDF form as ``tfidf_top_terms``, lifted from
    doc granularity to cluster granularity). Ties break token-ascending.

    Scale shape: the token stream aggregates STRAIGHT to (cluster,
    token) counts — one map-side-combined exchange keyed by cluster
    (tiny key space), after riding the id-keyed join between the doc
    scan and the assignment frame. Both model tables (cluster-frequency,
    C) are cluster-count-sized; the final per-cluster top-k window
    partitions on ``cluster`` and prunes through WindowGroupLimit.
    n_clusters is bounded (a clustering output), so the window skew the
    per-query ANN top-k needed pre-pruning for does not arise: each
    partition holds the cluster's distinct vocab, not the corpus.

    Returns (cluster, token, score, rnk) with rnk in 1..k.
    """
    # join at DOC level, then explode: the id-keyed join moves one row
    # per document instead of one per token (~mean-doc-length× less on
    # the wire than tagging the exploded stream)
    tagged = (
        docs.select(F.col(id_col), F.col(text_col))
        .join(assignments.select(F.col(id_col), F.col(cluster_col).alias("cluster")), id_col)
        .select("cluster", F.explode(tokens(text_col)).alias("token"))
    )
    tf = tagged.groupBy("cluster", "token").agg(F.count("*").alias("tf"))
    cfreq = tf.groupBy("token").agg(F.count("*").alias("cf"))
    c = assignments.select(F.col(cluster_col).alias("cluster")).distinct().agg(
        F.count("*").alias("n_clusters")
    )  # 1 row → broadcast NLJ
    idf = cfreq.crossJoin(F.broadcast(c)).select(
        "token",
        (
            F.log((F.col("n_clusters") + F.lit(1.0)) / (F.col("cf") + F.lit(1.0))) + F.lit(1.0)
        ).alias("idf"),
    )
    scored = tf.join(idf, "token").select(
        "cluster", "token", F.round(F.col("tf") * F.col("idf"), 4).alias("score")
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("cluster", "token", "score", "rnk")
    )


def bm25_retrieve(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Okapi BM25 retrieval: top-``k`` documents per query (E36).

    The principled version of the reference's fixed-list substring scan
    (app.py:93-149) and the scorer retrieval-based data selection uses
    (e.g. selecting pretraining documents by similarity to a curated
    query set — the BM25 flavor of DSIR's importance weighting):

        score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
        idf(t)      = ln(1 + (N − df + 0.5) / (df + 0.5))   (RSJ, ≥ 0)

    with ``dl`` the document token count and ``avgdl`` = total tokens /
    N over the whole collection (zero-token docs count in N).

    Scale shape (pure DataFrame, zero Python):
    - ONE tokenize pass builds the (doc, token, tf) postings aggregate
      (map-side combined); doc length (sum of tf per doc) rides the
      postings rows as a window over the doc id (partition size bounded
      by a doc's distinct-token count — no hot key exists). Document
      frequency is a two-level aggregate (map-side-combined partials per
      token: a corpus-saturating term contributes one partial row per
      map task, not one row per posting) pruned to the query vocabulary
      and broadcast back — the postings never shuffle on bare token, so
      a hot stopword cannot become a single-task straggler (r14; the r13
      token-window form had exactly that 100 TB hazard).
    - The query-term table is exploded, DISTINCT'd, and BROADCAST
      (explicit hint: a retrieval query set is bounded — thousands of
      terms — while the postings side scales with the corpus); the
      broadcast prunes the postings to candidate rows in the same
      codegen stage, so at 100 TB nothing token-irrelevant reaches the
      scoring aggregate.
    - Corpus constants (N, total tokens) enter as a broadcast NLJ of
      1-row aggregates; per-query top-k is a rank-filtered window whose
      partial group-limit pushes below the exchange
      (InferWindowGroupLimit — same W1 shape as tfidf/ANN).

    Determinism: tf/df/dl are integers; each (query, doc) score sums a
    handful of identically-computed doubles, far below round(4) drift;
    ordering is (rounded score DESC, id ASC) — a total order both
    engines cut identically. Returns (query_id, id_col, score, rnk).

    ``max_df_frac`` (VERDICT r9 #3) is the hot-term guard — the postings
    prune stops pruning when a query contains a corpus-saturating term
    ("the"): that term's candidate set is O(corpus) even though its
    RSJ idf ≈ 0 makes it rank-irrelevant. With the guard set, query
    terms whose document frequency exceeds ``max_df_frac · N`` are
    dropped BEFORE candidate generation (same precedent as the
    hot-shingle cap in operators/dedup.py — bound the join fan-out at
    the key whose df explodes). Dropping is the idf-floor semantics:
    such a term contributes the same near-zero idf to every candidate,
    so the surviving ranking equals the stopword-free query's exactly.
    Default None = off (the SQL-oracle spec scores every term).
    """
    # ONE tokenize pass for the whole postings model (r13 opt): dl and df
    # used to be separate aggregates re-consuming `tf`, and each branch
    # re-executed the scan+tokenize+aggregate pipeline (documents was
    # tokenized three times per action). dl rides the postings rows as a
    # window over the doc id (partition size bounded by a document's
    # distinct-token count — never a hot key). df does NOT (r14 de-skew,
    # VERDICT r13 #2/what's-wrong): a `count over Window.partitionBy(token)`
    # funnels EVERY posting of a hot token ("the") through one task with no
    # partial aggregation — invisible at bench SF, a straggler on a corpus
    # where a stopword saturates. Instead df is a two-level aggregate
    # (map-side-combined partials per token — a hot token contributes ONE
    # partial row per map task), pruned to the query-term vocabulary and
    # broadcast back onto the candidates: the broadcast is bounded by the
    # number of distinct query terms (thousands) at any corpus size, and
    # the postings never shuffle on bare token at all.
    tok = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    tf = tok.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    # df straight from the per-doc distinct token sets: array_distinct
    # before the explode makes each doc contribute one row per token, so
    # a plain map-side-combined count IS the document frequency — no
    # (id, token) exchange, no window. (A dfreq branch hung off `tf` was
    # measured re-executing the whole scan+tokenize+aggregate pipeline —
    # AQE reuses only the scan's round-robin exchange across branches.)
    dfreq = (
        docs.select(F.explode(F.array_distinct(tokens(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    post = tf.withColumn("dl", F.sum("tf").over(Window.partitionBy(id_col)))
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.coalesce(F.size(tokens(text_col)), F.lit(0))).alias("total_tokens"),
    )  # 1 row → broadcast NLJ. Empty texts tokenize to empty arrays (0);
    #    NULL texts tokenize to NULL, which the coalesce pins to 0 so the
    #    total no longer leans on the non-legacy sizeOfNull default
    #    (ADVICE r13: size(NULL) is -1 under spark.sql.legacy.sizeOfNull)
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(tokens(query_text_col)).alias("token"),
        )
        .distinct()
    )
    # Attach df to the QUERY-TERM side, not the postings: qterms is tiny
    # (bounded by the query set at any corpus size), so `qdf` — one row
    # per (query_id, query token) with its full-corpus df — broadcasts,
    # and the postings never shuffle on bare token at all. The dfreq
    # aggregate itself is two-level map-side combined: a hot stopword
    # contributes one partial row per map task, never one row per posting.
    qdf = qterms.join(dfreq, "token")
    cand = post.join(F.broadcast(qdf), "token").crossJoin(F.broadcast(stats))
    if max_df_frac is not None:
        # hot-term guard: df rides every candidate row via the broadcast,
        # so the prune is an inline filter in the same codegen stage as
        # the joins — a corpus-saturating term's postings never reach an
        # exchange (the old form dropped the term from qterms instead;
        # identical surviving ranking either way)
        cand = cand.filter(
            F.col("df") <= F.lit(float(max_df_frac)) * F.col("n_docs")
        )
    scored = cand.select(
        "query_id",
        F.col(id_col),
        (
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            )
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1
                * (
                    1.0
                    - b
                    + b
                    * F.col("dl")
                    / (F.col("total_tokens").cast("double") / F.col("n_docs"))
                )
            )
        ).alias("contrib"),
    )
    scores = scored.groupBy("query_id", id_col).agg(
        F.round(F.sum("contrib"), 4).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scores.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "score", "rnk")
    )


def rrf_fuse(
    legs: list[tuple[str, DataFrame]],
    k: int = 10,
    k_rrf: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rnk",
) -> DataFrame:
    """Reciprocal-rank fusion of per-query ranked lists (E37).

    The standard hybrid-retrieval combiner (Cormack/Clarke/Buettcher,
    SIGIR'09): each input leg — e.g. BM25 lexical ranks and dense
    embedding-cosine ranks — contributes ``1/(k_rrf + rank)`` for every
    (query, doc) it ranked, and documents are re-ranked by the summed
    score. Rank fusion needs no score calibration across legs (ranks
    are scale-free), which is why RAG stacks fuse sparse+dense this way
    rather than mixing raw BM25 and cosine values. The reference's
    single fixed-list scan (app.py:93-149) has one signal; this is the
    principled multi-signal form.

    ``legs`` is an ORDERED list of (name, frame) where each frame has
    (query_col, id_col, rank_col) — the per-query top-N of one
    retriever, e.g. ``bm25_retrieve(...)`` / ``brute_force_topk(...)``.

    Scale shape: each leg is already per-query bounded (N rows per
    query), so the fusion input is O(n_queries x N) — independent of
    corpus size; the expensive part of hybrid retrieval is the legs
    themselves, never this combiner. Legs are stitched with full outer
    joins on (query, id) in the given order: keys are bounded per query
    (no skew) and the join degree per key is 1, so this is a clean
    shuffle join at any query volume; with millions of queries the
    (query, id) hash partitioning spreads evenly.

    Determinism: contributions are ``1.0 / (k_rrf + integer rank)``
    added in FIXED leg order (one coalesce chain, not a groupBy sum —
    float addition is not associative and a partition-order sum could
    drift across engines at round() boundaries). ``rrf_score`` is
    rounded to 6 dp and always positive (no signed-zero class); final
    order (score DESC, id ASC) is total. Returns
    (query_col, id_col, rrf_score, n_legs, rnk) where ``n_legs`` is how
    many input lists ranked the doc.
    """
    if not legs:
        raise ValueError("rrf_fuse needs at least one ranked leg")
    names = [name for name, _ in legs]
    if len(set(names)) != len(names):
        # duplicate names would mint duplicate _rnk_{name} columns and
        # surface as an ambiguous-reference error deep in the join chain
        raise ValueError(f"rrf_fuse leg names must be unique, got {names}")
    fused: DataFrame | None = None
    rank_cols: list[str] = []
    for name, frame in legs:
        rc = f"_rnk_{name}"
        rank_cols.append(rc)
        leg = frame.select(
            F.col(query_col), F.col(id_col), F.col(rank_col).alias(rc)
        )
        fused = leg if fused is None else fused.join(
            leg, [query_col, id_col], "full_outer"
        )
    contribs = [
        F.coalesce(1.0 / (F.lit(float(k_rrf)) + F.col(rc)), F.lit(0.0))
        for rc in rank_cols
    ]
    score = contribs[0]
    for c in contribs[1:]:  # fixed left-to-right addition order
        score = score + c
    hits = [F.when(F.col(rc).isNotNull(), 1).otherwise(0) for rc in rank_cols]
    n_legs = hits[0]
    for h in hits[1:]:
        n_legs = n_legs + h
    w = Window.partitionBy(query_col).orderBy(F.desc("rrf_score"), F.asc(id_col))
    return (
        fused.select(
            query_col,
            id_col,
            F.round(score, 6).alias("rrf_score"),
            n_legs.alias("n_legs"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_col, id_col, "rrf_score", "n_legs", "rnk")
    )


def phrase_search(
    df: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase retrieval over a positional token index (E71): which
    documents contain the token SEQUENCE, and how often — the retrieval
    read a bag-of-words scorer structurally cannot answer (E36's BM25
    ranks documents containing the words ANYWHERE; "new york" queries
    need adjacency). The classic positional-index form: the phrase's
    k terms become k position streams, each shifted by its offset in
    the phrase (term i at position p supports a match starting at
    p − i), and a match is a (doc, base) present in ALL k streams —
    k−1 equi-joins on (doc, base), never a string scan.

    Scale shape: the positional explode is filtered to the PHRASE'S
    terms before anything shuffles (an isin filter on the token stream
    — the phrase is tiny, the corpus is not), so the joins carry only
    candidate positions of the k terms, a vanishing fraction of the
    token stream; with a persisted positional index the same plan is a
    k-way index lookup. Tokenization is the engine-wide `tokens()`
    rule, so "phrase" means the same thing here as in every other text
    operator (and in the SQL oracle). Matching is case-insensitive by
    that rule; a LIKE '%...%' scan is NOT equivalent (substring, not
    token-boundary, and unindexable at scale).

    Returns (id_col, n_matches) for documents with ≥1 occurrence.
    Raises on an empty phrase (after normalization)."""
    terms = _phrase_terms(phrase)
    index = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    ).filter(F.col("tok").isin(terms))
    return _phrase_intersect(index, terms, id_col)


def _phrase_terms(phrase: str) -> list[str]:
    """The engine-wide tokenize rule applied to a query phrase."""
    terms = [t for t in re.split(r"[^a-z0-9]+", phrase.lower()) if t]
    if not terms:
        raise ValueError("phrase search needs a non-empty phrase")
    return terms


def _phrase_intersect(index: DataFrame, terms: list[str], id_col: str) -> DataFrame:
    """The k-way positional intersection both phrase readers share:
    ``index`` is a (id_col, pos, tok) stream already restricted to the
    phrase's terms; term i at position p supports a match starting at
    p − i, and a match is a (doc, base) present in all k shifted
    streams."""
    legs = [
        index.filter(F.col("tok") == t).select(
            id_col, (F.col("pos") - i).alias("base")
        )
        for i, t in enumerate(terms)
    ]
    matches = legs[0]
    for leg in legs[1:]:
        matches = matches.join(leg, [id_col, "base"])
    return matches.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_matches")
    )


def build_phrase_index(
    df: DataFrame,
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist the positional token index ``phrase_search`` otherwise
    rebuilds per query (VERDICT r12 ask #2): the corpus is tokenized
    ONCE and its postings — one (tok, id, pos) row per token instance —
    are written as a catalog table hash-bucketed on ``tok`` and sorted
    by (tok, id, pos) within buckets. Every later phrase probe turns
    its k terms into a literal ``IN`` on the bucket column, which Spark
    answers with static bucket pruning (``SelectedBucketsCount`` in the
    scan, plan-asserted in tests): the probe reads only the terms'
    buckets and NEVER touches or re-tokenizes document text. At 100 TB
    the tokenize+explode pass is the dominant cost of a phrase query;
    this is the interactive-retrieval complement to ``ivf_build_index``
    (same build-once-probe-many contract, same bucketed machinery as
    S12's ``write_bucketed_table``).

    ``path`` makes the table external (per-process locations let
    concurrent sessions rebuild without yanking files from each other —
    the ivf_build_index precedent)."""
    from audience_finder_pro_spark.sources.sinks import write_bucketed_table

    spark = df.sparkSession
    # idempotent rebuild: overwrite-mode saveAsTable still refuses an
    # existing managed location, so drop the previous index explicitly
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    postings = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    ).select("tok", id_col, "pos")
    write_bucketed_table(
        postings,
        table,
        ["tok"],
        n_buckets=n_buckets,
        sort_cols=["tok", id_col, "pos"],
        path=path,
    )


def phrase_search_indexed(
    spark,
    table: str,
    phrase: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase retrieval against a prebuilt ``build_phrase_index``
    table: identical semantics and output to ``phrase_search`` (the
    shared ``_phrase_intersect`` IS the semantics; only the index
    source differs) with the corpus scan replaced by a bucket-pruned
    postings lookup — the literal ``IN`` over the phrase's k terms
    selects ≤ k of the table's buckets and no document text is read or
    re-tokenized on the probe path."""
    terms = _phrase_terms(phrase)
    index = spark.table(table).filter(F.col("tok").isin(terms))
    return _phrase_intersect(index, terms, id_col)


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lambda_: float = 0.5,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    score_col: str = "score",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (E78; Carbonell & Goldstein,
    SIGIR 1998): greedily re-order each query's candidate set so every
    pick maximizes λ·relevance − (1−λ)·max-cosine-to-already-picked —
    the diversity pass a retrieval stack runs AFTER BM25/RRF/ANN
    scoring (E36/E37/A10) so the final k results aren't k paraphrases
    of the same hit. λ=1 is pure relevance, λ=0 pure diversity.

    Deterministic: the first pick is the highest score (ties → lowest
    id), every later pick the highest MMR value (ties → lowest id);
    float comparisons are pure IEEE, so the same candidates give the
    same ranking anywhere. Zero-norm vectors contribute similarity 0.

    Scale shape: ONE applyInPandas group exchange on the query id —
    the greedy loop is inherently sequential PER QUERY but each query's
    candidate set is bounded by the upstream retriever's k (hundreds,
    not corpus-sized: this operator re-ranks shortlists, it does not
    search), so the per-group work is a tiny dense matmul + k argmax
    passes at BLAS speed, queries in parallel. Iterative-greedy
    taxonomy (the E62 k-center precedent): no SQL oracle — gated by
    planted geometry, a pure-python reference equality, and
    partitioning independence.

    Returns (query_col, id_col, score_col, mmr_score, pick) — the
    selected ≤k rows per query, pick = 1..k in selection order."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    if k < 1:
        raise ValueError("mmr_rerank needs k >= 1")
    if not 0.0 <= lambda_ <= 1.0:
        raise ValueError("mmr_rerank needs 0 <= lambda_ <= 1")

    qf = next(f for f in candidates.schema.fields if f.name == query_col)
    idf = next(f for f in candidates.schema.fields if f.name == id_col)
    out_schema = StructType(
        [
            StructField(query_col, qf.dataType),
            StructField(id_col, idf.dataType),
            StructField(score_col, DoubleType()),
            StructField("mmr_score", DoubleType()),
            StructField("pick", IntegerType()),
        ]
    )
    lam = float(lambda_)

    def pick_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic candidate order: by id (ties in the argmax then
        # resolve to the lowest id via first-occurrence argmax)
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        scores = pdf[score_col].to_numpy(dtype="float64")
        vecs = np.array(pdf[vec_col].tolist(), dtype="float64")
        norms = np.linalg.norm(vecs, axis=1)
        safe = np.where(norms == 0.0, 1.0, norms)
        unit = vecs / safe[:, None]
        unit[norms == 0.0] = 0.0
        picked: list[int] = []
        max_sim = np.full(n, -np.inf)
        mmr_vals: list[float] = []
        avail = np.ones(n, dtype=bool)
        for _ in range(min(k, n)):
            if not picked:
                objective = scores.copy()
            else:
                objective = lam * scores - (1.0 - lam) * max_sim
            masked = np.where(avail, objective, -np.inf)
            i = int(np.argmax(masked))  # first occurrence = lowest id
            picked.append(i)
            mmr_vals.append(float(masked[i]))
            avail[i] = False
            sims = unit @ unit[i]
            max_sim = np.maximum(max_sim, sims)  # -inf start → first = sims
        return pd.DataFrame(
            {
                query_col: pdf[query_col].iloc[picked].to_numpy(),
                id_col: pdf[id_col].iloc[picked].to_numpy(),
                score_col: scores[picked],
                "mmr_score": mmr_vals,
                "pick": np.arange(1, len(picked) + 1, dtype="int32"),
            }
        )

    return (
        candidates.select(query_col, id_col, score_col, vec_col)
        .groupBy(query_col)
        .applyInPandas(pick_group, schema=out_schema)
    )


def pmi_cooccurrence(
    docs: DataFrame,
    vocab_k: int = 100,
    top_k: int = 50,
    min_pairs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top document-level token co-occurrences by pointwise mutual
    information (E79): which token PAIRS appear together in documents
    far more than their individual frequencies predict — the collocation
    / topic-seed miner (Church & Hanks 1990 applied at document grain;
    TF-IDF (E11) characterizes docs by single terms, c-TF-IDF (E32)
    clusters, this finds the ASSOCIATIONS). PMI = ln(df_pair · N /
    (df_a · df_b)) over document frequencies, requiring df_pair ≥
    ``min_pairs`` (PMI's classic low-count instability guard), top
    ``top_k`` by (pmi desc, pair asc).

    The all-pairs trap and its declared bound: per-doc token pairing is
    quadratic in distinct tokens per doc, so the stream is first
    restricted to the ``vocab_k`` highest-document-frequency tokens
    (ties df desc, token asc — deterministic; the vocabulary is bounded
    model state, broadcast back as a semi-join filter). Pair fan-out is
    then ≤ vocab_k²/2 per doc regardless of document size, and the
    pair aggregate is map-side combined. One explode + distinct, one
    broadcast semi-join, one per-doc self-join over ≤ vocab_k rows per
    doc, two bounded aggregates — no step is corpus-quadratic.

    Integer counts + one ln per OUTPUT row → cross-engine exact at
    round(4). Returns (token_a, token_b, n_pair, pmi, rnk)."""
    if vocab_k < 2 or top_k < 1 or min_pairs < 1:
        raise ValueError(
            "pmi_cooccurrence needs vocab_k >= 2, top_k >= 1, min_pairs >= 1"
        )
    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    ).distinct()
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    wv = Window.orderBy(F.col("df").desc(), F.col("tok").asc())
    # vocab_k rows through the rank — bounded by the vocabulary, and
    # WindowGroupLimit pre-truncates each map task to its local top-k
    vocab = (
        dfreq.withColumn("_r", F.row_number().over(wv))
        .filter(F.col("_r") <= vocab_k)
        .select("tok", "df")
    )
    kept = toks.join(F.broadcast(vocab), "tok")
    a = kept.select(F.col(id_col), F.col("tok").alias("token_a"),
                    F.col("df").alias("_dfa"))
    b = kept.select(F.col(id_col), F.col("tok").alias("token_b"),
                    F.col("df").alias("_dfb"))
    pairs = (
        a.join(b, id_col)
        .filter(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b", "_dfa", "_dfb")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pairs)
    )
    n = docs.agg(F.countDistinct(id_col).alias("_n"))  # 1 row → broadcast NLJ
    pmi = F.round(
        F.log(
            F.col("n_pair").cast("double") * F.col("_n").cast("double")
            / (F.col("_dfa").cast("double") * F.col("_dfb").cast("double"))
        ),
        4,
    )
    scored = pairs.crossJoin(F.broadcast(n)).select(
        "token_a", "token_b", F.col("n_pair").cast("long").alias("n_pair"),
        pmi.alias("pmi"),
    )
    wt = Window.orderBy(
        F.col("pmi").desc(), F.col("token_a").asc(), F.col("token_b").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(wt))
        .filter(F.col("rnk") <= top_k)
    )
