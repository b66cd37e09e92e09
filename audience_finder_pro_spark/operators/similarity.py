"""Embedding similarity search (SURVEY §2.4 A10; LLM-pipeline north star).

- brute_force_topk: query set × corpus crossJoin with the (small) query
  side broadcast, cosine as pure zip_with/aggregate expressions, top-k
  per query via window rank — which Catalyst rewrites into a two-stage
  top-k (map-side WindowGroupLimit(Partial) BEFORE the exchange; see
  ``_exact_topk``). At 100 TB of embeddings this is a single narrow
  pass over the corpus — no corpus shuffle; the only exchange carries
  ≤ n_partitions × n_queries × k rows.
- lsh_bucketed_topk: random-hyperplane (sign) LSH — deterministic
  hyperplanes precomputed at plan-build time (sha256 parity); all
  table buckets computed in one Arrow-batched matmul per record batch.
  Probe joins only its bucket (+ optional multi-probe neighbors),
  turning O(n_q × n) into O(n_q × n / 2^bits) at some recall cost.
  Recall vs brute force is asserted in tests (planted-pair style).
- cosine_neardup_pairs: near-duplicate detection over embeddings with
  label blocking (the generic scale path would block on LSH buckets).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from audience_finder_pro_spark.functions.vectors import (
    VECTORIZE_MIN_DIM,
    cosine_similarity,
    dot,
    l2_norm,
)


def _with_norm(df: DataFrame, vec_col: str, norm_col: str, dim: int | None) -> DataFrame:
    """Project the vector's L2 norm as a column when the fold path will be
    used: the norm is per-ROW, so computing it before a join/crossJoin
    evaluates it once per row instead of once per pair — the pair-side
    fold work drops from 3 folds (dot + 2 norms) to 1. A no-op on the
    Arrow path, whose batched kernel already computes norms vectorized."""
    if dim is not None and dim >= VECTORIZE_MIN_DIM:
        return df
    return df.withColumn(norm_col, l2_norm(F.col(vec_col)))


def _pair_cosine(qvec: Column, cvec: Column, qn: str, cn: str, dim: int | None) -> Column:
    """Cosine for a joined pair, using the precomputed per-row norms on the
    fold path. dot/(qn·cn) is the identical floating-point expression the
    oracle computes (the norm value doesn't depend on where it's evaluated),
    so hash equality with DuckDB is preserved.

    Zero vectors: the denominator is 0 and ANSI mode makes a bare divide
    THROW, so the division is guarded to NULL — which is exactly what the
    DuckDB oracle's double division by zero returns, keeping parity. NULL
    sims sort last under the desc() rank windows, so zero vectors can
    never outrank a real similarity. (The Arrow kernel yields NaN instead
    — 0/0 in IEEE — which Spark sorts FIRST in desc; corpora with zero
    vectors at ≥VECTORIZE_MIN_DIM widths should pre-filter them.)"""
    if dim is not None and dim >= VECTORIZE_MIN_DIM:
        return cosine_similarity(qvec, cvec, dim=dim)
    den = F.col(qn) * F.col(cn)
    return F.when(den != 0.0, dot(qvec, cvec) / den)


def _exact_topk(
    scored: DataFrame, k: int, query_id_col: str, id_col: str, sim_col: str = "cosine_sim"
) -> DataFrame:
    """Shared exact per-query top-k rerank (window rank + filter).

    Scale adjudication — this LOOKS like a full shuffle of the scored
    set onto n_queries reducer keys (maximal skew by construction), but
    the row_number()-over-window-then-filter(<= k) shape triggers
    Spark's ``InferWindowGroupLimit`` rewrite (Spark ≥3.5, on whenever
    k < spark.sql.optimizer.windowGroupLimitThreshold = 1000): a
    map-side ``WindowGroupLimit(Partial)`` keeps only the k best rows
    per query PER INPUT PARTITION before the exchange, so the shuffle
    carries ≤ n_partitions × n_queries × k rows, never the full scored
    volume. A hand-rolled mapInPandas pre-prune was tried and REVERTED
    (r6): it duplicates the JVM rewrite through an Arrow→Python round
    trip of the full scored set, and — being a partitioning-info
    barrier — it forced an extra exchange in ``ivf_probe_indexed``,
    whose broadcast probe join otherwise hands the window an input
    already hash-partitioned by query_id. The two-stage shape is
    plan-asserted in tests/test_plan_shapes.py and pinned per query by
    the ``window_group_limit`` fingerprint counter.
    """
    w = Window.partitionBy(query_id_col).orderBy(F.col(sim_col).desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, F.round(sim_col, 4).alias(sim_col), "rnk")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k per query vector. Query side must be small (broadcast).

    ``dim``, when known, routes scoring through the width-dispatched
    cosine (Arrow matmul at ≥VECTORIZE_MIN_DIM — see functions/vectors.py).
    The scan is a single narrow pass over the corpus (query side
    broadcast); the per-query top-k is map-side pre-pruned by the
    WindowGroupLimit rewrite (see ``_exact_topk``), so no operator ever
    shuffles the full scored set."""
    paired = _with_norm(corpus, vec_col, "_cn", dim).crossJoin(
        F.broadcast(_with_norm(queries, query_vec_col, "_qn", dim))
    )
    scored = paired.select(
        F.col(query_id_col),
        F.col(id_col),
        _pair_cosine(F.col(query_vec_col), F.col(vec_col), "_qn", "_cn", dim).alias("cosine_sim"),
    )
    return _exact_topk(scored, k, query_id_col, id_col)


@lru_cache(maxsize=None)
def _hyperplane_signs(table: int, n_bits: int, dim: int) -> tuple[tuple[int, ...], ...]:
    """Deterministic ±1 hyperplanes, computed ONCE at plan-build time.

    Component (table, b, i) = +1 iff the first byte of
    sha256(f"{table},{b},{i}") is even — reproducible anywhere with no
    stored model and no per-row hash evaluation. (The previous form
    re-derived the hyperplane per row via xxhash64 inside interpreted
    HOF lambdas: dim × n_bits × n_tables lambda calls per input row.)
    """
    return tuple(
        tuple(
            1 if hashlib.sha256(f"{table},{b},{i}".encode()).digest()[0] % 2 == 0 else -1
            for i in range(dim)
        )
        for b in range(n_bits)
    )


def _sign_lsh_bits(vec: Column, dim: int, n_bits: int, table: int = 0) -> Column:
    """Single-table bucket id from plan-time-constant hyperplanes, as a
    pure-expression fold over a LITERAL ±1 array (no per-row hash
    evaluation). Fine for one table of a few bits (e.g. as a blocking
    key for ``cosine_neardup_pairs``); the multi-table hot path uses the
    vectorized ``_multi_table_buckets`` instead."""
    signs = _hyperplane_signs(table, n_bits, dim)
    bucket = None
    for b in range(n_bits):
        harr = F.array(*[F.lit(float(s)) for s in signs[b]])
        proj = F.aggregate(
            F.zip_with(vec, harr, lambda x, h: x.cast("double") * h),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        bucket = term if bucket is None else bucket + term
    return bucket


def _bucket_udf(dim: int, n_bits: int, n_tables: int):
    """Arrow-batched bucket computation: ONE matmul per record batch
    against the (dim × n_tables·n_bits) constant hyperplane matrix,
    returning all table buckets as array<long>.

    Measured at sf0.1 (NOTES.md): n_bits×n_tables separate expression
    folds are interpreted per element (the round-1 shape additionally
    re-hashed the hyperplanes per row), and a constant-folded add-chain
    explodes plan-compile time — BLAS over Arrow batches beats both by
    ~4-10× and is the 100 TB shape (cost: one column transfer per batch).
    """
    hyper = np.array(
        [_hyperplane_signs(t, n_bits, dim) for t in range(n_tables)], dtype=np.float64
    ).reshape(n_tables * n_bits, dim)
    proj_matrix = np.ascontiguousarray(hyper.T)  # (dim, n_tables*n_bits)
    bit_weights = 1 << np.arange(n_bits, dtype=np.int64)

    @pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        x = np.vstack(v.to_numpy())  # (batch, dim)
        bits = (x @ proj_matrix >= 0).astype(np.int64)
        bkt = bits.reshape(len(x), n_tables, n_bits) @ bit_weights  # (batch, n_tables)
        return pd.Series(list(bkt))

    return buckets


def _multi_table_buckets(vec: Column, dim: int, n_bits: int, n_tables: int) -> Column:
    """array<long> — bucket id per LSH table (index = table). Multi-table
    probing is the standard recall lever: a neighbor missed by one table's
    random cut is caught by another (recall ≈ 1-(1-p^bits)^tables)."""
    return _bucket_udf(dim, n_bits, n_tables)(vec)


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_bits: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate cosine top-k: multi-table LSH equi-join, exact rerank.

    Scale path for when the query side is too big to broadcast: both
    sides bucket per table (corpus storage ×n_tables, the classic LSH
    trade), the join is a plain shuffle equi-join on (table, bucket),
    candidates are deduped and reranked with the exact cosine.
    """
    # norms projected per INPUT row (before bucket explode/join), so the
    # rerank's fold work is one dot per candidate pair, not dot + 2 norms
    cb = _with_norm(corpus, vec_col, "_cn", dim).select(
        F.col(id_col),
        F.col(vec_col),
        *(["_cn"] if dim is None or dim < VECTORIZE_MIN_DIM else []),
        F.posexplode(_multi_table_buckets(F.col(vec_col), dim, n_bits, n_tables)).alias(
            "tbl", "bucket"
        ),
    )
    qb = _with_norm(queries, query_vec_col, "_qn", dim).select(
        F.col(query_id_col),
        F.col(query_vec_col),
        *(["_qn"] if dim is None or dim < VECTORIZE_MIN_DIM else []),
        F.posexplode(_multi_table_buckets(F.col(query_vec_col), dim, n_bits, n_tables)).alias(
            "tbl", "bucket"
        ),
    )
    keep = [query_id_col, query_vec_col, id_col, vec_col]
    if dim is None or dim < VECTORIZE_MIN_DIM:
        keep += ["_qn", "_cn"]
    cand = cb.join(qb, ["tbl", "bucket"]).select(*keep).dropDuplicates([query_id_col, id_col])
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col),
        _pair_cosine(F.col(query_vec_col), F.col(vec_col), "_qn", "_cn", dim).alias("cosine_sim"),
    )
    return _exact_topk(scored, k, query_id_col, id_col)


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    chunk_rows: int = 1024,
) -> DataFrame:
    """(id_a, id_b, cosine_sim) pairs above threshold, blocked on block_col.

    Per-block Arrow matmul instead of a pair-expanded self-join: each
    block arrives as ONE pandas group (a single shuffle of the corpus on
    the block key — the same exchange the join paid), and the block's
    pair similarities are a chunked ``X @ X.T`` normalized by the row
    norms. The join form scored every pair through a per-element
    interpreted fold — O(block² · dim) lambda evaluations (measured 4.7s
    vs 0.35s at sf0.1, 2k vectors / 10 blocks / dim 64); one BLAS product
    per chunk does the same arithmetic at memory bandwidth, and only the
    (rare) above-threshold pairs ever materialize as rows.

    Memory: the chunked product keeps the live sim slab at
    ``chunk_rows × |block|`` floats, but pandas still holds each whole
    block's vectors (|block| × dim); blocking keys must bound block size
    — labels here, LSH buckets (``_sign_lsh_bits``) with bounded
    occupancy when no natural key exists. The blowup control is the same
    as the join form's (which materialized block² pair ROWS — strictly
    worse).

    ``dim`` is accepted for signature parity with the other similarity
    ops but unused: the matmul path is already vectorized at any width.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        [
            StructField("id_a", df.schema[id_col].dataType),
            StructField("id_b", df.schema[id_col].dataType),
            StructField("cosine_sim", DoubleType()),
        ]
    )
    thr = float(threshold)

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        X = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()]
        )[order]
        norms = np.linalg.norm(X, axis=1)
        # zero vectors: cosine is NaN in the SQL form and never passes the
        # threshold there — map them to sim 0 so they never pass here either
        norms[norms == 0.0] = np.inf
        n = len(ids)
        out_a, out_b, out_s = [], [], []
        for s in range(0, n, chunk_rows):
            e = min(s + chunk_rows, n)
            sims = (X[s:e] @ X.T) / np.outer(norms[s:e], norms)
            rows, cols = np.nonzero(sims >= thr)
            keep = cols > rows + s  # global upper triangle: id_a < id_b
            rows, cols = rows[keep], cols[keep]
            out_a.append(ids[rows + s])
            out_b.append(ids[cols])
            out_s.append(sims[rows, cols])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine_sim": np.concatenate(out_s),
            }
        )

    return (
        df.select(block_col, id_col, vec_col)
        .groupBy(block_col)
        .applyInPandas(block_pairs, out_schema)
        .select("id_a", "id_b", F.round("cosine_sim", 4).alias("cosine_sim"))
    )


def _centroid_rows(df, id_col: str, vec_col: str, n_lists: int):
    """Deterministic centroid seeds: the n_lists lowest-id vectors."""
    return (
        df.orderBy(id_col)
        .limit(n_lists)
        .select(F.col(id_col).alias("cent_seed"), F.col(vec_col).alias("cvec"))
    )


def _assign(df, cents, vec_col: str, dim: int | None = None):
    """Nearest-centroid assignment: broadcast the (tiny) centroid table,
    score every (vector, centroid) pair in codegen, keep the argmax —
    one narrow pass over the corpus + a min_by aggregate, no corpus
    shuffle beyond the groupBy on the vector id. Norms precomputed per
    row/centroid, so each of the n_lists comparisons costs one dot fold."""
    scored = _with_norm(df, vec_col, "_vn", dim).crossJoin(
        F.broadcast(_with_norm(cents, "cvec", "_ctn", dim))
    ).withColumn("_sim", _pair_cosine(F.col(vec_col), F.col("cvec"), "_vn", "_ctn", dim))
    keys = [c for c in df.columns]
    # tie-break deterministically: highest sim, then lowest cent_id. A zero
    # vector's sim is NULL on the fold path (see _pair_cosine) — coalesce
    # below every real sim so it still assigns (to cent_id 0 via the tie
    # rule, same cluster the arrow path's all-zero argmax picks) instead of
    # max_by propagating a NULL cent_id into the cluster regroup.
    return scored.groupBy(*keys).agg(
        F.max_by(
            "cent_id", F.struct(F.coalesce(F.col("_sim"), F.lit(-2.0)), -F.col("cent_id"))
        ).alias("cent_id")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    dim: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the partition-the-corpus
    alternative to sign-LSH.

    Build: deterministic seed centroids → optional Lloyd refinement steps
    (mean of assigned vectors, computed distributed via posexplode +
    groupBy(centroid, dim) and collected — centroids are n_lists×dim
    floats, driver-safe model state). Search: each query probes its
    n_probe nearest lists only, exact cosine rerank inside them; cost
    scales with n_probe/n_lists of the corpus per query instead of the
    full corpus.
    """
    spark = corpus.sparkSession
    cents = _centroid_rows(corpus, id_col, vec_col, n_lists).withColumn(
        "cent_id", F.row_number().over(Window.orderBy("cent_seed")) - 1
    ).select("cent_id", "cvec")

    for _ in range(refine_iters):
        assigned = _assign(corpus.select(id_col, vec_col), cents, vec_col, dim=dim)
        if dim is not None:
            # known width: centroid means as dim column-wise sum aggregates
            # in ONE map-side-combined groupBy — the posexplode fallback
            # below shuffles corpus_rows × dim exploded rows (64M at the
            # 1M×64 stress), this shuffles n_lists × (dim+1) partials
            sums = assigned.groupBy("cent_id").agg(
                F.count(F.lit(1)).alias("_n"),
                *[F.sum(F.col(vec_col)[i]).alias(f"_s{i}") for i in range(dim)],
            )
            new = [
                (int(r["cent_id"]), [float(r[f"_s{i}"]) / r["_n"] for i in range(dim)])
                for r in sorted(sums.collect(), key=lambda r: r["cent_id"])
            ]
        else:
            means = (
                assigned.select("cent_id", F.posexplode(F.col(vec_col)).alias("dim", "x"))
                .groupBy("cent_id", "dim")
                .agg(F.avg("x").alias("m"))
            )
            rows = means.collect()  # n_lists × dim scalars — model state, not data
            by_cent: dict[int, dict[int, float]] = {}
            for r in rows:
                by_cent.setdefault(r["cent_id"], {})[r["dim"]] = float(r["m"])
            new = [
                (cid, [dims[i] for i in sorted(dims)])
                for cid, dims in sorted(by_cent.items())
            ]
        cents = spark.createDataFrame(new, "cent_id int, cvec array<float>")

    # no persist: after refinement `cents` is a local-data DataFrame (or a
    # trivial limit-n scan when refine_iters=0) and `assigned` is consumed
    # exactly once below — caching either would only leak executor storage
    # across invocations (bench warmup, repeated calls).
    assigned = _assign(corpus.select(id_col, vec_col), cents, vec_col, dim=dim)

    # each query probes its n_probe nearest centroids
    qscored = queries.crossJoin(F.broadcast(cents)).withColumn(
        "_sim", cosine_similarity(F.col(query_vec_col), F.col("cvec"), dim=dim)
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("_sim").desc(), F.col("cent_id"))
    probes = (
        qscored.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= n_probe)
        .select(query_id_col, query_vec_col, "cent_id")
    )

    keep = [query_id_col, query_vec_col, id_col, vec_col]
    if dim is None or dim < VECTORIZE_MIN_DIM:
        keep += ["_qn", "_cn"]
    cand = (
        _with_norm(probes, query_vec_col, "_qn", dim)
        .join(_with_norm(assigned, vec_col, "_cn", dim), "cent_id")
        .select(*keep)
    )
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col),
        _pair_cosine(F.col(query_vec_col), F.col(vec_col), "_qn", "_cn", dim).alias("cosine_sim"),
    )
    return _exact_topk(scored, k, query_id_col, id_col)


def ivf_build_index(
    corpus: DataFrame,
    table: str,
    n_lists: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    path: str | None = None,
) -> None:
    """Persist the IVF index: corpus rows bucketed BY centroid id, plus the
    centroid table. The repeated-query complement to the one-shot
    ``ivf_topk`` — the assignment shuffle is paid once at build time, and
    every probe afterwards reads only its lists' buckets from storage
    (``SelectedBucketsCount`` in the scan, asserted in tests) instead of
    scanning and re-assigning the corpus per query batch.
    """
    from audience_finder_pro_spark.sources.sinks import write_bucketed_table

    spark = corpus.sparkSession
    # idempotent rebuild: overwrite-mode saveAsTable still refuses an
    # existing managed location, so drop the previous index explicitly
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_cents")
    cents = (
        _centroid_rows(corpus, id_col, vec_col, n_lists)
        .withColumn("cent_id", F.row_number().over(Window.orderBy("cent_seed")) - 1)
        .select("cent_id", "cvec")
    )
    assigned = _assign(corpus.select(id_col, vec_col), cents, vec_col, dim=dim)
    write_bucketed_table(
        assigned, table, ["cent_id"], n_buckets=n_lists, path=f"{path}/{table}" if path else None
    )
    cw = cents.write.mode("overwrite")
    if path:
        cw = cw.option("path", f"{path}/{table}_cents")
    cw.saveAsTable(f"{table}_cents")


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    chunk_rows: int = 1024,
    assignment: str = "expr",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then mark near-copies
    *within* each cluster — the cluster step bounds the pairwise work the
    way ``label`` blocking bounds ``cosine_neardup_pairs`` when no natural
    blocking key exists.

    Declared (deterministic, SQL-replayable) semantics:

    1. Centroids are the ``n_clusters`` lowest-id vectors (the same
       bounded model state ``ivf_topk`` seeds from; no Lloyd iterations,
       so a DuckDB oracle can replay the whole operator).
    2. Each vector joins its nearest centroid by cosine (ties → lowest
       ``cent_id``) — broadcast centroids, one narrow corpus pass.
    3. A vector is a semantic duplicate iff its cluster contains a
       LOWER-id vector with cosine ≥ ``threshold``; ``dup_of`` is the
       smallest such id (greedy keep-lowest-id — the EXISTS-self-join
       form of SemDeDup's keep-one-per-ε-ball rule). Transitive
       *grouping* is deliberately out of scope here; feed the emitted
       (``dup_of``, id) pairs to ``operators.graph.connected_components``
       when cluster-level groups are wanted.

    Blocking trade-off (inherited from SemDeDup's k-means blocking): a
    near-copy pair that straddles a cluster boundary is MISSED — exact
    copies never are (identical vectors share an argmax), and a
    perturbed copy misses only when its original sits within the
    perturbation of a centroid decision boundary (recall asserted ≥0.9
    on planted perturbed copies in tests). ``embedding_cosine_neardup``
    with LSH-bucket blocking is the multi-probe alternative when recall
    on boundary pairs matters more than the cluster structure.

    Scale shape: one shuffle of the corpus on ``cent_id`` (the
    ``applyInPandas`` group exchange), then a chunked ``X @ X.T`` per
    cluster — O(|cluster|²·dim) at BLAS speed with the live slab bounded
    to ``chunk_rows × |cluster|`` floats, never a pair-expanded join.
    ``n_clusters`` is the blowup control: size it so |corpus|/n_clusters
    vectors fit one executor (raise it at scale; clusters are processed
    independently). Zero vectors score sim 0 (never duplicates), matching
    the SQL form where their cosine is NULL/NaN and fails the threshold.

    Returns one row per input vector: (id_col, cent_id, is_dup, dup_of)
    with ``dup_of`` NULL for kept vectors.

    ``assignment`` picks the nearest-centroid execution strategy:

    - ``"expr"`` (default): broadcast crossJoin + ``max_by`` fold — the
      sequential-double-fold arithmetic DuckDB replays bit-for-bit, so
      the pytest hash-differential holds. Costs one extra corpus
      exchange (the argmax groupBy; map-side combined, carries n rows).
    - ``"arrow"``: centroids collected to the driver (n_clusters×dim
      floats — the same bounded model state ``ivf_topk`` collects) and
      assignment computed as a per-batch matmul argmax in
      ``mapInPandas`` — a pure projection, so the cluster regroup is the
      ONLY corpus shuffle. The 100 TB shape: at real embedding widths
      the fold is also per-element-interpreted, while this path scores
      at BLAS speed. Sims agree with the fold only to float tolerance
      (~1e-15), so assignment can differ on exact centroid ties —
      argmax tie-break (lowest cent_id) matches, and the two paths are
      asserted identical on the fixture in tests.
    """
    from pyspark.sql.types import BooleanType, IntegerType, StructField, StructType

    cents = (
        _centroid_rows(df, id_col, vec_col, n_clusters)
        .withColumn("cent_id", F.row_number().over(Window.orderBy("cent_seed")) - 1)
        .select("cent_id", "cvec")
    )
    id_type = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("cent_id", IntegerType()),
            StructField("is_dup", BooleanType(), nullable=False),
            StructField("dup_of", id_type),
        ]
    )

    if assignment == "arrow":
        cent_rows = sorted(cents.collect(), key=lambda r: r["cent_id"])
        if not cent_rows:
            # empty corpus: no centroids to collect — short-circuit to an
            # empty result with the declared output schema
            return df.sparkSession.createDataFrame([], out_schema)
        C = np.stack([np.asarray(r["cvec"], dtype=np.float64) for r in cent_rows])
        cnorm = np.linalg.norm(C, axis=1)
        cnorm[cnorm == 0.0] = np.inf
        assign_schema = StructType(
            [
                StructField(id_col, df.schema[id_col].dataType),
                StructField(vec_col, df.schema[vec_col].dataType),
                StructField("cent_id", IntegerType()),
            ]
        )

        def assign_batches(it):
            for pdf in it:
                if pdf.empty:  # Spark may hand empty Arrow batches
                    continue
                X = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()]
                )
                xnorm = np.linalg.norm(X, axis=1)
                xnorm[xnorm == 0.0] = np.inf
                sims = (X @ C.T) / np.outer(xnorm, cnorm)
                # np.argmax returns the FIRST max → lowest cent_id on ties,
                # same rule as the expr path's max_by struct tie-break
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].to_numpy(),
                        vec_col: pdf[vec_col].to_numpy(),
                        "cent_id": sims.argmax(axis=1).astype(np.int32),
                    }
                )

        assigned = df.select(id_col, vec_col).mapInPandas(assign_batches, assign_schema)
    elif assignment == "expr":
        assigned = _assign(df.select(id_col, vec_col), cents, vec_col, dim=dim)
    else:
        raise ValueError(f"assignment must be 'expr' or 'arrow', got {assignment!r}")

    thr = float(threshold)

    def cluster_flags(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()])[order]
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0.0] = np.inf  # zero vectors: sim 0 everywhere (see docstring)
        n = len(ids)
        col_idx = np.arange(n)
        is_dup = np.zeros(n, dtype=bool)
        dup_of = np.full(n, -1, dtype=np.int64)
        for s in range(0, n, chunk_rows):
            e = min(s + chunk_rows, n)
            sims = (X[s:e] @ X.T) / np.outer(norms[s:e], norms)
            # only strictly-lower ids (ids sorted → strictly-left columns) count
            mask = (sims >= thr) & (col_idx[None, :] < np.arange(s, e)[:, None])
            hit = mask.any(axis=1)
            is_dup[s:e] = hit
            first = mask.argmax(axis=1)  # leftmost True = smallest qualifying id
            dup_of[s:e][hit] = ids[first[hit]]
        return pd.DataFrame(
            {
                id_col: ids,
                "cent_id": np.full(n, pdf["cent_id"].iloc[0], dtype=np.int32),
                "is_dup": is_dup,
                "dup_of": pd.array(
                    [int(d) if d >= 0 else None for d in dup_of], dtype="Int64"
                ),
            }
        )

    return (
        assigned.select("cent_id", id_col, vec_col)
        .groupBy("cent_id")
        .applyInPandas(cluster_flags, out_schema)
        .select(id_col, "cent_id", "is_dup", "dup_of")
    )


def ivf_probe_indexed(
    spark,
    table: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Top-k probe against a prebuilt ``ivf_build_index`` table.

    The union of probed list ids across the query batch (≤ n_lists values —
    bounded model state, not data) becomes a LITERAL ``IN`` filter on the
    bucket column, which Spark turns into static bucket pruning: the scan
    touches only the probed lists' files. Rerank is exact cosine inside the
    probed lists, identical to ``ivf_topk``.
    """
    cents = spark.table(f"{table}_cents")
    qscored = queries.crossJoin(F.broadcast(cents)).withColumn(
        "_sim", cosine_similarity(F.col(query_vec_col), F.col("cvec"), dim=dim)
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("_sim").desc(), F.col("cent_id"))
    probes = (
        qscored.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= n_probe)
        .select(query_id_col, query_vec_col, "cent_id")
    )
    probe_ids = sorted(r["cent_id"] for r in probes.select("cent_id").distinct().collect())
    assigned = spark.table(table).filter(F.col("cent_id").isin(probe_ids))
    keep = [query_id_col, query_vec_col, id_col, vec_col]
    if dim is None or dim < VECTORIZE_MIN_DIM:
        keep += ["_qn", "_cn"]
    cand = (
        _with_norm(probes, query_vec_col, "_qn", dim)
        .join(_with_norm(assigned, vec_col, "_cn", dim), "cent_id")
        .select(*keep)
    )
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col),
        _pair_cosine(F.col(query_vec_col), F.col(vec_col), "_qn", "_cn", dim).alias("cosine_sim"),
    )
    return _exact_topk(scored, k, query_id_col, id_col)


# --------------------------------------------------------------------------
# E23: corpus self k-NN graph
# --------------------------------------------------------------------------
def _np_row_topk(s_row: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the exact top-k of one similarity row under SQL
    ``row_number() OVER (ORDER BY sim DESC, id ASC)`` semantics: every
    entry whose sim ties the k-th value is considered and the lowest ids
    win. ``-inf`` entries (masked self, zero-norm rows) never qualify."""
    n = s_row.shape[0]
    if n <= k:
        cand = np.arange(n)
    else:
        part = np.argpartition(-s_row, k - 1)[:k]
        kth = s_row[part].min()
        cand = np.nonzero(s_row >= kth)[0]
    cand = cand[np.isfinite(s_row[cand])]
    order = np.lexsort((ids[cand], -s_row[cand]))
    return cand[order][:k]


def _np_topk_matrix(sims: np.ndarray, ids: np.ndarray, k: int):
    """Exact (sim DESC, id ASC) top-k for EVERY row of a sims matrix at
    once — the vectorized form of ``_np_row_topk`` (r10: the per-row
    Python loop was the IVF/exact self-graph hot path — ~1M calls at
    the 100k-vector stress). One axis-1 argpartition selects each row's
    top-k by sim; rows where the k-th value TIES entries outside the
    selection (the only case where argpartition's arbitrary tie choice
    could differ from the id-ascending rule) are detected by an exact
    float-equality count and re-done with the per-row reference — so
    the result is bit-identical to looping ``_np_row_topk``.

    Returns ``(sel, valid)``: sel[i] = column indices of row i's
    winners in rank order (ranks are the positions of True entries in
    valid[i], which is always a prefix — -inf entries sort last and are
    marked invalid)."""
    n, m = sims.shape
    kk = min(k, m)
    if kk == m:
        part = np.broadcast_to(np.arange(m), (n, m)).copy()
        part_s = sims
    else:
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        part_s = np.take_along_axis(sims, part, axis=1)
    kth = part_s.min(axis=1)
    order = np.lexsort((ids[part], -part_s), axis=1)
    sel = np.take_along_axis(part, order, axis=1)
    valid = np.isfinite(np.take_along_axis(part_s, order, axis=1))
    if kk < m:
        # boundary ties: the kth value occurs in the row more often than
        # in the selection -> the partition chose arbitrarily among ties
        total_eq = (sims == kth[:, None]).sum(axis=1)
        sel_eq = (part_s == kth[:, None]).sum(axis=1)
        for i in np.nonzero(total_eq > sel_eq)[0]:
            idx = _np_row_topk(sims[i], ids, k)
            valid[i] = False
            sel[i, : len(idx)] = idx
            valid[i, : len(idx)] = True
    return sel, valid


def _np_topk_flat(sims: np.ndarray, ids: np.ndarray, k: int):
    """``_np_topk_matrix`` flattened to output-ready arrays:
    (row_indices, nbr_ids, sims, ranks) over all rows' winners."""
    sel, valid = _np_topk_matrix(sims, ids, k)
    cnt = valid.sum(axis=1)
    rows = np.repeat(np.arange(sims.shape[0]), cnt)
    cols = sel[valid]
    ranks = (np.arange(valid.shape[1]) + 1)[None, :].repeat(valid.shape[0], 0)[valid]
    return rows, ids[cols], sims[rows, cols], ranks.astype("int32")


def knn_graph(
    df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "exact",
    n_lists: int = 32,
    n_probe: int = 3,
    max_exact_rows: int = 500_000,
    max_exact_bytes: int = 256_000_000,
    chunk_rows: int = 4096,
) -> DataFrame:
    """k-nearest-neighbor graph over one embedding corpus: for every
    vector, its ``k`` most-cosine-similar OTHER vectors, as
    (id_col, nbr_id, cosine_sim, rnk) with rnk in 1..k — the input to
    graph-based curation (SemDeDup verification, kNN-density quality
    scoring, label propagation). Ties broken exactly like
    ``row_number() OVER (ORDER BY sim DESC, id ASC)`` so results are
    partitioning-independent and SQL-replayable.

    Two paths:

    - ``method="exact"``: the corpus (ids, vectors, norms) is collected
      ONCE into a driver broadcast — bounded model state, gated BOTH on
      ``max_exact_rows`` and on estimated matrix bytes
      ``n_rows × dim × 8 ≤ max_exact_bytes`` (default 256 MB ≡ the
      documented 500k × dim 64 budget; dim is probed in the same job as
      the count, so a dim-768 corpus that would collect ~3 GB raises
      instead of OOM-ing the driver — the same budget class as
      ``brute_force_topk``'s broadcast query side) — then ONE
      narrow ``mapInPandas`` pass over the corpus computes chunked
      ``X @ C.T`` BLAS products and local exact top-k per row. Zero
      shuffles, zero per-pair rows: the n² similarity slab only ever
      exists ``chunk_rows`` rows at a time inside each task. Exact
      self-kNN is inherently O(n²·dim) compute; past the gate the
      answer is the IVF path, not a bigger cluster.
    - ``method="ivf"``: multi-probe inverted lists. Deterministic seed
      centroids (``_centroid_rows``, bounded n_lists × dim model
      state) are broadcast; one Arrow pass emits each vector into its
      ``n_probe`` nearest lists (flagging the nearest as its HOME
      list); one shuffle regroups by list (the corpus travels n_probe
      times — the standard IVF probe/recall trade); a per-list Arrow
      matmul scores probe members against HOME members only (each
      (q, nbr) pair is scored at most once because a neighbor's home
      list is unique) and emits per-list top-k candidates; a final
      window over ≤ n_probe × k candidate rows per vector takes the
      global top-k. Recall vs exact is asserted in tests.
    """
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    id_type = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("nbr_id", id_type),
            StructField("cosine_sim", DoubleType()),
            StructField("rnk", IntegerType()),
        ]
    )
    spark = df.sparkSession

    if method == "exact":
        stats = df.agg(
            F.count(F.lit(1)).alias("n"), F.max(F.size(F.col(vec_col))).alias("dim")
        ).first()
        n_corpus, dim = stats["n"], stats["dim"] or 0
        if n_corpus > max_exact_rows:
            raise ValueError(
                f"knn_graph exact path: corpus has {n_corpus} rows > "
                f"max_exact_rows={max_exact_rows}; use method='ivf'"
            )
        est_bytes = n_corpus * dim * 8
        if est_bytes > max_exact_bytes:
            raise ValueError(
                f"knn_graph exact path: corpus matrix is ~{est_bytes / 1e6:.0f} MB "
                f"({n_corpus} rows x dim {dim} f64) > max_exact_bytes="
                f"{max_exact_bytes}; use method='ivf'"
            )
        rows = sorted(df.select(id_col, vec_col).collect(), key=lambda r: r[0])
        if not rows:  # empty corpus: no neighbors to emit, np.stack would throw
            return spark.createDataFrame([], out_schema)
        ids_all = np.array([r[0] for r in rows])
        C = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
        cn = np.linalg.norm(C, axis=1)
        cn[cn == 0.0] = np.inf
        bc = spark.sparkContext.broadcast((ids_all, C, cn))

        def exact_batches(it):
            ids_a, Cm, cnorm = bc.value
            for pdf in it:
                if pdf.empty:
                    continue
                qids = pdf[id_col].to_numpy()
                X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()])
                xn = np.linalg.norm(X, axis=1)
                xn[xn == 0.0] = np.inf
                o_q, o_n, o_s, o_r = [], [], [], []
                for s in range(0, len(qids), chunk_rows):
                    e = min(s + chunk_rows, len(qids))
                    sims = (X[s:e] @ Cm.T) / np.outer(xn[s:e], cnorm)
                    # mask self (ids_a is sorted — one searchsorted per chunk)
                    pos = np.searchsorted(ids_a, qids[s:e])
                    ok = (pos < len(ids_a)) & (ids_a[np.clip(pos, 0, len(ids_a) - 1)] == qids[s:e])
                    sims[np.arange(e - s)[ok], pos[ok]] = -np.inf
                    r_i, nb, sv, rk = _np_topk_flat(sims, ids_a, k)
                    o_q.append(qids[s:e][r_i])
                    o_n.append(nb)
                    o_s.append(sv)
                    o_r.append(rk)
                if o_q:
                    yield pd.DataFrame(
                        {
                            id_col: np.concatenate(o_q),
                            "nbr_id": np.concatenate(o_n),
                            "cosine_sim": np.concatenate(o_s),
                            "rnk": np.concatenate(o_r).astype("int32"),
                        }
                    )

        out = df.select(id_col, vec_col).mapInPandas(exact_batches, out_schema)
        return out.select(id_col, "nbr_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rnk")

    if method != "ivf":
        raise ValueError(f"unknown knn_graph method {method!r}")

    cent_rows = sorted(
        _centroid_rows(df, id_col, vec_col, n_lists).collect(), key=lambda r: r["cent_seed"]
    )
    if not cent_rows:  # empty corpus
        return spark.createDataFrame([], out_schema)
    CT = np.stack([np.asarray(r["cvec"], dtype=np.float64) for r in cent_rows])
    ctn = np.linalg.norm(CT, axis=1)
    ctn[ctn == 0.0] = np.inf
    bc_c = spark.sparkContext.broadcast((CT, ctn))
    from pyspark.sql.types import BooleanType

    memb_schema = StructType(
        [
            StructField("list_id", IntegerType()),
            StructField("is_home", BooleanType()),
            StructField(id_col, id_type),
            StructField(vec_col, df.schema[vec_col].dataType),
        ]
    )

    def memberships(it):
        CTm, ctnorm = bc_c.value
        p = min(n_probe, CTm.shape[0])
        for pdf in it:
            if pdf.empty:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()])
            xn = np.linalg.norm(X, axis=1)
            xn[xn == 0.0] = np.inf
            sims = (X @ CTm.T) / np.outer(xn, ctnorm)
            # argsort by (-sim, list index) — lexsort is exact on ties
            order = np.lexsort((np.broadcast_to(np.arange(CTm.shape[0]), sims.shape), -sims), axis=1)
            probes = order[:, :p]
            # row-major ravel: row i's p probe lists are consecutive, so
            # np.repeat(..., p) lines ids/vectors up with probes.ravel()
            yield pd.DataFrame(
                {
                    "list_id": probes.ravel().astype("int32"),
                    "is_home": (probes == probes[:, :1]).ravel(),
                    id_col: np.repeat(pdf[id_col].to_numpy(), p),
                    vec_col: np.repeat(pdf[vec_col].to_numpy(), p),
                }
            )

    memb = df.select(id_col, vec_col).mapInPandas(memberships, memb_schema)

    def list_knn(pdf: pd.DataFrame) -> pd.DataFrame:
        home = pdf[pdf["is_home"]]
        if home.empty:
            return pd.DataFrame({id_col: [], "nbr_id": [], "cosine_sim": [], "rnk": []})
        h_ids = home[id_col].to_numpy()
        h_order = np.argsort(h_ids, kind="stable")
        h_ids = h_ids[h_order]
        H = np.stack([np.asarray(v, dtype=np.float64) for v in home[vec_col].to_numpy()])[h_order]
        hn = np.linalg.norm(H, axis=1)
        hn[hn == 0.0] = np.inf
        q_ids = pdf[id_col].to_numpy()
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()])
        qn = np.linalg.norm(Q, axis=1)
        qn[qn == 0.0] = np.inf
        sims = (Q @ H.T) / np.outer(qn, hn)
        pos = np.searchsorted(h_ids, q_ids)
        ok = (pos < len(h_ids)) & (h_ids[np.clip(pos, 0, len(h_ids) - 1)] == q_ids)
        sims[np.arange(len(q_ids))[ok], pos[ok]] = -np.inf
        r_i, nb, sv, _rk = _np_topk_flat(sims, h_ids, k)
        return pd.DataFrame(
            {
                id_col: q_ids[r_i],
                "nbr_id": nb,
                "cosine_sim": sv,
                # per-list rank is meaningless across probes — the global
                # window below recomputes it; keep the column shape only
                "rnk": np.zeros(len(r_i), dtype="int32"),
            }
        )

    cand = memb.groupBy("list_id").applyInPandas(list_knn, out_schema)
    w = Window.partitionBy(id_col).orderBy(F.col("cosine_sim").desc(), F.col("nbr_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "nbr_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rnk")
    )
