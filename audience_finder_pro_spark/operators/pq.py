"""Product quantization (E49): compressed-vector ANN for 100 TB stores.

IVF (operators/similarity.ivf_topk) cuts how MUCH of the corpus a query
scans; PQ cuts how BIG each scanned vector is. A dim-64 float32 vector
is 256 bytes; its PQ code at m=8 subspaces x 256 codes is 8 bytes — a
32x compression that turns a 25 TB embedding column into ~0.8 TB of
codes that fit executor memory and scan at memory bandwidth. This is
the standard second half of the production ANN stack (FAISS's IVF-PQ;
Jégou, Douze, Schmid 2011, "Product Quantization for Nearest Neighbor
Search") re-expressed on Spark:

- ``pq_fit`` trains per-subspace codebooks on a BOUNDED deterministic
  sample (lowest-id rows, the BPE-fit precedent: model state lives on
  the driver, never the corpus). Plain-numpy Lloyd iterations over
  sample_n x dim floats; the returned codebooks are m x n_codes x
  (dim/m) — kilobytes, shipped to executors inside the UDF closure.
- ``pq_encode`` maps the corpus to codes with ONE Arrow-batched
  argmin-matmul per subspace per batch (mapInPandas; no shuffle — codes
  land in the same partition as their source rows).
- ``pq_topk`` is the ADC (asymmetric distance computation) scan: per
  query, an m x n_codes lookup table of exact subspace distances to the
  UNCOMPRESSED query, then every candidate scores as m table lookups —
  numpy fancy-indexing over whole Arrow batches, never per-row Python.
  Per-partition top-k shrinks the wire to k rows per (query, partition)
  before the exact global top-k.

Cosine semantics via the unit sphere: vectors are L2-normalized before
fit/encode/search (||q-c||^2 = 2 - 2cos on unit vectors, a monotone
map), and the reported ``approx_sim = 1 - d2/2`` is directly comparable
to the exact operators' cosine. NO SQL oracle by taxonomy (trained
quantizer + Arrow path — the IVF/BPE precedent); gated by planted-
recall, determinism, reconstruction-monotonicity and compression tests
plus a factor-scale stress leg.

Choosing m (the accuracy/compression dial): quantization error must
resolve the gap between true neighbors, not just between clusters.
Measured at 1M dim-64 vectors in 64 dense clusters (the hard regime —
top-10 live among ~15k near-identical neighbors;
scripts/ann_scale_stress.py): m=8 (32x compression) is candidate
generation only (recall@10 0.24 at rerank x5), m=16 reads 0.82 at x50,
m=32 (8x) reads 1.000 at x20. On the looser fixture embeddings m=8
reads 0.885 at x5. Start at m = dim/2 for within-cluster ranking and
drop toward dim/8 when the corpus is the bottleneck.

Reference parity: the reference app has no vector search at all (its
audience scoring is exact tag arithmetic, app.py:222-258); this op
exists for the engine's own 100 TB similarity tier, alongside
similarity.ivf_topk (same declared-extension family as E17 BPE).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["pq_fit", "pq_encode", "pq_topk", "pq_reconstruction_mse", "ivfpq_topk"]


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def _check_geometry(dim: int, m: int, n_codes: int) -> int:
    if dim % m != 0:
        raise ValueError(f"pq: dim={dim} not divisible by m={m} subspaces")
    if not 2 <= n_codes <= 256:
        raise ValueError(f"pq: n_codes={n_codes} out of [2, 256] (codes are bytes)")
    return dim // m


def pq_fit(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 256,
    sample_n: int = 10_000,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train PQ codebooks: (m, n_codes, dim/m) float64 — driver model
    state (~m*n_codes*dim/m*8 bytes; 131 KB at the defaults).

    Deterministic end to end: the fit sample is the ``sample_n``
    LOWEST-ID vectors (stable under partitioning — the BPE/IVF-seed
    rule), k-means seeds are the first ``n_codes`` sample subvectors,
    and Lloyd runs a FIXED ``iters`` sweeps (no convergence race).
    Empty clusters keep their previous centroid. The sample bound is
    the scale contract: fitting reads sample_n x dim floats onto the
    driver, never the corpus."""
    sub_dim = _check_geometry(dim, m, n_codes)
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_n)
        .collect()
    )
    if len(rows) < n_codes:
        raise ValueError(
            f"pq_fit: sample has {len(rows)} rows < n_codes={n_codes}"
        )
    sample = _normalize_rows(
        np.array([r[1] for r in rows], dtype=np.float64)
    )
    return _fit_codebooks(sample, m, n_codes, iters)


def _fit_codebooks(
    sample: np.ndarray, m: int, n_codes: int, iters: int
) -> np.ndarray:
    """Per-subspace Lloyd over an ALREADY-prepared sample matrix —
    normalized vectors for plain PQ, (vector - centroid) residuals for
    IVF-PQ residual codebooks. Deterministic: first-n seeds, fixed
    iters, empty clusters keep their previous centroid."""
    sub_dim = sample.shape[1] // m
    books = np.empty((m, n_codes, sub_dim), dtype=np.float64)
    for j in range(m):
        x = sample[:, j * sub_dim : (j + 1) * sub_dim]  # (n, sub_dim)
        cents = x[:n_codes].copy()
        for _ in range(iters):
            # (n, n_codes) squared distances via ||x||^2 - 2x.c + ||c||^2
            d2 = (
                (x * x).sum(axis=1, keepdims=True)
                - 2.0 * (x @ cents.T)
                + (cents * cents).sum(axis=1)
            )
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                mask = assign == c
                if mask.any():
                    cents[c] = x[mask].mean(axis=0)
        books[j] = cents
    return books


def _codes_schema(id_field: T.StructField) -> T.StructType:
    return T.StructType([id_field, T.StructField("codes", T.ArrayType(T.ShortType()))])


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode the corpus to PQ codes: (id_col, codes array<short>, one
    entry per subspace). Zero shuffle — each partition encodes in place
    with one argmin-matmul per subspace per Arrow batch; the codebooks
    ride the closure (kilobytes)."""
    m, n_codes, sub_dim = codebooks.shape
    dim = m * sub_dim
    books = codebooks.copy()
    bnorm2 = (books * books).sum(axis=2)  # (m, n_codes)
    id_field = corpus.select(id_col).schema.fields[0]
    out_schema = _codes_schema(id_field)

    def encode(batches):
        for pdf in batches:
            vecs = _normalize_rows(
                np.array(pdf[vec_col].tolist(), dtype=np.float64).reshape(
                    len(pdf), dim
                )
            )
            codes = np.empty((len(pdf), m), dtype=np.int16)
            for j in range(m):
                x = vecs[:, j * sub_dim : (j + 1) * sub_dim]
                # ||x||^2 is constant per row across codes - argmin ignores it
                codes[:, j] = (bnorm2[j] - 2.0 * (x @ books[j].T)).argmin(axis=1)
            yield pd.DataFrame(
                {id_field.name: pdf[id_col], "codes": list(codes)}
            )

    return corpus.select(id_col, vec_col).mapInPandas(encode, schema=out_schema)


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    refine_with: DataFrame | None = None,
    refine_factor: int = 5,
    dim: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over PQ codes: (query_id, vec_id, approx_sim, rank).

    The query set is collected and broadcast inside the UDF closure
    (bounded: queries are the small side by contract — the
    brute_force_topk convention). Each partition scores ALL queries
    against its codes in one fancy-indexed numpy sum and emits only its
    per-query top-k; the global exact top-k then orders k x n_partitions
    rows per query. approx_sim = 1 - d2/2 (unit-sphere identity), the
    PQ estimate of cosine — ties break on lowest vec_id, so results are
    partitioning-independent.

    ``refine_with`` enables the standard ADC+rerank form: the ADC pass
    retrieves ``k * refine_factor`` candidates per query, the TRUE
    vectors of just those candidates come back via one id semi-join
    against the uncompressed corpus, and the exact cosine reranks them
    (then ``approx_sim`` IS the exact cosine, rounded like the exact
    operators). The rerank reads |queries| x k x refine_factor vectors —
    bounded by the answer size, not the corpus; this is how PQ recall
    approaches exact while the corpus-wide scan still touches only
    codes (measured on the fixture: 0.46 ADC-only -> 0.98 at factor 5)."""
    m, n_codes, sub_dim = codebooks.shape
    if dim is not None and dim != m * sub_dim:
        raise ValueError(
            f"pq_topk: dim={dim} disagrees with the codebooks' geometry "
            f"m*sub_dim={m * sub_dim}"
        )
    dim = m * sub_dim
    books = codebooks.copy()
    qrows = queries.select(query_id_col, query_vec_col).collect()
    if not qrows:
        raise ValueError("pq_topk: empty query set")
    qids = [r[0] for r in qrows]
    qmat = _normalize_rows(np.array([r[1] for r in qrows], dtype=np.float64))
    # LUT: (Q, m, n_codes) exact squared distances query-subvector -> code
    lut = np.empty((len(qids), m, n_codes), dtype=np.float64)
    for j in range(m):
        qx = qmat[:, j * sub_dim : (j + 1) * sub_dim]  # (Q, sub_dim)
        lut[:, j, :] = (
            (qx * qx).sum(axis=1, keepdims=True)
            - 2.0 * (qx @ books[j].T)
            + (books[j] * books[j]).sum(axis=1)
        )

    id_field = codes.select(id_col).schema.fields[0]
    qid_field = queries.select(query_id_col).schema.fields[0]
    out_schema = T.StructType(
        [
            T.StructField(query_id_col, qid_field.dataType),
            T.StructField(id_col, id_field.dataType),
            T.StructField("_d2", T.DoubleType()),
        ]
    )

    adc_k = k if refine_with is None else k * refine_factor

    def scan(batches):
        for pdf in batches:
            cmat = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (B, m)
            ids = pdf[id_col].to_numpy()
            # score all queries x batch: sum_j lut[q, j, code[b, j]]
            d2 = np.zeros((len(qids), len(pdf)), dtype=np.float64)
            for j in range(m):
                d2 += lut[:, j, cmat[:, j]]
            top = min(adc_k, len(pdf))
            # per-batch partial top-k with (d2, id) lexical tie-break:
            # argpartition splits exact-d2 ties at the cut arbitrarily
            # (common in PQ — shared codes mean identical distances), so
            # widen the selection to EVERY row at or under the boundary
            # value before the lexical (d2, id) order truncates to top —
            # otherwise a lower-id tied candidate can be pruned in favor
            # of a higher-id one and the result depends on partitioning
            for qi, qid in enumerate(qids):
                row = d2[qi]
                cut = row[np.argpartition(row, top - 1)[:top]].max()
                sel = np.flatnonzero(row <= cut)
                order = sel[np.lexsort((ids[sel], row[sel]))][:top]
                yield pd.DataFrame(
                    {
                        query_id_col: [qid] * top,
                        id_col: ids[order],
                        "_d2": row[order],
                    }
                )

    partial = codes.mapInPandas(scan, schema=out_schema)
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("_d2").asc(), F.col(id_col).asc()
    )
    adc_top = (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= adc_k)
    )
    if refine_with is None:
        return adc_top.select(
            query_id_col,
            id_col,
            F.round(1.0 - F.col("_d2") / 2.0, 6).alias("approx_sim"),
            "rank",
        )

    from audience_finder_pro_spark.operators.similarity import (
        _exact_topk,
        _pair_cosine,
        _with_norm,
    )

    cand = adc_top.select(query_id_col, id_col).join(
        refine_with.select(id_col, vec_col), id_col
    )
    qn = _with_norm(
        queries.select(query_id_col, query_vec_col), query_vec_col, "_qn", dim
    )
    scored = _with_norm(
        cand.join(F.broadcast(qn), query_id_col), vec_col, "_cn", dim
    ).select(
        query_id_col,
        id_col,
        _pair_cosine(
            F.col(query_vec_col), F.col(vec_col), "_qn", "_cn", dim
        ).alias("cosine_sim"),
    )
    reranked = _exact_topk(scored, k, query_id_col, id_col)
    return reranked.select(
        query_id_col,
        id_col,
        F.col("cosine_sim").alias("approx_sim"),
        F.col("rnk").alias("rank"),
    )


def pq_reconstruction_mse(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Mean squared reconstruction error of the quantizer over the given
    vectors (normalized space) — the fit-quality metric: more codes per
    subspace must not increase it (asserted in tests). One distributed
    encode + a numpy reduction per batch; returns a driver scalar."""
    m, n_codes, sub_dim = codebooks.shape
    dim = m * sub_dim
    books = codebooks.copy()
    bnorm2 = (books * books).sum(axis=2)
    out_schema = T.StructType(
        [T.StructField("sse", T.DoubleType()), T.StructField("n", T.LongType())]
    )

    def err(batches):
        for pdf in batches:
            vecs = _normalize_rows(
                np.array(pdf[vec_col].tolist(), dtype=np.float64).reshape(
                    len(pdf), dim
                )
            )
            sse = 0.0
            for j in range(m):
                x = vecs[:, j * sub_dim : (j + 1) * sub_dim]
                d2 = (
                    (x * x).sum(axis=1, keepdims=True)
                    - 2.0 * (x @ books[j].T)
                    + bnorm2[j]
                )
                sse += float(np.maximum(d2.min(axis=1), 0.0).sum())
            yield pd.DataFrame({"sse": [sse], "n": [len(pdf)]})

    agg = (
        corpus.select(id_col, vec_col)
        .mapInPandas(err, schema=out_schema)
        .agg(F.sum("sse").alias("sse"), F.sum("n").alias("n"))
        .first()
    )
    return float(agg["sse"]) / max(int(agg["n"]), 1)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 256,
    sample_n: int = 10_000,
    iters: int = 8,
    refine_factor: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    dim: int | None = None,
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ (E57): centroid routing x compressed scan x exact rerank —
    the composition production ANN stacks actually deploy (FAISS
    IndexIVFPQ): IVF cuts WHICH fraction of the corpus a query touches
    (~n_probe/n_lists), PQ cuts how BIG each touched vector is (m bytes),
    and the rerank restores exact cosine on the bounded candidate pool.
    At 100 TB the three multiply: a 25 TB embedding column becomes
    ~0.8 TB of codes of which each query scans a quarter-list fraction.

    Build: IVF centroids + assignment reuse `similarity`'s deterministic
    seeded machinery; PQ codebooks fit on the bounded lowest-id sample;
    the corpus encodes ONCE into (id, cent_id, codes) — no shuffle, the
    codes stay where their rows are. Search: queries probe their
    n_probe nearest centroids exactly (broadcast centroid table), and
    the ADC scan masks each Arrow batch to rows whose cent_id is in the
    probing query's list set — the same zero-shuffle whole-corpus-codes
    pass as `pq_topk`, but each query scores only its probed fraction.
    Rerank as in `pq_topk` (exact cosine over k x refine_factor ids).

    By default codes quantize the (normalized) vectors directly — one
    codebook, one LUT per query. ``residual=True`` is the FAISS-style
    refinement: codes quantize (normalized vector − its list's
    normalized centroid), whose norms are cluster-noise-sized, so the
    same m bytes resolve much finer structure; the scan then builds one
    LUT per (query, probed list) from (q̂ − ĉ_list), and
    d2(q̂−ĉ, v̂−ĉ) = ||q̂ − v̂||² stays exactly the unit-sphere
    quantity, so ``approx_sim = 1 − d2/2`` is unchanged. Cost: n_probe
    LUTs per query instead of one (still bounded driver state) and a
    centroid matrix in the encode closure. Use it when rerank bandwidth
    binds at compression-heavy m. The measured boundary (r11 ledger,
    scripts/ann_scale_stress.py + scripts/residual_regime.py): residual
    earns its cost when the COARSE-CELL COUNT approaches or exceeds
    n_codes — direct codes then spend their capacity re-encoding which
    cell a vector is in (which routing already knows): at 1,024 cells /
    256 codes, m=8 rerank ×5 reads 0.515 residual vs 0.370 direct. With
    few cells (16–64 ≪ 256 codes) the per-subspace k-means allocates
    codes within clusters on its own and the two tie (0.27 vs 0.24
    noise-dominated; 0.43 vs 0.44 tight-cluster) — there the m=32
    geometry, not residual coding, is the recall answer.
    Returns (query_id, vec_id, approx_sim, rank)."""
    from audience_finder_pro_spark.operators.similarity import (
        _assign,
        _centroid_rows,
    )
    from pyspark.sql import Window

    if dim is None:
        first = corpus.select(vec_col).first()
        if first is None or first[0] is None:
            raise ValueError(
                "ivfpq_topk: cannot infer dim from an empty corpus — "
                "pass dim explicitly or provide a non-empty corpus"
            )
        dim = len(first[0])
    sub_dim = _check_geometry(dim, m, n_codes)
    full_dim = m * sub_dim

    cents = (
        _centroid_rows(corpus, id_col, vec_col, n_lists)
        .withColumn("cent_id", F.row_number().over(Window.orderBy("cent_seed")) - 1)
        .select("cent_id", "cvec")
    )
    assigned = _assign(corpus.select(id_col, vec_col), cents, vec_col, dim=full_dim)

    cmat = None
    if residual:
        # normalized centroid matrix: bounded model state (n_lists x dim)
        crows = cents.orderBy("cent_id").collect()
        cmat = _normalize_rows(
            np.array([r["cvec"] for r in crows], dtype=np.float64)
        )
        # fit on lowest-id RESIDUALS (same bounded-sample rule as pq_fit)
        srows = (
            corpus.select(id_col, vec_col)
            .join(assigned.select(id_col, "cent_id"), id_col)
            .orderBy(id_col)
            .limit(sample_n)
            .collect()
        )
        if len(srows) < n_codes:
            raise ValueError(
                f"ivfpq_topk: sample has {len(srows)} rows < n_codes={n_codes}"
            )
        smat = _normalize_rows(
            np.array([r[vec_col] for r in srows], dtype=np.float64)
        ) - cmat[[int(r["cent_id"]) for r in srows]]
        books = _fit_codebooks(smat, m, n_codes, iters)

        # encode residuals in place: one argmin-matmul per subspace per
        # Arrow batch, centroids + codebooks ride the closure (kilobytes)
        id_field = corpus.select(id_col).schema.fields[0]
        enc_schema = T.StructType(
            [
                id_field,
                T.StructField("cent_id", T.IntegerType()),
                T.StructField("codes", T.ArrayType(T.ShortType())),
            ]
        )
        bnorm2 = (books * books).sum(axis=2)  # (m, n_codes)
        C = cmat

        def encode_res(batches):
            for pdf in batches:
                vecs = _normalize_rows(
                    np.array(pdf[vec_col].tolist(), dtype=np.float64).reshape(
                        len(pdf), full_dim
                    )
                )
                cid = pdf["cent_id"].to_numpy().astype(np.int64)
                res = vecs - C[cid]
                out = np.empty((len(pdf), m), dtype=np.int16)
                for j in range(m):
                    x = res[:, j * sub_dim : (j + 1) * sub_dim]
                    out[:, j] = (bnorm2[j] - 2.0 * (x @ books[j].T)).argmin(axis=1)
                yield pd.DataFrame(
                    {
                        id_field.name: pdf[id_col],
                        "cent_id": cid.astype(np.int32),
                        "codes": list(out),
                    }
                )

        codes = (
            corpus.select(id_col, vec_col)
            .join(assigned.select(id_col, "cent_id"), id_col)
            .mapInPandas(encode_res, schema=enc_schema)
        )
    else:
        books = pq_fit(
            corpus, dim=full_dim, m=m, n_codes=n_codes,
            sample_n=sample_n, iters=iters, id_col=id_col, vec_col=vec_col,
        )
        enc = pq_encode(
            corpus.select(id_col, vec_col), books, id_col=id_col, vec_col=vec_col
        )
        codes = enc.join(assigned.select(id_col, "cent_id"), id_col)

    # exact per-query probe list (broadcast centroids — n_lists rows)
    from audience_finder_pro_spark.functions.vectors import cosine_similarity

    qscored = queries.crossJoin(F.broadcast(cents)).withColumn(
        "_sim", cosine_similarity(F.col(query_vec_col), F.col("cvec"), dim=full_dim)
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("_sim").desc(), F.col("cent_id")
    )
    probes = (
        qscored.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= n_probe)
        .select(query_id_col, "cent_id")
        .collect()
    )
    probe_lists: dict = {}
    for r in probes:
        probe_lists.setdefault(r[0], set()).add(int(r[1]))

    qrows = queries.select(query_id_col, query_vec_col).collect()
    if not qrows:
        raise ValueError("ivfpq_topk: empty query set")
    qids = [r[0] for r in qrows]
    qmat = _normalize_rows(np.array([r[1] for r in qrows], dtype=np.float64))

    def _lut_for(qx_mat: np.ndarray) -> np.ndarray:
        out = np.empty((len(qx_mat), m, n_codes), dtype=np.float64)
        for j in range(m):
            qx = qx_mat[:, j * sub_dim : (j + 1) * sub_dim]
            out[:, j, :] = (
                (qx * qx).sum(axis=1, keepdims=True)
                - 2.0 * (qx @ books[j].T)
                + (books[j] * books[j]).sum(axis=1)
            )
        return out

    if residual:
        # one LUT per (query, probed list) PAIR, from the query's
        # residual against THAT list's centroid — bounded driver state
        # (|queries| x n_probe x m x n_codes doubles). Scans are fully
        # FLATTENED (r12, VERDICT r11 ask #5): every batch scores ALL
        # its (pair, row) combinations in ONE fancy-indexed gather —
        # the r11 per-(query, list) python loop cost ~35% over direct
        # at 1,024 lists and a first per-list batching still ~16%, both
        # pure loop overhead on tiny slices.
        pair_ids: dict = {}  # list id -> np.array of pair indices
        pair_q: list = []  # pair index -> query index
        pair_luts: list = []
        for qi, qid in enumerate(qids):
            for l in sorted(probe_lists.get(qid, ())):
                pair_ids.setdefault(l, []).append(len(pair_q))
                pair_q.append(qi)
                pair_luts.append(_lut_for((qmat[qi] - cmat[l])[None, :])[0])
        pair_ids = {l: np.array(ps, dtype=np.int64) for l, ps in pair_ids.items()}
        pair_q = np.array(pair_q, dtype=np.int64)
        lut_flat = (
            np.stack(pair_luts) if pair_luts else np.empty((0, m, n_codes))
        )
        lut = None
    else:
        lut = _lut_for(qmat)

    adc_k = k * refine_factor
    id_field = codes.select(id_col).schema.fields[0]
    qid_field = queries.select(query_id_col).schema.fields[0]
    out_schema = T.StructType(
        [
            T.StructField(query_id_col, qid_field.dataType),
            T.StructField(id_col, id_field.dataType),
            T.StructField("_d2", T.DoubleType()),
        ]
    )

    def scan(batches):
        for pdf in batches:
            code_mat = np.array(pdf["codes"].tolist(), dtype=np.int64)
            ids = pdf[id_col].to_numpy()
            cent = pdf["cent_id"].to_numpy()
            if residual:
                # ONE gather per batch: rows grouped by list (stable
                # sort keeps in-list row order), (pair, row) index pairs
                # built per active list with pairs in list-ascending /
                # query-insertion order — so after the stable per-query
                # regroup the candidate sequence, and the tie-broken
                # output, is bit-identical to the per-(query, list) form
                parts_d2: dict = {}
                parts_id: dict = {}
                order_rows = np.argsort(cent, kind="stable")
                cs = cent[order_rows]
                uniq, starts = np.unique(cs, return_index=True)
                bounds = np.append(starts[1:], len(cs))
                pair_chunks, row_chunks = [], []
                for l, s, e in zip(uniq, starts, bounds):
                    ps = pair_ids.get(int(l))
                    if ps is None:
                        continue
                    ridx = order_rows[s:e]
                    pair_chunks.append(np.repeat(ps, len(ridx)))
                    row_chunks.append(np.tile(ridx, len(ps)))
                if pair_chunks:
                    p_arr = np.concatenate(pair_chunks)
                    r_arr = np.concatenate(row_chunks)
                    codes_sel = code_mat[r_arr]  # (N, m)
                    # (N, m) fancy-index — no (N, m, n_codes) temporary
                    sc = lut_flat[
                        p_arr[:, None], np.arange(m)[None, :], codes_sel
                    ].sum(axis=1)
                    q_arr = pair_q[p_arr]
                    qorder = np.argsort(q_arr, kind="stable")
                    qs_sorted = q_arr[qorder]
                    qu, qstarts = np.unique(qs_sorted, return_index=True)
                    qbounds = np.append(qstarts[1:], len(qs_sorted))
                    for qi, s2, e2 in zip(qu, qstarts, qbounds):
                        sel2 = qorder[s2:e2]
                        parts_d2[int(qi)] = [sc[sel2]]
                        parts_id[int(qi)] = [ids[r_arr[sel2]]]
            for qi, qid in enumerate(qids):
                if residual:
                    if qi not in parts_d2:
                        continue
                    rows_d2 = np.concatenate(parts_d2[qi])
                    mids = np.concatenate(parts_id[qi])
                else:
                    mask = np.isin(cent, list(probe_lists.get(qid, ())))
                    if not mask.any():
                        continue
                    rows_d2 = lut[qi, np.arange(m), code_mat[mask]].sum(axis=1)
                    mids = ids[mask]
                top = min(adc_k, len(mids))
                # widen past argpartition's arbitrary boundary-tie split
                # before the (d2, id) lexical truncation (see pq_topk)
                cut = rows_d2[np.argpartition(rows_d2, top - 1)[:top]].max()
                sel = np.flatnonzero(rows_d2 <= cut)
                order = sel[np.lexsort((mids[sel], rows_d2[sel]))][:top]
                yield pd.DataFrame(
                    {
                        query_id_col: [qid] * top,
                        id_col: mids[order],
                        "_d2": rows_d2[order],
                    }
                )

    partial = codes.mapInPandas(scan, schema=out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("_d2").asc(), F.col(id_col).asc()
    )
    adc_top = partial.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= adc_k
    )

    from audience_finder_pro_spark.operators.similarity import (
        _exact_topk,
        _pair_cosine,
        _with_norm,
    )

    cand = adc_top.select(query_id_col, id_col).join(
        corpus.select(id_col, vec_col), id_col
    )
    qn = _with_norm(
        queries.select(query_id_col, query_vec_col), query_vec_col, "_qn", full_dim
    )
    scored = _with_norm(
        cand.join(F.broadcast(qn), query_id_col), vec_col, "_cn", full_dim
    ).select(
        query_id_col,
        id_col,
        _pair_cosine(
            F.col(query_vec_col), F.col(vec_col), "_qn", "_cn", full_dim
        ).alias("cosine_sim"),
    )
    reranked = _exact_topk(scored, k, query_id_col, id_col)
    return reranked.select(
        query_id_col,
        id_col,
        F.col("cosine_sim").alias("approx_sim"),
        F.col("rnk").alias("rank"),
    )
