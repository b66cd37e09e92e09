"""Deterministic sampling / splitting / mixture weighting for training data.

A 100 TB curation pipeline needs reproducible answers to "which split is
this doc in?" and "does this doc survive the source's mixture weight?" —
answers that cannot depend on partitioning, row order, or a seed file.
Everything here keys on a salted md5 of the row's id:

    bucket = int(hex(md5(salt || ':' || id))[:15]) % 10_000

md5 (not xxhash64) so DuckDB oracles compute the identical value; the
15-hex-digit prefix fits a signed 64-bit int in both engines. Each
concern uses its own salt, so split assignment and mixture sampling are
independent coin flips — subsampling a source never biases its
train/val/test proportions.

All pure expressions (one projection, no shuffle, no UDF): at scale the
sample/split is a pushable filter on top of the scan, and the same row
always lands in the same split on any cluster, any partitioning, any
engine version.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000  # rate resolution: 0.01%


def hash_bucket(id_col: Column | str, salt: str, buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from a salted md5 of the id."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, 15), 16, 10)
    return F.pmod(h.cast("long"), F.lit(buckets))


def hash_bucket_sql(id_expr: str, salt: str, buckets: int = BUCKETS) -> str:
    """DuckDB expression computing the identical bucket (oracle side)."""
    return (
        f"CAST(concat('0x', substr(md5('{salt}:' || CAST({id_expr} AS VARCHAR)), 1, 15))"
        f" AS BIGINT) % {buckets}"
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` column assigning each row to a named fraction
    (default 90/5/5 train/val/test). Fractions must sum to 1."""
    splits = splits or {"train": 0.90, "val": 0.05, "test": 0.05}
    if abs(sum(splits.values()) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {splits}")
    b = hash_bucket(id_col, salt)
    names = list(splits)
    expr, lo = None, 0
    # The last split is the .otherwise() arm: rounded boundaries (e.g.
    # {1/3,1/3,1/3} -> cumulative hi 9999) must not leave bucket
    # BUCKETS-1 falling through every when() to a NULL split.
    for name in names[:-1]:
        hi = lo + round(splits[name] * BUCKETS)
        cond = b < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def mixture_sample(
    df: DataFrame,
    rate: Column,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Adds a ``sampled`` flag: row survives iff its bucket falls under
    ``rate`` (a per-row Column in [0,1] — e.g. a per-source mixture
    weight). Integer compare against rate·BUCKETS so engines can't
    disagree on a float boundary."""
    b = hash_bucket(id_col, salt)
    return df.withColumn("sampled", b < F.round(rate * BUCKETS).cast("long"))


def quantile_bins(
    df: DataFrame,
    score_col: str,
    n_bins: int = 10,
    accuracy: int = 10000,
) -> DataFrame:
    """Adds a ``bin`` column (0..n_bins-1) assigning each row to its
    global quantile bucket of ``score_col`` — curriculum / quality-tier
    binning ("train on the top 3 deciles first") without a global sort.

    Scale shape: the naive form — ``ntile(n)`` over a global ordered
    window — is a single-partition window (the pack_documents
    anti-pattern). Instead the n_bins-1 interior cutoffs come from ONE
    ``percentile_approx`` aggregate (Greenwald-Khanna mergeable sketch,
    map-side combined, one row out) broadcast back over the frame, and
    bin assignment is a pure projection counting cutoffs ≤ score
    (``F.aggregate`` over the tiny cutoff array — n_bins-1 elements, not
    a per-token hot path). Two narrow passes over the scan, zero wide
    shuffles, no sort anywhere.

    Bins are approximate at sketch precision: boundary rows within
    rank-error n/accuracy of a cutoff may land one bin off; bin
    populations are equal to within that error. NULL scores get bin
    NULL.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    probs = [i / n_bins for i in range(1, n_bins)]
    cuts = df.agg(
        F.percentile_approx(score_col, probs, accuracy).alias("cuts")
    )
    s = F.col(score_col)
    bin_expr = F.when(
        s.isNotNull(),
        F.aggregate(
            "cuts",
            F.lit(0),
            lambda acc, c: acc + F.when(s >= c, 1).otherwise(0),
        ),
    )
    return df.crossJoin(F.broadcast(cuts)).withColumn("bin", bin_expr).drop("cuts")


def stratified_sample_k(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "ksample",
) -> DataFrame:
    """Deterministic k-per-group sample (eval-set construction: "exactly 3
    docs from every source, reproducibly"): rows ordered inside each group
    by the salted md5 of their id (a fair, partitioning-independent coin)
    with the id itself as tiebreaker, first k kept, rank exposed as
    ``sample_rank`` (1..k).

    Scale shape: one window keyed on the group column — Spark's
    InferWindowGroupLimit prunes each map partition to k rows per group
    BEFORE the exchange, so the shuffle carries ≤ n_partitions × groups
    × k rows, not the corpus. Unlike fraction-based ``mixture_sample``
    this guarantees exact counts; unlike ``df.sampleBy`` it needs no seed
    state and reproduces bit-identically in SQL (md5 order), so the
    DuckDB oracle computes the same sample.
    """
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return df.withColumn("sample_rank", F.row_number().over(w)).filter(
        F.col("sample_rank") <= k
    )


def mixture_weights(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-scaled per-source sampling weights — the Pile/GPT-3
    mixture rule: weight_s ∝ (token_share_s)^alpha, renormalized.
    alpha=1 reproduces natural proportions; alpha→0 flattens toward
    uniform, up-weighting small high-quality sources. The output feeds
    ``mixture_sample`` (rate = weight / raw_share caps each source's
    effective epochs) or a sampler's per-source rates directly.

    Returns one row per group: (group_col, n_docs, n_tokens, raw_share,
    weight) with both share columns summing to 1.

    Scale shape: ONE map-side-combined aggregate computes per-source doc
    and token totals (token counts via ``size(tokens(text))`` — a per-row
    projection, no explode, no token-stream shuffle); the normalizing
    totals are a second aggregate over the sources-sized frame entering
    via broadcast NLJ. Nothing driver-side, nothing proportional to
    corpus bytes except the single scan.
    """
    from audience_finder_pro_spark.functions.text import tokens

    per_src = docs.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(text_col))).cast("long").alias("n_tokens"),
    )
    scaled = per_src.withColumn("pw", F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha))))
    totals = scaled.agg(
        F.sum("n_tokens").alias("tot_tokens"), F.sum("pw").alias("tot_pw")
    )  # 1 row → broadcast NLJ
    return scaled.crossJoin(F.broadcast(totals)).select(
        group_col,
        "n_docs",
        "n_tokens",
        # ANSI guard: an all-empty corpus slice makes both totals 0 —
        # NULL shares on degenerate input, not a DIVIDE_BY_ZERO
        F.when(F.col("tot_tokens") > 0, F.col("n_tokens") / F.col("tot_tokens")).alias(
            "raw_share"
        ),
        F.when(F.col("tot_pw") > 0, F.col("pw") / F.col("tot_pw")).alias("weight"),
    )


def gumbel_topk(
    df: DataFrame,
    k: int,
    score_col: str = "score",
    id_col: str = "doc_id",
    temperature: float = 1.0,
    salt: str = "gumbel",
) -> DataFrame:
    """Gumbel-top-k importance resampling — the selection step DSIR
    publishes (Xie et al. 2023 §2.3): drawing k rows WITHOUT replacement
    with probability ∝ exp(score / temperature) is exactly taking the
    top k of ``score/T + Gumbel(0,1)`` noise. The noise is derandomized
    through the module's salted-md5 uniform (u = (h + 0.5) / 16^15,
    g = -ln(-ln(u))), so the draw is deterministic, partitioning-
    independent, and bit-reproducible in SQL — an auditable sample, not
    a `rand()` one.

    Returns the k selected rows with their ``gumbel_key`` (4 dp). Higher
    temperature flattens toward uniform sampling; T→0 degenerates to
    plain top-k by score. Scale shape: one projection plus a global
    top-k, which Catalyst executes as TakeOrderedAndProject (map-side
    partial top-k per partition, k rows per partition on the wire — no
    global sort, no single-partition window).
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 15),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(16**15))
    key = F.col(score_col) / F.lit(float(temperature)) - F.log(-F.log(u))
    return (
        df.withColumn("gumbel_key", key)
        .orderBy(F.desc("gumbel_key"), id_col)
        .limit(k)
        .withColumn("gumbel_key", F.round("gumbel_key", 4))
    )


def split_leakage_audit(
    split_df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Cross-split near-duplicate leakage audit (E47): the benchmark-
    hygiene check every train/val/test split needs — a near-duplicate
    pair STRADDLING splits means eval rows leak into training (the
    within-corpus counterpart of E7's benchmark decontamination; the
    deterministic split alone, E4, cannot see content duplication).

    ``split_df`` carries (id, split) — e.g. ``hash_split``'s output;
    ``pairs`` is near-dup evidence (id_a, id_b) from any dedup tier
    (ngram-Jaccard for SQL replay; MinHash-LSH at 100 TB). Returns
    (split_a, split_b, n_pairs, is_leak) with the split pair in
    canonical (least, greatest) order so pair orientation can't split
    a group.

    Scale shape: two id-keyed shuffle equi-joins of the (bounded)
    verified-pair set against the narrow (id, split) projection, one
    map-side-combined count over ≤ |splits|² groups — the same
    pair-remnant economics as source_overlap."""
    a = split_df.select(F.col(id_col).alias("id_a"), F.col(split_col).alias("_sa"))
    b = split_df.select(F.col(id_col).alias("id_b"), F.col(split_col).alias("_sb"))
    joined = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    return (
        joined.groupBy(
            F.least("_sa", "_sb").alias("split_a"),
            F.greatest("_sa", "_sb").alias("split_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn(
            "is_leak", (F.col("split_a") != F.col("split_b")).cast("int")
        )
    )


def diverse_sample(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 10_000,
) -> DataFrame:
    """k-center greedy (farthest-point) diverse subset over an embedding
    column (E62): eval-set construction — k documents that COVER the
    corpus's semantic spread instead of redrawing its majority modes,
    which is what any frequency-proportional sampler (E15/E28) does by
    design. Greedy farthest-point is the classic 2-approximation of the
    optimal k-center radius (Gonzalez 1985).

    Determinism and scale contract (the BPE/PQ-fit precedent): the
    greedy is inherently sequential (each pick needs min-distances to
    every prior pick), so it runs driver-side over the ``sample_n``
    LOWEST-ID vectors — bounded model state, stable under partitioning —
    seeded at the lowest id, distance ties broken to the lowest id.
    The returned centers are the model artifact; corpus-wide COVERAGE
    (nearest-center assignment) is the distributed read half and stays
    a broadcast-argmax projection (see `diverse_eval_sample`'s query).

    Returns (id_col, pick_order, dist_at_pick): dist_at_pick is the
    cosine distance from the pick to the nearest EARLIER pick (the
    covering-radius trajectory — decreasing, and pick k's value is the
    radius certificate: every sampled point sits within it of some
    center). pick_order 0 is the seed (dist NULL). Picked rows leave
    the candidate pool, so the k returned ids are always distinct; if
    the sample has fewer than k distinct VECTORS, the tail picks are
    duplicate vectors of earlier centers at dist_at_pick 0 — an honest
    "spread exhausted" reading, never a repeated id (r11 ADVICE)."""
    import numpy as np

    if k < 1:
        raise ValueError("diverse_sample needs k >= 1")
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(sample_n).collect()
    if not rows:
        # empty source (a fresh partition, an all-filtered shard): the
        # standard empty-input degradation — an empty frame with the
        # output schema, not an error
        from pyspark.sql import types as T

        return df.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    df.select(id_col).schema.fields[0],
                    T.StructField("pick_order", T.IntegerType()),
                    T.StructField("dist_at_pick", T.DoubleType()),
                ]
            ),
        )
    if len(rows) < k:
        raise ValueError(f"diverse_sample: sample has {len(rows)} rows < k={k}")
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    mat = mat / norms

    picks = [0]  # lowest id seeds
    dists = [None]
    mind = 1.0 - mat @ mat[0]
    # picked indices leave the candidate pool outright (r11 ADVICE: with
    # fewer than k distinct vectors, best ~ 0 and the tie window would
    # re-admit already-picked rows, duplicating picks) — sample_n ≥ k is
    # guaranteed above, so the pool never runs dry
    mind[0] = -np.inf
    for _ in range(1, k):
        best = np.max(mind)
        # ties at the farthest distance break to the LOWEST id
        cand = np.flatnonzero(mind >= best - 1e-12)
        nxt = int(cand[np.argmin(ids[cand])])
        picks.append(nxt)
        dists.append(float(round(best, 6)))
        mind = np.minimum(mind, 1.0 - mat @ mat[nxt])
        mind[nxt] = -np.inf

    spark = df.sparkSession
    out = [
        (ids[p].item(), order, dists[order])
        for order, p in enumerate(picks)
    ]
    id_field = df.select(id_col).schema.fields[0]
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            id_field,
            T.StructField("pick_order", T.IntegerType()),
            T.StructField("dist_at_pick", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(out, schema)
