"""Sequence packing — fill fixed token-budget bins from variable-length docs.

Pretraining consumes fixed-length sequences; packing short documents
together (instead of padding each to the context length) is the standard
data-prep step that decides how much of a token budget is real signal.
The classical greedy best-fit packer is inherently sequential — a 100 TB
corpus can't thread one bin state through every document. Two
Spark-first strategies:

- ``pack_sequences``: DETERMINISTIC running-sum binning. Order docs by
  an explicit UNIQUE key (doc id, or (curation score, doc id) — ties in
  the order key would make the running sum partitioning-dependent), take
  the running token total, and assign ``bin_id = floor((cumsum -
  n_tokens) / budget)`` — i.e. a document starts a new bin when the
  running total crosses the budget boundary. Bins can OVERFLOW the
  budget by at most one document's tokens (the crossing doc lands in
  the bin it started in — callers that need hard caps truncate the
  crossing doc downstream, which is what training tokenizers do anyway).

  The running sum is computed as a DISTRIBUTED two-pass prefix sum, not
  a global window (``Window.partitionBy()`` moves the entire frame into
  ONE task — the canonical 100 TB anti-pattern): (1) range-partition by
  the order key and take per-Spark-partition token totals (a map-side
  combined aggregate — one row per partition crosses the wire), (2)
  cumulate the totals on the driver (n_partitions scalars — bounded
  model state) and broadcast each partition's starting offset back into
  a NARROW mapInPandas that adds ``offset + local cumsum``. Token
  counts are integers, so partial sums are exact and associative — the
  result is bit-identical to the sequential ROWS-frame running sum for
  any partitioning. ``bin_pos`` is a row_number window over ``bin_id``:
  high-cardinality (≈ total_tokens/budget keys, ~budget/mean_doc rows
  each), the normal hash-window shape, not a scale risk.

- ``pack_sequences_tight``: per-Spark-partition greedy first-fit via
  mapInPandas for callers that want less overflow slack at the cost of
  determinism-per-partitioning (bin ids are then only stable for a fixed
  partitioning; flagged in the docstring — use the running-sum form when
  reproducibility matters more than the last few % of fill rate).

Fill-rate note: with docs ≪ budget the running-sum form wastes at most
``mean_doc_tokens/2`` per bin boundary in expectation — e.g. 54-token
docs into 2048-token bins ≈ 98.7% fill. Greedy buys little there; it
matters when doc length approaches the budget.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(order_by) -> list[Column]:
    if not isinstance(order_by, (list, tuple)):
        order_by = [order_by]
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    budget: int = 2048,
    order_by: Column | str | list = "doc_id",
    partition_by: str | None = None,
) -> DataFrame:
    """Assign each doc a ``bin_id`` (and ``bin_pos``) by running-sum binning.

    ``order_by`` must be a UNIQUE key (or list of columns that is unique
    together — e.g. ``["score", "doc_id"]``): the running sum uses ROWS
    semantics, so tied order values would make bin assignment depend on
    tie order. ``partition_by`` scopes bins (e.g. per source) through a
    per-key ROWS-frame window — the right shape when key cardinality is
    high; None packs the whole frame in one global ordered stream via the
    distributed two-pass prefix sum (per-partition totals → driver
    cumulation, n_partitions scalars only → narrow offset+cumsum — see
    module docstring; no single-partition window anywhere in the plan).
    Deterministic either way: same data + same order key → same bins,
    independent of cluster partitioning (integer token sums are exact
    and associative).
    """
    order = _order_cols(order_by)
    if partition_by:
        w = (
            Window.partitionBy(partition_by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        run = F.sum(F.col(token_col)).over(w)
        out = df.withColumn("bin_id", F.floor((run - F.col(token_col)) / F.lit(budget)))
        wb = Window.partitionBy(partition_by, "bin_id").orderBy(*order)
        return out.withColumn("bin_pos", F.row_number().over(wb) - 1)

    from pyspark.sql.types import LongType, StructField, StructType

    # One materialization pins the range-exchange boundaries (the range
    # partitioner samples, so re-execution could cut partitions elsewhere
    # and desynchronize the two passes); blocks are freed by the
    # ContextCleaner when the result is dropped (see caching.py).
    sorted_df = (
        df.repartitionByRange(*order).sortWithinPartitions(*order).localCheckpoint(eager=True)
    )
    # pass 1: per-partition token totals — map-side combined, one row per
    # partition crosses the wire; the collect is n_partitions scalars
    # (bounded model state, not a data-path collect)
    totals = (
        sorted_df.groupBy(F.spark_partition_id().alias("_pid"))
        .agg(F.sum(F.col(token_col).cast("long")).alias("_tot"))
        .collect()
    )
    by_pid = {r["_pid"]: r["_tot"] for r in totals}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += int(by_pid[pid])

    # NOT df.schema.add(...): .add mutates the cached schema in place
    schema = StructType(list(sorted_df.schema.fields) + [StructField("_run", LongType())])
    tok = token_col

    # pass 2: narrow — partition-local cumsum + broadcast starting offset.
    # Partitions are stored sorted (sortWithinPartitions materialized by
    # the checkpoint) and batches iterate in storage order, so carrying
    # the running total across batches preserves ROWS-frame semantics.
    def add_running(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        carry = offsets.get(ctx.partitionId() if ctx else 0, 0)
        for pdf in batches:
            out = pdf.copy()
            cs = pdf[tok].astype("int64").cumsum() + carry
            out["_run"] = cs
            if len(cs):
                carry = int(cs.iloc[-1])
            yield out

    ran = sorted_df.mapInPandas(add_running, schema=schema)
    out = ran.withColumn(
        "bin_id", F.floor((F.col("_run") - F.col(token_col)) / F.lit(budget))
    ).drop("_run")
    # bin_pos: hash window over the high-cardinality bin_id — the normal
    # parallel window shape (~budget/mean_doc_tokens rows per key)
    wb = Window.partitionBy("bin_id").orderBy(*order)
    return out.withColumn("bin_pos", F.row_number().over(wb) - 1)


def pack_sequences_tight(
    df: DataFrame,
    token_col: str = "n_tokens",
    budget: int = 2048,
    id_col: str = "doc_id",
    open_bins: int = 64,
) -> DataFrame:
    """Per-partition greedy first-fit packing (mapInPandas), bounded lookback.

    Hard cap: no bin exceeds ``budget`` unless a single doc alone does
    (such docs get a singleton bin). Only the ``open_bins`` most recent
    bins stay open for first-fit — unbounded first-fit scans EVERY bin
    ever opened per doc (quadratic per partition, since near-full bins
    never close); the bounded window keeps the packer O(n·open_bins)
    with state O(open_bins), at a fill-rate cost that vanishes when docs
    ≪ budget. Bin ids embed the Spark partition id (``pid·2^40 +
    local``), so they are unique but only stable for a fixed
    partitioning — prefer ``pack_sequences`` when bin assignment must be
    reproducible across cluster layouts.
    """

    from pyspark.sql.types import LongType, StructField, StructType

    # NOT df.schema.add(...): .add mutates the DataFrame's cached schema
    # object in place, desynchronizing df.columns from the actual plan
    schema = StructType(
        list(df.schema.fields)
        + [StructField("bin_id", LongType()), StructField("bin_fill", LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        base = pid << 40
        n_bins = 0  # total bins ever opened in this partition
        bins: list[tuple[int, int]] = []  # (bin_index, fill) — open window only
        for pdf in batches:
            bin_ids, fills = [], []
            for t in pdf[token_col].astype("int64"):
                placed = None
                for i, (idx, fill) in enumerate(bins):
                    if fill + t <= budget:
                        bins[i] = (idx, fill + t)
                        placed = i
                        break
                if placed is None:
                    bins.append((n_bins, int(t)))
                    n_bins += 1
                    placed = len(bins) - 1
                    if len(bins) > open_bins:
                        bins.pop(0)  # close the oldest bin
                        placed -= 1
                bin_ids.append(base + bins[placed][0])
                fills.append(bins[placed][1])
            out = pdf.copy()
            out["bin_id"] = bin_ids
            out["bin_fill"] = fills
            yield out

    return df.mapInPandas(run, schema=schema)


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking — the retrieval/long-context
    complement to packing: split each document into windows of
    ``chunk_tokens`` whitespace tokens advancing by ``chunk_tokens -
    overlap``, so consecutive chunks share ``overlap`` tokens of context.

    Declared semantics (deterministic, SQL-replayable):

    - tokens = whitespace split with empties dropped (case and
      punctuation PRESERVED — chunks are re-joined text for embedding or
      context assembly, unlike the normalized analysis tokenizer).
    - a doc with n tokens yields ``1`` chunk if ``n <= chunk_tokens``
      else ``ceil((n - chunk_tokens) / step) + 1`` — exact coverage, the
      last chunk shorter but always > ``overlap`` tokens.
    - zero-token docs (empty/whitespace/NULL text) yield NO chunks.

    Scale shape: one narrow pass — tokenize, explode the chunk-INDEX
    sequence, slice per exploded row (plain codegen, no HOF lambdas, no
    window, zero exchanges; same shape as plans/views comment chunks).
    The sub-1-chunk guard is a ``when``, not ``sequence(greatest(...))``
    — Spark sequences run DESCENDING when start > stop (see
    functions/text.gram_stream).

    Returns (id_col, chunk_id, chunk_text, n_tokens).
    """
    if not chunk_tokens > overlap >= 0:
        raise ValueError(f"need chunk_tokens > overlap >= 0, got {chunk_tokens}/{overlap}")
    step = chunk_tokens - overlap
    tok = F.array_remove(F.split(F.col(text_col), r"\s+"), "")
    n = F.size(tok)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((n - chunk_tokens) / F.lit(float(step))).cast("int") + 1
    )
    toks = df.select(F.col(id_col), tok.alias("_tok"), n.alias("_n"), n_chunks.alias("_nc"))
    sliced = toks.filter(F.col("_n") > 0).select(
        id_col,
        "_tok",
        F.posexplode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id", "_i"),
    )
    piece = F.slice(F.col("_tok"), F.col("_i") * step + 1, chunk_tokens)
    return sliced.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    avg_tokens: int = 32,
    salt: str = "cdc",
) -> DataFrame:
    """Content-defined chunking (E66): chunk boundaries decided by the
    CONTENT (a salted hash of each token), not by position — the
    property fixed-stride chunking (E9's `chunk_documents`) lacks that
    matters for chunk-level dedup: inserting a sentence at the head of
    a document shifts every fixed-stride chunk (all hashes change, dedup
    sees nothing), while content-defined boundaries REALIGN after the
    edit, so every chunk past it hashes identically and chunk-level
    dedup survives edits (the rsync/LBFS/backup-dedup principle, on
    tokens).

    Boundary rule: token t ends a chunk iff
    ``md5(salt:t) mod avg_tokens == 0`` — expected chunk length is
    ``avg_tokens``, geometric distribution (no min/max clamps: the
    closed-form rule is what the SQL oracle replays; production CDC
    adds clamps at the cost of that replay). A token's chunk id is the
    number of boundary tokens STRICTLY before it in the document.

    Scale shape: one posexplode of the token array, a per-document
    cumulative window (bounded by document length — the sessionize
    contract), one map-side-combined regroup per (doc, chunk). Returns
    (id_col, chunk, n_tokens, chunk_hash, chunk_text); chunk_hash =
    md5 of the space-joined chunk — the dedup key."""
    from audience_finder_pro_spark.functions.text import tokens
    from audience_finder_pro_spark.operators.sampling import hash_bucket

    if avg_tokens < 2:
        raise ValueError("cdc_chunks needs avg_tokens >= 2")
    toks = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    bd = (hash_bucket("tok", salt, buckets=avg_tokens) == 0).cast("int")
    w = Window.partitionBy(id_col).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    chunked = toks.withColumn(
        "chunk", F.coalesce(F.sum(bd).over(w), F.lit(0)).cast("int")
    )
    regrouped = chunked.groupBy(id_col, "chunk").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("chunk_text"),
    )
    return regrouped.select(
        id_col,
        "chunk",
        "n_tokens",
        F.md5("chunk_text").alias("chunk_hash"),
        "chunk_text",
    )
