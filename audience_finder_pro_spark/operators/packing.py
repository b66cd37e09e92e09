"""Sequence packing — fill fixed token-budget bins from variable-length docs.

Pretraining consumes fixed-length sequences; packing short documents
together (instead of padding each to the context length) is the standard
data-prep step that decides how much of a token budget is real signal.
The classical greedy best-fit packer is inherently sequential — a 100 TB
corpus can't thread one bin state through every document. Two
Spark-first strategies:

- ``pack_sequences``: DETERMINISTIC running-sum binning. Order docs by
  an explicit key (any deterministic column — curation score, doc id,
  dedup-cluster representative order), take the running token total per
  source partition, and assign ``bin_id = floor((cumsum - n_tokens) /
  budget)`` — i.e. a document starts a new bin when the running total
  crosses the budget boundary. One window over the ordering key; no
  driver state, no UDF, reproducible on any cluster. Bins can OVERFLOW
  the budget by at most one document's tokens (the crossing doc lands in
  the bin it started in — callers that need hard caps truncate the
  crossing doc downstream, which is what training tokenizers do anyway).
  This is the shuffle-minimal shape: the window's one exchange on the
  partition key is the entire cost.

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


def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    budget: int = 2048,
    order_by: Column | str = "doc_id",
    partition_by: str | None = None,
) -> DataFrame:
    """Assign each doc a ``bin_id`` (and ``bin_pos``) by running-sum binning.

    ``partition_by`` scopes bins (e.g. per source) and bounds the window
    state; None packs the whole frame in one ordered stream (fine at test
    SF, pass a partition column at scale). Deterministic: same data +
    same order key → same bins, independent of cluster partitioning.
    """
    order = [F.col(order_by) if isinstance(order_by, str) else order_by]
    w = (
        Window.partitionBy(partition_by).orderBy(*order)
        if partition_by
        else Window.partitionBy().orderBy(*order)
    )
    run = F.sum(F.col(token_col)).over(w)
    bin_id = F.floor((run - F.col(token_col)) / F.lit(budget))
    out = df.withColumn("bin_id", bin_id)
    wb = (
        Window.partitionBy(partition_by, "bin_id").orderBy(*order)
        if partition_by
        else Window.partitionBy("bin_id").orderBy(*order)
    )
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
