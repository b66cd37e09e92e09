"""Byte-pair-encoding subword tokenizer: bounded-sample training +
distributed Arrow-batched application.

The rest of the engine tokenizes by regex (exact, SQL-reproducible —
fn/text.tokens). Real LLM pipelines count and pack SUBWORD tokens, so
this module provides the missing tier with the standard industrial
split:

- **Training is a bounded-driver-state problem**: a BPE vocabulary is
  fit on a corpus SAMPLE (here: deterministic k-per-partition cap via
  the same salted-md5 order the sampling tier uses), collected once.
  The model — an ordered merge list — is a few thousand string pairs;
  like the IVF centroids (operators/similarity) this is model state,
  not data, and the classic word-frequency formulation (Sennrich et
  al. 2016) makes each merge iteration O(|distinct words|) in plain
  Python — no per-merge corpus pass, which is what makes fully
  distributed BPE training a non-starter at any scale.
- **Application is embarrassingly parallel**: the merge list broadcasts
  (Spark task-closure broadcast) and an Arrow-batched mapInPandas
  encodes each doc independently — no shuffle at all; at 100 TB the
  encode is a single map stage over the corpus.

Determinism: the sample is salted-md5-ordered (partitioning-
independent), merge ties break lexicographically, and greedy encoding
follows merge rank — same corpus → same vocab → same ids, any cluster.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # word-end marker so merges can't cross word boundaries


def _word_freqs(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        if t:
            for w in _words(t):
                c[w] += 1
    return c


def _words(text: str) -> list[str]:
    # same normalization family as fn/text.tokens: lowercase, alnum runs
    import re

    return re.findall(r"[a-z0-9]+", text.lower())


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    sample_docs: int = 10_000,
    salt: str = "bpe",
) -> list[tuple[str, str]]:
    """Fit an ordered BPE merge list on a deterministic bounded sample.

    The sample is the first ``sample_docs`` docs in salted-md5 order —
    a fair, partitioning-independent draw (TakeOrderedAndProject plan,
    never a full sort). Returns the merge list (the model)."""
    key = F.md5(F.concat(F.lit(f"{salt}:"), F.col(text_col)))
    sample = [
        r[0]
        for r in docs.select(text_col, key.alias("k"))
        .orderBy("k")
        .limit(sample_docs)
        .select(text_col)
        .collect()
    ]
    freqs = {tuple(w) + (END,): n for w, n in _word_freqs(sample).items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for sym, n in freqs.items():
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] += n
        if not pair_counts:
            break
        # max by (count, lexicographic) — deterministic tie-break
        best = max(pair_counts, key=lambda p: (pair_counts[p], p))
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        out = {}
        for sym, n in freqs.items():
            new_sym, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    new_sym.append(merged)
                    i += 2
                else:
                    new_sym.append(sym[i])
                    i += 1
            out[tuple(new_sym)] = out.get(tuple(new_sym), 0) + n
        freqs = out
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word by merge rank (lowest rank first)."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed encode: (id, subword array, n_subwords) per doc.

    The merge list rides the task closure (broadcast-sized model state);
    encoding is one Arrow-batched map stage — zero exchanges. A
    per-batch word→pieces memo exploits Zipf (each distinct word is
    encoded once per batch, not once per occurrence)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    schema = f"{id_col} long, subwords array<string>, n_subwords int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, subs, ns = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                pieces: list[str] = []
                for w in _words(text or ""):
                    enc = memo.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        memo[w] = enc
                    pieces.extend(enc)
                ids.append(doc_id)
                subs.append(pieces)
                ns.append(len(pieces))
            yield pd.DataFrame({id_col: ids, "subwords": subs, "n_subwords": ns})

    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)
