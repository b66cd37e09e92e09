"""Property-based tests (SURVEY §5 item 3) — hypothesis-generated inputs
through the REAL Spark expressions (batched: one DataFrame per example
keeps the JVM round-trips tolerable).

Properties pinned:
- norm_ws is idempotent and never leaves runs of whitespace
- tokens emits only non-empty lowercase alphanumerics
- shingle count == max(0, n_tokens - n + 1) exactly
- first_match_expr ∈ keywords ∪ {NULL}; all_matches_expr is the sorted
  join of exactly the containing keywords
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from audience_finder_pro_spark.functions.text import norm_ws, shingle_stream, tokens
from audience_finder_pro_spark.operators.keyword_match import (
    all_matches_expr,
    first_match_expr,
)

TEXT = st.text(
    alphabet=st.sampled_from("ab c\t\nXY1.!-é"), min_size=0, max_size=60
)
SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=16))
def test_norm_ws_idempotent(spark, texts):
    rows = (
        _df(spark, texts)
        .select(norm_ws("t").alias("once"), norm_ws(norm_ws("t")).alias("twice"))
        .collect()
    )
    for r in rows:
        assert r["once"] == r["twice"]
        assert not re.search(r"\s\s|^\s|\s$", r["once"] or "")


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=16))
def test_tokens_shape(spark, texts):
    rows = _df(spark, texts).select(tokens("t").alias("tok")).collect()
    for r in rows:
        for t in r["tok"]:
            assert t and re.fullmatch(r"[a-z0-9]+", t)


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=16), st.integers(min_value=2, max_value=4))
def test_shingle_count_exact(spark, texts, n):
    df = _df(spark, texts)
    counts = {
        r["i"]: r["c"]
        for r in shingle_stream(df, "i", "t", n).groupBy("i").agg(F.count("*").alias("c")).collect()
    }
    ntok = {r["i"]: len(r["tok"]) for r in df.select("i", tokens("t").alias("tok")).collect()}
    for i, k in ntok.items():
        assert counts.get(i, 0) == max(0, k - n + 1)


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=12))
def test_keyword_exprs_consistent(spark, texts):
    kws = ["ab", "c", "x y"]
    rows = (
        _df(spark, texts)
        .select(
            "t",
            first_match_expr(F.col("t"), kws).alias("first"),
            all_matches_expr(F.col("t"), kws).alias("all"),
        )
        .collect()
    )
    for r in rows:
        low = (r["t"] or "").lower()
        expect = [k for k in kws if k.lower() in low]
        assert r["first"] == (next(iter(expect), None))
        assert r["all"] == ", ".join(sorted(expect))


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=30), st.integers(min_value=0, max_value=30)),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_matches_union_find(spark, edge_list):
    """CC over random graphs (self-loops, duplicates, parallel edges) must
    equal a driver-side union-find ground truth: same node set, and
    component = min node id of the union-find class."""
    from audience_finder_pro_spark.operators.graph import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        parent[find(a)] = find(b)
    truth: dict[int, int] = {}
    for n in parent:
        r = find(n)
        truth[r] = min(truth.get(r, n), n)
    expect = {n: truth[find(n)] for n in parent}

    edges = spark.createDataFrame(edge_list, "id_a long, id_b long")
    # both physical strategies must match the ground truth: the driver
    # union-find fast path (default at this size) AND the distributed
    # pointer-jumping loop (forced via driver_max_edges=0)
    got = {r.node: r.comp for r in connected_components(edges).collect()}
    assert got == expect
    got_iter = {
        r.node: r.comp
        for r in connected_components(edges, driver_max_edges=0).collect()
    }
    assert got_iter == expect


@settings(**SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=250), min_size=1, max_size=40),
    st.sampled_from([64, 100]),
)
def test_pack_sequences_properties(spark, token_counts, budget):
    """Running-sum packing on arbitrary doc lengths (including over-budget
    docs, where bin ids legitimately skip): every doc assigned exactly
    once; bins preserve the order key; within a bin, the sum minus the
    boundary-crossing last doc stays under budget; and the whole
    assignment is invariant to cluster partitioning."""
    from audience_finder_pro_spark.operators.packing import pack_sequences

    rows = [(i, t) for i, t in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = sorted(
        pack_sequences(df, budget=budget).collect(), key=lambda r: r.doc_id
    )
    assert [r.doc_id for r in out] == list(range(len(token_counts)))
    by_bin: dict[int, list] = {}
    for r in out:
        by_bin.setdefault(r.bin_id, []).append(r)
    for rs in by_bin.values():
        assert [r.bin_pos for r in rs] == list(range(len(rs)))  # order-dense
        total = sum(r.n_tokens for r in rs)
        assert total - rs[-1].n_tokens < budget
    out2 = sorted(
        pack_sequences(df.repartition(5), budget=budget).collect(),
        key=lambda r: r.doc_id,
    )
    assert [(r.bin_id, r.bin_pos) for r in out2] == [
        (r.bin_id, r.bin_pos) for r in out
    ]


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=12), st.integers(min_value=2, max_value=4))
def test_gram_stream_matches_hof_shingles(spark, texts, n):
    """The zip-sliced gram/shingle stream must emit exactly the shingle
    MULTISET the per-row HOF form (functions.text.shingles) builds —
    order within a doc included — across adversarial texts (empty,
    sub-n token counts, punctuation-only, unicode)."""
    from audience_finder_pro_spark.functions.text import shingles

    df = _df(spark, texts)
    got = {}
    for r in shingle_stream(df, "i", "t", n).collect():
        got.setdefault(r["i"], []).append(r["shingle"])
    want = {
        r["i"]: list(r["sh"])
        for r in df.select("i", shingles(tokens("t"), n).alias("sh")).collect()
    }
    for i, w in want.items():
        assert got.get(i, []) == w


@settings(**SETTINGS)
@given(
    st.lists(
        st.lists(st.integers(min_value=-3, max_value=3), min_size=4, max_size=4),
        min_size=1,
        max_size=24,
    ),
    st.sampled_from([0.7, 0.9, 0.99]),
)
def test_semantic_dedup_greedy_invariants(spark, vecs, threshold):
    """semantic_dedup's declared semantics, on arbitrary small integer
    vectors: (a) one output row per input id; (b) every dup points at a
    lower-id vector in its own cluster with cosine >= threshold; (c) KEPT
    vectors within a cluster are pairwise BELOW threshold (else the later
    one would have been marked)."""
    import math

    from audience_finder_pro_spark.operators.similarity import semantic_dedup

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(df, threshold=threshold, n_clusters=4).collect()
    assert sorted(r.vec_id for r in out) == list(range(len(vecs)))

    def cos(a, b):
        na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
        if na == 0 or nb == 0:
            return 0.0
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    by_id = {r.vec_id: r for r in out}
    for r in out:
        if r.is_dup:
            assert r.dup_of is not None and r.dup_of < r.vec_id
            assert by_id[r.dup_of].cent_id == r.cent_id
            assert cos(vecs[r.vec_id], vecs[r.dup_of]) >= threshold - 1e-9
        else:
            assert r.dup_of is None
    kept = [r for r in out if not r.is_dup]
    for i, a in enumerate(kept):
        for b in kept[i + 1 :]:
            if a.cent_id == b.cent_id:
                assert cos(vecs[a.vec_id], vecs[b.vec_id]) < threshold + 1e-9


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=10), st.sampled_from([(8, 3), (5, 0), (4, 2)]))
def test_chunk_documents_matches_python_reference(spark, texts, params):
    """chunk_documents on arbitrary text == a direct python implementation of
    the declared semantics (whitespace tokens, exact coverage, overlap)."""
    import math

    from audience_finder_pro_spark.operators.packing import chunk_documents

    chunk_tokens, overlap = params
    step = chunk_tokens - overlap
    df = _df(spark, texts).selectExpr("i as doc_id", "t as text")
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens)
        for r in chunk_documents(df, chunk_tokens, overlap).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        tok = [w for w in (t or "").split()]
        if not tok:
            continue
        n = len(tok)
        n_chunks = 1 if n <= chunk_tokens else math.ceil((n - chunk_tokens) / step) + 1
        for c in range(n_chunks):
            piece = tok[c * step : c * step + chunk_tokens]
            want[(i, c)] = (" ".join(piece), len(piece))
    assert got == want


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=10), st.integers(min_value=2, max_value=13))
def test_hashed_shingle_stream_counts_match_string_form(spark, texts, n):
    """The hashed shingle stream must agree with the string form on per-doc
    TOTAL and DISTINCT shingle counts for arbitrary text (the equivalence
    the decontamination rewrite relies on; any xxhash64 collision at test
    scale would fail this)."""
    from audience_finder_pro_spark.functions.text import hashed_shingle_stream, shingle_stream

    df = _df(spark, texts)
    strings = (
        shingle_stream(df, "i", "t", n)
        .groupBy("i")
        .agg(
            F.count("*").alias("total"),
            F.count_distinct("shingle").alias("n_distinct"),
        )
    )
    hashes = (
        hashed_shingle_stream(df, "i", "t", n)
        .groupBy("i")
        .agg(F.count("*").alias("total"), F.count_distinct("h").alias("n_distinct"))
    )
    assert sorted(map(tuple, strings.collect())) == sorted(map(tuple, hashes.collect()))


@settings(**SETTINGS)
@given(st.lists(TEXT, min_size=1, max_size=12), st.integers(min_value=5, max_value=40))
def test_bpe_encode_reconstructs_any_corpus(spark, texts, n_merges):
    """BPE property: for ANY corpus and merge budget, the distributed
    encode equals the pure-python reference per doc and concatenated
    subwords reconstruct the normalized word stream losslessly."""
    from audience_finder_pro_spark.operators.bpe import (
        END,
        _words,
        bpe_encode,
        encode_word,
        train_bpe,
    )

    docs = _df(spark, texts).selectExpr("i as doc_id", "t as text")
    merges = train_bpe(docs, n_merges=n_merges, sample_docs=50)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    got = {r.doc_id: list(r.subwords) for r in bpe_encode(docs, merges).collect()}
    for i, t in enumerate(texts):
        ref = []
        for w in _words(t or ""):
            ref.extend(encode_word(w, ranks))
        assert got[i] == ref
        assert "".join(got[i]).replace(END, " ").split() == _words(t or "")


@settings(**SETTINGS)
@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=8, max_size=60),
    st.integers(min_value=2, max_value=6),
)
def test_quantile_bins_monotone_and_complete(spark, vals, n_bins):
    """quantile_bins property: every row binned, bins within range, and
    bin assignment is monotone in the score (x <= y → bin(x) <= bin(y))."""
    from audience_finder_pro_spark.operators.sampling import quantile_bins

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, s double"
    )
    out = sorted(
        ((r.s, r.bin) for r in quantile_bins(df, "s", n_bins=n_bins).collect())
    )
    assert len(out) == len(vals)
    assert all(0 <= b < n_bins for _, b in out)
    assert all(b1 <= b2 for (_, b1), (_, b2) in zip(out, out[1:]))


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=30,
    ),
    st.booleans(),
)
def test_pagerank_mass_and_reference(spark, edges, dangling):
    """On ANY random digraph: with dangling redistribution total rank
    mass equals the node count (the mean-1 invariant), and the
    distributed result matches the pure-python recurrence exactly at
    4 dp regardless of graph shape."""
    from audience_finder_pro_spark.operators.graph import pagerank
    from tests.test_operators import _pagerank_ref

    edges = list(set(edges))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.pagerank for r in pagerank(df, n_iter=6, handle_dangling=dangling).collect()}
    assert got == _pagerank_ref(edges, n_iter=6, dangling=dangling)
    if dangling:
        n = len({u for u, _ in edges} | {v for _, v in edges})
        assert abs(sum(got.values()) - n) < 1e-2
