"""BM25 / TF-IDF parity tests.

TF-IDF is checked against actual scikit-learn (available in this env).
BM25 is checked against an independent in-test implementation of the
published Okapi/rank_bm25 algorithm (rank_bm25 itself is not installed).
"""
import math
from collections import Counter

import numpy as np
import pytest

from persian_rag_tpu.index.lexical import BM25Index, TfidfIndex, sklearn_analyzer

CORPUS_EN = [
    "the quick brown fox jumps over the lazy dog",
    "a fast brown fox leaps over a sleepy cat",
    "the dog sleeps all day long in the sun",
    "cats and dogs are common household animals",
    "the fox is a wild animal unlike the domestic dog",
    "quick reflexes help the fox hunt at dawn",
]

CORPUS_FA = [
    "دارو برای درمان بیماری استفاده می شود",
    "این دارو عوارض جانبی کمی دارد",
    "بیماری قلبی نیاز به درمان فوری دارد",
    "مصرف دارو باید طبق دستور پزشک باشد",
    "پزشک متخصص بیماری های قلبی است",
]


def rank_bm25_reference(corpus_tokens, query_tokens, k1=1.5, b=0.75, epsilon=0.25):
    """Independent reimplementation of rank_bm25.BM25Okapi.get_scores."""
    n = len(corpus_tokens)
    doc_lens = [len(d) for d in corpus_tokens]
    avgdl = sum(doc_lens) / n
    doc_freqs = [Counter(d) for d in corpus_tokens]
    nd = Counter()
    for c in doc_freqs:
        nd.update(c.keys())
    idf = {}
    idf_sum = 0.0
    negative = []
    for word, freq in nd.items():
        v = math.log(n - freq + 0.5) - math.log(freq + 0.5)
        idf[word] = v
        idf_sum += v
        if v < 0:
            negative.append(word)
    eps = epsilon * (idf_sum / len(idf))
    for word in negative:
        idf[word] = eps
    scores = np.zeros(n)
    for q in query_tokens:
        q_freq = np.array([df.get(q, 0) for df in doc_freqs], dtype=float)
        scores += idf.get(q, 0.0) * (
            q_freq * (k1 + 1) / (q_freq + k1 * (1 - b + b * np.array(doc_lens) / avgdl))
        )
    return scores


@pytest.mark.parametrize("corpus", [CORPUS_EN, CORPUS_FA])
def test_bm25_scores_match_reference_formula(corpus):
    index = BM25Index().build(corpus)
    queries = [corpus[0].split()[0] + " " + corpus[1].split()[1], "fox dog", "دارو درمان"]
    for q in queries:
        want = rank_bm25_reference([c.split() for c in corpus], q.split())
        got = index.get_scores(q)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bm25_repeated_query_terms_accumulate():
    index = BM25Index().build(CORPUS_EN)
    once = index.get_scores("fox")
    twice = index.get_scores("fox fox")
    np.testing.assert_allclose(twice, 2 * once, rtol=1e-6)


def test_bm25_search_topk_order():
    index = BM25Index().build(CORPUS_EN)
    scores, ids = index.search(["quick brown fox"], k=3)
    dense = index.get_scores("quick brown fox")
    want = np.argsort(-dense, kind="stable")[:3]
    np.testing.assert_array_equal(ids[0], want)


def test_bm25_save_load(tmp_path):
    index = BM25Index().build(CORPUS_FA)
    index.save(str(tmp_path / "bm25"))
    loaded = BM25Index.load(str(tmp_path / "bm25"))
    q = "دارو پزشک"
    np.testing.assert_allclose(loaded.get_scores(q), index.get_scores(q))


@pytest.mark.parametrize("corpus", [CORPUS_EN, CORPUS_FA])
@pytest.mark.parametrize("max_features", [None, 10])
def test_tfidf_matches_sklearn(corpus, max_features):
    from sklearn.feature_extraction.text import TfidfVectorizer
    from sklearn.metrics.pairwise import cosine_similarity

    vec = TfidfVectorizer(
        max_features=max_features, stop_words=None, ngram_range=(1, 2)
    )
    matrix = vec.fit_transform(corpus)

    index = TfidfIndex(max_features=max_features, ngram_range=(1, 2)).build(corpus)

    for query in [corpus[0], corpus[-1][:20], "unseen words entirely"]:
        qv = vec.transform([query])
        want = cosine_similarity(qv, matrix).flatten()
        got = index.get_scores(query)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_tfidf_vocab_matches_sklearn():
    from sklearn.feature_extraction.text import TfidfVectorizer

    vec = TfidfVectorizer(stop_words=None, ngram_range=(1, 2))
    vec.fit(CORPUS_EN)
    index = TfidfIndex(max_features=None).build(CORPUS_EN)
    assert index.vocab == {t: int(i) for t, i in vec.vocabulary_.items()}


def test_tfidf_analyzer_matches_sklearn_analyzer():
    from sklearn.feature_extraction.text import TfidfVectorizer

    vec = TfidfVectorizer(stop_words=None, ngram_range=(1, 2))
    analyzer = vec.build_analyzer()
    for text in CORPUS_EN + CORPUS_FA + ["Mixed CASE text, with punct!"]:
        assert sklearn_analyzer(text) == analyzer(text)


def test_tfidf_save_load(tmp_path):
    index = TfidfIndex().build(CORPUS_EN)
    index.save(str(tmp_path / "tfidf"))
    loaded = TfidfIndex.load(str(tmp_path / "tfidf"))
    q = "brown fox"
    np.testing.assert_allclose(loaded.get_scores(q), index.get_scores(q))


# -- union-slot batch-kernel wiring -------------------------------------------


def _zipf_corpus(rng, n_docs, vocab=400, lo=5, hi=40):
    return [
        " ".join(map(str, rng.zipf(1.4, size=rng.integers(lo, hi)) % vocab))
        for _ in range(n_docs)
    ]


def test_union_gate_logic():
    from persian_rag_tpu.index.lexical import _UNION_MIN_SLOTS

    index = BM25Index()
    shared = np.tile(np.arange(8, dtype=np.int32), (256, 1))  # b*t=2048, U=8
    distinct = np.arange(2048, dtype=np.int32).reshape(256, 8)
    small = np.tile(np.arange(8, dtype=np.int32), (4, 1))
    assert small.size < _UNION_MIN_SLOTS
    assert index._union_gate(shared)
    assert not index._union_gate(distinct)  # U = b*t, flat wins
    assert not index._union_gate(small)  # below the dispatch floor
    index.batch_kernel = "union"
    assert index._union_gate(small)
    index.batch_kernel = "flat"
    assert not index._union_gate(shared)
    index.batch_kernel = None
    # mesh indexes use the same auto gate: each shard's scan routes
    # through the union kernel per batch (parity covered in
    # tests/test_sharded_lexical.py)
    index.mesh = object()
    assert index._union_gate(shared)
    assert not index._union_gate(distinct)


@pytest.mark.parametrize("bucketed", [False, True])
def test_search_union_matches_flat(bucketed):
    """Forced union-kernel search returns the same ids as the default
    flat kernel and the dense-scores argsort, through both the single-
    ELL and the fused-bucket dispatch paths."""
    rng = np.random.default_rng(11)
    if bucketed:
        docs = _zipf_corpus(rng, 257)
        # one long doc forces multiple length buckets
        docs[3] = " ".join(map(str, rng.zipf(1.4, size=600) % 400))
    else:
        # short docs stay under one bucket width = flat ELL
        docs = _zipf_corpus(rng, 257, lo=5, hi=12)
    index = BM25Index().build(docs)
    assert (index._buckets is not None) == bucketed
    queries = [
        " ".join(map(str, rng.zipf(1.4, size=6) % 400)) for _ in range(64)
    ]
    k = 10
    index.batch_kernel = "flat"
    s_flat, i_flat = index.search(queries, k)
    index.batch_kernel = "union"
    s_uni, i_uni = index.search(queries, k)
    dense = np.stack([index.get_scores(q) for q in queries])
    want = np.argsort(-dense, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(i_uni, want)
    np.testing.assert_array_equal(i_flat, want)
    np.testing.assert_allclose(s_uni, s_flat, rtol=1e-5, atol=1e-5)


def test_packed_serving_container_is_int32():
    """The single-transfer serving pack must use an INT32 container on
    both legs: int32 doc ids bitcast into f32 are denormals (< 2^23 has
    a zero exponent) and the TPU f32 path flushes them to zero — on
    chip this returned all-zero ids with exact scores. Integer
    transport preserves float bits exactly. Locks the container dtype
    and the pack/unpack round trip."""
    from persian_rag_tpu.index.lexical import (
        _pack_queries,
        _packed_bucket_topk,
        _packed_flat_topk,
        _unpack_topk,
    )

    rng = np.random.default_rng(5)
    qids = rng.integers(0, 400, size=(8, 4)).astype(np.int32)
    qvals = rng.random((8, 4)).astype(np.float32)
    packed = _pack_queries(qids, qvals)
    assert packed.dtype == np.int32
    np.testing.assert_array_equal(packed[:, :4], qids)
    np.testing.assert_array_equal(packed[:, 4:].view(np.float32), qvals)

    # device-side pack round trip: ids survive exactly (incl. id 0 and
    # small ids, the denormal hazard zone), scores bit-exact
    docs = _zipf_corpus(rng, 64)
    index = BM25Index().build(docs)
    queries = [" ".join(map(str, rng.zipf(1.4, size=5) % 400)) for _ in range(8)]
    s, i = index.search(queries, 5)
    assert i.dtype == np.int32 and s.dtype == np.float32
    dense = np.stack([index.get_scores(q) for q in queries])
    want = np.argsort(-dense, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(i, want)

    # the jitted packed wrappers must return int32 (f32 would flush
    # denormal id bits on TPU)
    import jax.numpy as jnp

    t = qids.shape[1]
    if index._buckets is None:
        out = _packed_flat_topk(
            jnp.asarray(packed), index._dev_ids, index._dev_vals,
            t=t, k=5, use_pallas=False,
        )
    else:
        kbs = tuple(min(5, b.n_actual) for b in index._buckets)
        out = _packed_bucket_topk(
            jnp.asarray(packed),
            tuple(b.dev_ids for b in index._buckets),
            tuple(b.dev_vals for b in index._buckets),
            tuple(b.dev_gids for b in index._buckets),
            t=t, kbs=kbs, k=5, use_pallas=False,
        )
    assert out.dtype == jnp.int32
    s2, i2 = _unpack_topk(np.asarray(out), 5)
    assert s2.dtype == np.float32 and i2.dtype == np.int32


def test_union_hash_copy_search_parity(monkeypatch):
    """With the union-hash gate forced open, search() routes union
    batches through the hashed-union kernel and must return the same
    ids as the dense argsort and the forced flat kernel (scores within
    reduction-order tolerance)."""
    import persian_rag_tpu.index.lexical as lex

    monkeypatch.setattr(lex, "_UNION_HASH_MIN_N", 50)
    monkeypatch.setattr(lex, "_UNION_HASH_MIN_L", 4)
    # tiny forced corpora fail the per-batch work model (per-segment
    # chunk padding dominates at small unions); force the hashed route
    # so this test exercises it end to end
    monkeypatch.setattr(
        lex._EllIndex, "_hash_work_ok",
        staticmethod(lambda uids, l_pad, ids3: ids3 is not None),
    )
    rng = np.random.default_rng(17)
    docs = _zipf_corpus(rng, 300, lo=10, hi=14)
    index = lex.BM25Index().build(docs)
    assert index._buckets is None
    assert index._dev_ids3 is not None, "union-hash copy must build"
    assert index._dev_ids3.ndim == 3
    queries = [
        " ".join(map(str, rng.zipf(1.4, size=6) % 400)) for _ in range(64)
    ]
    index.batch_kernel = "union"
    s_u, i_u = index.search(queries, 10)
    index.batch_kernel = "flat"
    s_f, i_f = index.search(queries, 10)
    dense = np.stack([index.get_scores(q) for q in queries])
    want = np.argsort(-dense, axis=1, kind="stable")[:, :10]
    np.testing.assert_array_equal(i_u, want)
    np.testing.assert_array_equal(i_f, want)
    np.testing.assert_allclose(s_u, s_f, rtol=1e-5, atol=1e-5)

    # bucketed corpus: per-bucket union-hash copies
    docs2 = _zipf_corpus(rng, 260, lo=5, hi=12)
    docs2[1] = " ".join(map(str, rng.zipf(1.4, size=600) % 400))
    idx2 = lex.BM25Index().build(docs2)
    assert idx2._buckets is not None
    assert any(b.dev_ids3 is not None for b in idx2._buckets)
    idx2.batch_kernel = "union"
    s2, i2 = idx2.search(queries, 10)
    dense2 = np.stack([idx2.get_scores(q) for q in queries])
    want2 = np.argsort(-dense2, axis=1, kind="stable")[:, :10]
    np.testing.assert_array_equal(i2, want2)


def test_hash_work_model_crossover():
    """The flat-vs-hashed union work model reproduces the measured 1M
    crossover: a small union (167 terms, batch-64 regime — measured
    hashed 55.0 ms vs flat 35.7) picks flat; a large one (797 terms,
    batch-512 — measured hashed 124.3 vs flat 180.3) picks hashed."""
    import persian_rag_tpu.index.lexical as lex

    class Ids3:
        shape = (1, 8, 16)  # (N, S, Ls) as measured at 1M zipf

    rng = np.random.default_rng(0)
    small = np.sort(rng.choice(50_000, size=167, replace=False))
    large = np.sort(rng.choice(50_000, size=797, replace=False))
    l_pad = 56  # L=49 padded to 8
    assert not lex._EllIndex._hash_work_ok(small, l_pad, Ids3())
    assert lex._EllIndex._hash_work_ok(large, l_pad, Ids3())
    assert not lex._EllIndex._hash_work_ok(large, l_pad, None)


@pytest.mark.slow
def test_union_qw_exact_three_pass_parity(rng):
    """Integer query weights route the union kernels through the 3-pass
    exact-split contraction (qw bf16-exact, D split into three bf16
    terms summing exactly); scores must match the reference within the
    same f32 envelope as HIGHEST."""
    from persian_rag_tpu.ops.sparse_scores import (
        hash_segments,
        sparse_scores_ref,
        sparse_topk_union_hashed_pallas,
        sparse_topk_union_pallas,
    )
    import jax.numpy as jnp

    n, l, vocab, b, t, k = 600, 10, 300, 16, 6, 5
    ids = np.full((n, l), -1, np.int32)
    vals = np.zeros((n, l), np.float32)
    for d in range(n):
        nt = rng.integers(3, l + 1)
        tid = np.unique(rng.integers(0, vocab, nt * 2))[:nt].astype(
            np.int32
        )
        ids[d, : len(tid)] = tid
        vals[d, : len(tid)] = rng.uniform(0.5, 4.0, len(tid))
    qids = np.full((b, t), -1, np.int32)
    qvals = np.zeros((b, t), np.float32)
    for i in range(b):
        nt = rng.integers(2, t + 1)
        tid = np.unique(rng.integers(0, vocab, nt * 2))[:nt].astype(
            np.int32
        )
        qids[i, : len(tid)] = tid
        qvals[i, : len(tid)] = float(rng.integers(1, 4))  # int weights

    scores = np.asarray(sparse_scores_ref(
        jnp.asarray(ids), jnp.asarray(vals),
        jnp.asarray(qids), jnp.asarray(qvals),
    ))
    order = np.lexsort(
        (np.arange(n)[None, :].repeat(b, 0), -scores), axis=1
    )[:, :k]
    ids3, vals3 = hash_segments(ids, vals, 4)
    s1, i1 = sparse_topk_union_pallas(
        jnp.asarray(ids), jnp.asarray(vals),
        jnp.asarray(qids), jnp.asarray(qvals), k,
        interpret=True, qw_exact=True,
    )
    np.testing.assert_array_equal(np.asarray(i1), order)
    np.testing.assert_allclose(
        np.asarray(s1),
        np.take_along_axis(scores, order, axis=1),
        rtol=2e-6, atol=1e-6,
    )
    s2, i2 = sparse_topk_union_hashed_pallas(
        jnp.asarray(ids3), jnp.asarray(vals3),
        jnp.asarray(qids), jnp.asarray(qvals), k,
        interpret=True, qw_exact=True,
    )
    np.testing.assert_array_equal(np.asarray(i2), order)


def test_bm25_serving_uses_qw_exact_gate(rng):
    """BM25 query weights are term multiplicities (integers) -> the
    serving gate enables the 3-pass path; results unchanged vs the
    HIGHEST kernels."""
    from persian_rag_tpu.index.lexical import BM25Index

    vocab = [f"w{j}" for j in range(100)]
    docs = [
        " ".join(rng.choice(vocab, 8, replace=False)) for _ in range(500)
    ]
    idx = BM25Index().build(docs)
    idx.batch_kernel = "union"
    queries = [
        " ".join(rng.choice(vocab[:30], 3)) for _ in range(16)
    ]  # repeats allowed -> multiplicity 2 sometimes
    s1, i1 = idx.search(queries, k=5)
    scores = np.stack([idx.get_scores(q) for q in queries])
    want = np.lexsort(
        (np.arange(scores.shape[1])[None].repeat(16, 0), -scores), axis=1
    )[:, :5]
    np.testing.assert_array_equal(i1, want)
