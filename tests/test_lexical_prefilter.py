"""Hashed-UB lexical prefilter (ops.lexical_prefilter): exactness under
forced engagement on small corpora, proof behavior, guards.

The prefilter's claim is that its results are IDENTICAL to the full ELL
scan's regardless of whether the residual proof passes (a failing proof
falls back to the scan inside the same dispatch), so every test here
compares against the dense get_scores ordering with the scan's
(score desc, lower id first) tie order.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from persian_rag_tpu.index.lexical import BM25Index, TfidfIndex
from persian_rag_tpu.ops.lexical_prefilter import (
    _bf16_round_up,
    assign_buckets,
    build_ub_image,
    hash_queries,
    prefilter_topk,
)


def _mk_corpus(n_docs=320, vocab=500, doc_len=(8, 40), seed=0):
    rng = np.random.default_rng(seed)
    # Zipf-ish term draw over a synthetic vocabulary
    p = 1.0 / np.arange(1, vocab + 1)
    p /= p.sum()
    docs = []
    for _ in range(n_docs):
        ln = int(rng.integers(*doc_len))
        terms = rng.choice(vocab, size=ln, p=p)
        docs.append(" ".join(f"t{t}" for t in terms))
    return docs


def _expected_topk(dense_scores, k):
    """(score desc, id asc) order, the scan kernels' tie rule."""
    order = np.lexsort((np.arange(dense_scores.shape[0]), -dense_scores))
    return order[:k]


@pytest.mark.parametrize("n_buckets,k_scan", [(64, 32), (256, 64)])
def test_bm25_prefilter_matches_scan(n_buckets, k_scan):
    docs = _mk_corpus()
    queries = [
        "t1 t3 t7", "t2 t2 t50", "t100 t5", "t1", "t499 t1 t12 t30",
        "zzz t9",  # one OOV term
    ]
    index = BM25Index().build(docs)
    base_s, base_i = index.search(queries, 10)
    assert index.build_prefilter(n_buckets=n_buckets, k_scan=k_scan)
    index.prefilter = "verified"
    pf_s, pf_i = index.search(queries, 10)
    np.testing.assert_array_equal(pf_i, base_i)
    np.testing.assert_allclose(pf_s, base_s, rtol=1e-5, atol=1e-6)
    for qi, q in enumerate(queries):
        dense = index.get_scores(q)
        np.testing.assert_array_equal(pf_i[qi], _expected_topk(dense, 10))


def test_bm25_prefilter_proof_passes_when_vocab_dedicated():
    """With every vocab term in a dedicated bucket the UB is exact up to
    bf16 rounding; with a candidate pool (J * n_easy tiles) comfortably
    above k_scan, the residual proof should pass on clean margins."""
    docs = _mk_corpus(n_docs=4096, vocab=100)
    index = BM25Index().build(docs)
    assert index.build_prefilter(n_buckets=256, k_scan=64)
    pf = index._prefilter
    assert len(index.vocab) <= 128  # premise: all dedicated (frac=0.5)
    qids, qvals = index._encode_queries(
        [index._query_terms(q) for q in ["t1 t2 t3", "t5 t9"]]
    )
    qh = hash_queries(qids, qvals, pf.term_map, pf.n_buckets)
    s, i, ok = prefilter_topk(
        jnp.asarray(qh), pf.w16, pf.row_norm_max, pf.uids, pf.uvals,
        jnp.asarray(qids), jnp.asarray(qvals), 5, k_scan=pf.k_scan,
        interpret=True, use_pallas=False, return_ok=True,
        tile_n=128,  # J=32 tiles -> 128-candidate pool on a tiny corpus
    )
    assert bool(np.asarray(ok).all()), "proof failed on dedicated vocab"
    dense = index.get_scores("t1 t2 t3")
    np.testing.assert_array_equal(np.asarray(i)[0], _expected_topk(dense, 5))


def test_tfidf_prefilter_matches_scan():
    docs = _mk_corpus(n_docs=200, vocab=300, seed=3)
    queries = ["t1 t3", "t2 t50 t2", "t10 t20 t30"]
    index = TfidfIndex().build(docs)
    base_s, base_i = index.search(queries, 8)
    assert index.build_prefilter(n_buckets=128, k_scan=64)
    index.prefilter = "verified"
    pf_s, pf_i = index.search(queries, 8)
    np.testing.assert_array_equal(pf_i, base_i)
    np.testing.assert_allclose(pf_s, base_s, rtol=1e-5, atol=1e-6)


def test_prefilter_bucketed_corpus_unified_ell():
    """Docs spanning several length buckets: the unified gather ELL must
    reproduce every bucket row, and search stays exact."""
    rng = np.random.default_rng(5)
    docs = []
    for i in range(150):
        ln = int(rng.choice([4, 20, 90]))
        docs.append(" ".join(f"t{rng.integers(200)}" for _ in range(ln)))
    index = BM25Index().build(docs)
    assert index._buckets is not None and len(index._buckets) > 1
    ids, vals = index._unified_ell_host()
    assert ids is not None and ids.shape[0] == len(docs)
    # row-level check against the per-bucket arrays
    for b in index._buckets:
        w = b.ids.shape[1]
        np.testing.assert_array_equal(ids[b.gids, :w], b.ids)
        assert (ids[b.gids, w:] == -1).all()
    base_s, base_i = index.search(["t1 t2", "t7"], 6)
    assert index.build_prefilter(n_buckets=64, k_scan=32)
    index.prefilter = "verified"
    pf_s, pf_i = index.search(["t1 t2", "t7"], 6)
    np.testing.assert_array_equal(pf_i, base_i)


def test_prefilter_negative_scores_guard():
    """A corpus whose BM25 idf floor goes negative must refuse the
    prefilter (the UB property needs non-negative contributions)."""
    docs = ["x x y", "x y", "x y y", "x y x"]  # every term in every doc
    index = BM25Index().build(docs)
    dense = index.get_scores("x")
    assert (dense < 0).any(), "test premise: negative contributions"
    assert not index.build_prefilter(n_buckets=32)
    index.prefilter = "fast"  # requested but refused: scan still serves
    s, i = index.search(["x"], 2)
    np.testing.assert_array_equal(i[0], _expected_topk(dense, 2))


def test_prefilter_k_above_k_scan_falls_back_to_scan_path():
    docs = _mk_corpus(n_docs=100, vocab=80, seed=9)
    index = BM25Index().build(docs)
    assert index.build_prefilter(n_buckets=64, k_scan=8)
    index.prefilter = "verified"
    base = BM25Index().build(docs)
    b_s, b_i = base.search(["t1 t2"], 20)
    p_s, p_i = index.search(["t1 t2"], 20)  # k > k_scan: scan route
    np.testing.assert_array_equal(p_i, b_i)


def test_bf16_round_up_upper_bounds():
    rng = np.random.default_rng(0)
    x = (rng.random(4096).astype(np.float32) * 100.0) ** 2
    up = _bf16_round_up(x)
    assert (up >= x).all()
    # exact bf16 values: casting to bf16 and back is the identity
    rt = np.asarray(jnp.asarray(up).astype(jnp.bfloat16), np.float32)
    np.testing.assert_array_equal(rt, up)
    exact = np.asarray(
        jnp.asarray(x).astype(jnp.bfloat16), np.float32
    )
    keep = exact >= x  # round-to-nearest already >= x: keep unchanged
    np.testing.assert_array_equal(up[keep & (exact == up)], exact[keep & (exact == up)])


def test_assign_buckets_and_hash_queries():
    df = np.array([5, 1, 9, 9, 2, 1, 1, 3], np.int64)
    tm = assign_buckets(df, 8, dedicated_frac=0.5)
    assert tm.shape == (8,) and tm.dtype == np.int32
    assert (tm >= 0).all() and (tm < 8).all()
    ded = tm[np.argsort(-df, kind="stable")[:4]]
    assert sorted(ded.tolist()) == [0, 1, 2, 3]  # top-df terms dedicated
    qids = np.array([[2, 3, -1]], np.int32)
    qvals = np.array([[1.0, 2.0, 0.0]], np.float32)
    qh = hash_queries(qids, qvals, tm, 8)
    assert qh.sum() == 3.0
    assert qh[0, tm[2]] == 1.0 and qh[0, tm[3]] == 2.0


def test_build_ub_image_is_upper_bound():
    rng = np.random.default_rng(1)
    n, l, v, h = 40, 12, 60, 16
    ids = rng.integers(0, v, (n, l)).astype(np.int32)
    ids[rng.random((n, l)) < 0.3] = -1
    vals = np.where(ids >= 0, rng.random((n, l)).astype(np.float32), 0.0)
    tm = assign_buckets(np.ones(v, np.int64), h, dedicated_frac=0.25)
    w16, rmax = build_ub_image(ids, vals, tm, h)
    # q . W >= true score for any non-negative query weighting
    for _ in range(20):
        qt = rng.choice(v, size=4, replace=False)
        qw = rng.random(4).astype(np.float32)
        true = np.zeros(n)
        for t, w in zip(qt, qw):
            true += w * np.where(ids == t, vals, 0.0).sum(axis=1)
        qh = np.zeros(h, np.float32)
        np.add.at(qh, tm[qt], qw)
        ub = w16 @ qh
        assert (ub >= true - 1e-6).all()
    assert rmax >= np.sqrt((w16.astype(np.float64) ** 2).sum(axis=1)).max() - 1e-6


def test_fast_tier_scores_are_exact_for_returned_ids():
    """prefilter="fast": returned scores must be the exact BM25 values
    of the returned ids (the approximation is candidate-set recall
    only), and recall@k on a small corpus should be high."""
    docs = _mk_corpus(n_docs=512, vocab=200, seed=11)
    index = BM25Index().build(docs)
    assert index.build_prefilter(n_buckets=128, k_scan=64)
    index.prefilter = "fast"
    queries = ["t1 t3 t9", "t2 t40", "t5"]
    s, i = index.search(queries, 10)
    hits = total = 0
    for qi, q in enumerate(queries):
        dense = index.get_scores(q)
        np.testing.assert_allclose(
            s[qi], dense[i[qi]], rtol=1e-5, atol=1e-6
        )
        want = set(_expected_topk(dense, 10).tolist())
        hits += len(want & set(i[qi].tolist()))
        total += 10
    assert hits / total >= 0.8, (hits, total)
