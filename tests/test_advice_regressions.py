"""Regression tests for the round-1 advisor findings (ADVICE.md).

1. high  — sharded_flat_topk: zero pad rows must never evict real
   candidates from the last shard's local top-k (N not divisible by the
   corpus axis, >k true neighbors clustered in the last shard).
2. medium — lexical _encode_queries must not truncate long queries.
3. low   — sharded_sparse_topk: ELL pad docs (score 0.0) must not
   displace real docs with negative BM25 scores.
4. low   — IVFIndex.search with k larger than the candidate pool must
   backfill with -1 ids instead of failing at trace time.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from persian_rag_tpu.core.mesh import build_mesh
from persian_rag_tpu.index.lexical import BM25Index
from persian_rag_tpu.ops.flat_topk import flat_topk_ref
from persian_rag_tpu.parallel.sharded_search import (
    shard_corpus,
    sharded_flat_topk,
)

from tests.test_lexical import rank_bm25_reference


def test_sharded_l2_pad_rows_cannot_evict_last_shard_neighbors(rng):
    """N=1003 over 8 shards -> 5 zero pad rows in the last shard with
    squared distance exactly ||q||^2. Plant 16 true neighbors in the last
    shard whose distances straddle ||q||^2 so (without the fix) the pads
    evict the ones ranked just below them from the local top-k."""
    n, d, k = 1003, 32, 10
    q = np.full((1, d), np.sqrt(400.0 / d), np.float32)  # ||q||^2 = 400
    corpus = rng.standard_normal((n, d)).astype(np.float32) + 100.0  # far
    alphas = np.linspace(-0.02, 0.02, 16)
    alphas = alphas[alphas != 0.0]
    # rows 987..1002 all live in the last shard (rows 882..1002 of 8x126)
    for j, a in enumerate(alphas):
        corpus[987 + j] = a * q[0]  # dist = (1-a)^2 * 400, straddles 400

    want_s, want_i = flat_topk_ref(
        jnp.asarray(q), jnp.asarray(corpus), k, "l2"
    )
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    sharded, n_actual = shard_corpus(jnp.asarray(corpus), mesh)
    got_s, got_i = sharded_flat_topk(
        jnp.asarray(q), sharded, k, n_actual, mesh, metric="l2"
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(want_s), rtol=1e-4
    )


def test_sharded_dot_pad_rows_with_all_negative_scores(rng):
    """All real rows score negative (pads score 0 and would win the local
    merge); the 12 least-negative rows cluster in the last shard."""
    n, d, k = 1003, 32, 10
    q = rng.standard_normal((1, d)).astype(np.float32)
    q /= np.linalg.norm(q)
    corpus = rng.standard_normal((n, d)).astype(np.float32) - 5.0 * q[0]
    for j in range(12):
        corpus[990 + j] = (
            rng.standard_normal(d).astype(np.float32) * 0.01 - 0.5 * q[0]
        )
    assert (corpus @ q[0] < 0).all()

    want_s, want_i = flat_topk_ref(
        jnp.asarray(q), jnp.asarray(corpus), k, "dot"
    )
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    sharded, n_actual = shard_corpus(jnp.asarray(corpus), mesh)
    got_s, got_i = sharded_flat_topk(
        jnp.asarray(q), sharded, k, n_actual, mesh, metric="dot"
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_bm25_long_query_not_truncated():
    """An 80+-term query must score identically to the reference formula
    (previously slots past 64 were silently dropped)."""
    vocab = [f"t{i}" for i in range(120)]
    docs = [
        " ".join(vocab[i : i + 40] + vocab[: i % 7]) for i in range(0, 80, 5)
    ]
    index = BM25Index().build(docs)
    query = " ".join(vocab[:90])
    want = rank_bm25_reference([d.split() for d in docs], query.split())
    got = index.get_scores(query)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # the fused search path must agree with the dense scores too
    scores, ids = index.search([query], k=3)
    order = np.argsort(-want, kind="stable")[:3]
    np.testing.assert_array_equal(ids[0], order)
    np.testing.assert_allclose(scores[0], want[order], rtol=1e-5)


def test_tfidf_long_ngram_query_not_truncated():
    """(1,2)-gram queries exceed 64 term slots at ~33 words."""
    from persian_rag_tpu.index.lexical import TfidfIndex

    words = [f"word{i}" for i in range(40)]
    docs = [" ".join(words[i : i + 12]) for i in range(0, 30, 3)]
    index = TfidfIndex().build(docs)
    query = " ".join(words[:40])  # 40 unigrams + 39 bigrams = 79 terms
    dense = index.get_scores(query)
    scores, ids = index.search([query], k=3)
    order = np.argsort(-dense, kind="stable")[:3]
    np.testing.assert_array_equal(ids[0], order)
    np.testing.assert_allclose(scores[0], dense[order], rtol=1e-5)


def test_sharded_lexical_pad_docs_vs_negative_scores():
    """Every doc scores negative for the query (common term, negative
    floored idf); ELL pad docs score 0.0 and must not displace the global
    best, which lives in the partially-padded shard."""
    from persian_rag_tpu.parallel.sharded_lexical import (
        shard_ell,
        sharded_sparse_topk,
    )

    # 19 docs over 8 shards -> local_n=3, shard 6 = [doc18, pad, pad].
    docs = ["x x x y" for _ in range(18)] + ["x y"]
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    index = BM25Index().build(docs)
    dense = index.get_scores("x")
    assert (dense < 0).all(), "test premise: all scores negative"
    best = int(np.argmax(dense))
    assert best == 18

    qids, qvals = index._encode_queries([index._query_terms("x")])
    dev_ids, dev_vals, n_actual = shard_ell(
        jnp.asarray(index.doc_ids), jnp.asarray(index.doc_vals), mesh
    )
    s, i = sharded_sparse_topk(
        dev_ids, dev_vals, qids, qvals, 2, n_actual, mesh
    )
    want = np.argsort(-dense, kind="stable")[:2]
    np.testing.assert_array_equal(np.asarray(i)[0], want)


def test_ivf_k_exceeding_candidate_width_backfills(rng):
    from persian_rag_tpu.index.ivf import IVFIndex

    vectors = rng.standard_normal((300, 16)).astype(np.float32)
    index = IVFIndex(16, n_cells=30, nprobe=1, cell_cap=12).build(vectors)
    q = rng.standard_normal((2, 16)).astype(np.float32)
    # candidate pool is nprobe*cap + overflow, likely < 200
    scores, ids = index.search(q, k=200)
    assert ids.shape == (2, 200)
    valid = ids >= 0
    assert valid.any(), "some candidates must be returned"
    # backfilled slots carry -1 ids and sentinel distances
    if (~valid).any():
        assert np.isfinite(scores[valid]).all()
