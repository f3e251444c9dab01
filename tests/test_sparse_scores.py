"""Parity tests for the padded-ELL lexical scoring op."""
import numpy as np
import jax.numpy as jnp
import pytest

from persian_rag_tpu.ops.sparse_scores import (
    sparse_scores_ref,
    sparse_topk,
    sparse_topk_pallas,
)


def make_corpus(rng, n_docs, vocab, max_len):
    ids = np.full((n_docs, max_len), -1, np.int32)
    vals = np.zeros((n_docs, max_len), np.float32)
    for d in range(n_docs):
        length = rng.integers(1, max_len + 1)
        terms = rng.choice(vocab, size=length, replace=False)
        ids[d, :length] = terms
        vals[d, :length] = rng.random(length).astype(np.float32)
    return ids, vals


def make_queries(rng, b, vocab, t):
    qids = np.full((b, t), -1, np.int32)
    qvals = np.zeros((b, t), np.float32)
    for i in range(b):
        length = rng.integers(1, t + 1)
        qids[i, :length] = rng.choice(vocab, size=length, replace=False)
        qvals[i, :length] = rng.random(length).astype(np.float32)
    return qids, qvals


def brute_force(ids, vals, qids, qvals):
    b, n = qids.shape[0], ids.shape[0]
    out = np.zeros((b, n), np.float32)
    for bi in range(b):
        lookup = {
            int(t): float(v) for t, v in zip(qids[bi], qvals[bi]) if t >= 0
        }
        for d in range(n):
            s = 0.0
            for t, v in zip(ids[d], vals[d]):
                if t >= 0 and int(t) in lookup:
                    s += lookup[int(t)] * v
            out[bi, d] = s
    return out


def test_ref_matches_bruteforce(rng):
    ids, vals = make_corpus(rng, n_docs=60, vocab=200, max_len=12)
    qids, qvals = make_queries(rng, b=5, vocab=200, t=6)
    want = brute_force(ids, vals, qids, qvals)
    got = sparse_scores_ref(
        jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(qids), jnp.asarray(qvals)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_docs,max_len,b,t,k", [(300, 20, 4, 8, 5), (513, 9, 3, 5, 10)])
def test_pallas_topk_matches_ref(rng, n_docs, max_len, b, t, k):
    ids, vals = make_corpus(rng, n_docs=n_docs, vocab=500, max_len=max_len)
    qids, qvals = make_queries(rng, b=b, vocab=500, t=t)
    dense = np.asarray(
        sparse_scores_ref(
            jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(qids), jnp.asarray(qvals)
        )
    )
    got_s, got_i = sparse_topk_pallas(
        jnp.asarray(ids),
        jnp.asarray(vals),
        jnp.asarray(qids),
        jnp.asarray(qvals),
        k=k,
        tile_n=128,
        interpret=True,
    )
    got_s, got_i = np.asarray(got_s), np.asarray(got_i)
    order = np.argsort(-dense, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(got_i, order)
    np.testing.assert_allclose(
        got_s, np.take_along_axis(dense, order, axis=1), rtol=1e-5, atol=1e-5
    )


def test_dispatcher_cpu_path(rng):
    ids, vals = make_corpus(rng, n_docs=50, vocab=100, max_len=6)
    qids, qvals = make_queries(rng, b=2, vocab=100, t=4)
    s, i = sparse_topk(
        jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(qids), jnp.asarray(qvals), k=3
    )
    assert s.shape == (2, 3) and i.shape == (2, 3)
