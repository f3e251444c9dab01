"""Parity tests for the fused flat-search op against NumPy exact search.

Mirrors the verification role of the reference's index self-checks
(reference: src/create_embeddings.py:267-295) but as real assertions.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from persian_rag_tpu.ops.flat_topk import flat_topk, flat_topk_pallas, flat_topk_ref


def numpy_exact_topk(queries, corpus, k, metric):
    if metric == "dot":
        scores = queries @ corpus.T
        order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(scores, order, axis=1), order
    elif metric == "l2":
        d2 = (
            (queries**2).sum(1)[:, None]
            - 2 * queries @ corpus.T
            + (corpus**2).sum(1)[None, :]
        )
        order = np.argsort(d2, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(d2, order, axis=1), order
    raise ValueError(metric)


@pytest.mark.parametrize("metric", ["dot", "l2"])
@pytest.mark.parametrize("n,d,q,k", [(500, 64, 7, 5), (1301, 96, 33, 10)])
def test_ref_matches_numpy(rng, metric, n, d, q, k):
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    want_s, want_i = numpy_exact_topk(queries, corpus, k, metric)
    got_s, got_i = flat_topk_ref(jnp.asarray(queries), jnp.asarray(corpus), k, metric)
    np.testing.assert_array_equal(np.asarray(got_i), want_i)
    np.testing.assert_allclose(np.asarray(got_s), want_s, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("metric", ["dot", "l2"])
@pytest.mark.parametrize("n,d,q,k", [(700, 48, 5, 10), (2100, 130, 17, 3)])
def test_pallas_matches_ref(rng, metric, n, d, q, k):
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    want_s, want_i = flat_topk_ref(jnp.asarray(queries), jnp.asarray(corpus), k, metric)
    got_s, got_i = flat_topk_pallas(
        jnp.asarray(queries),
        jnp.asarray(corpus),
        k,
        metric,
        tile_n=256,
        tile_q=8,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), rtol=1e-4, atol=1e-4)


def test_tie_breaking_prefers_lower_index(rng):
    # Duplicate every corpus row: ties must resolve to the lower index
    # (FAISS flat-search semantics).
    base = rng.standard_normal((40, 16)).astype(np.float32)
    corpus = np.concatenate([base, base], axis=0)
    queries = rng.standard_normal((6, 16)).astype(np.float32)
    for fn in (
        lambda q, c: flat_topk_ref(q, c, 4, "dot"),
        lambda q, c: flat_topk_pallas(q, c, 4, "dot", tile_n=128, tile_q=8, interpret=True),
    ):
        _, idx = fn(jnp.asarray(queries), jnp.asarray(corpus))
        idx = np.asarray(idx)
        # best hit's duplicate partner is +40; lower index must appear first
        assert (idx[:, 0] < 40).all()


def test_k_clamped_to_corpus_size(rng):
    corpus = rng.standard_normal((3, 8)).astype(np.float32)
    queries = rng.standard_normal((2, 8)).astype(np.float32)
    s, i = flat_topk(jnp.asarray(queries), jnp.asarray(corpus), k=10, metric="dot")
    assert s.shape == (2, 3) and i.shape == (2, 3)
    assert set(np.asarray(i)[0].tolist()) == {0, 1, 2}


def test_l2_distances_are_true_squared_distances(rng):
    corpus = rng.standard_normal((100, 32)).astype(np.float32)
    queries = rng.standard_normal((4, 32)).astype(np.float32)
    d2, idx = flat_topk(jnp.asarray(queries), jnp.asarray(corpus), 3, "l2")
    d2 = np.asarray(d2)
    idx = np.asarray(idx)
    for qi in range(4):
        for rank in range(3):
            true = ((queries[qi] - corpus[idx[qi, rank]]) ** 2).sum()
            np.testing.assert_allclose(d2[qi, rank], true, rtol=1e-4, atol=1e-4)


def test_large_k_falls_back_to_reference(rng):
    corpus = rng.standard_normal((500, 32)).astype(np.float32)
    queries = rng.standard_normal((3, 32)).astype(np.float32)
    s, i = flat_topk(
        jnp.asarray(queries), jnp.asarray(corpus), k=200, metric="dot"
    )
    assert s.shape == (3, 200)
    want_s, want_i = flat_topk_ref(
        jnp.asarray(queries), jnp.asarray(corpus), 200, "dot"
    )
    np.testing.assert_array_equal(np.asarray(i), np.asarray(want_i))
