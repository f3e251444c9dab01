"""Sharded search must return identical ids on 1-device and 8-device meshes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from persian_rag_tpu.core.mesh import build_mesh
from persian_rag_tpu.ops.flat_topk import flat_topk_ref
from persian_rag_tpu.parallel.sharded_search import shard_corpus, sharded_flat_topk


@pytest.mark.parametrize("metric", ["dot", "l2"])
@pytest.mark.parametrize("n", [1000, 1003])  # non-divisible N exercises padding
def test_sharded_matches_single_chip(rng, metric, n):
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    corpus = rng.standard_normal((n, 64)).astype(np.float32)
    queries = rng.standard_normal((9, 64)).astype(np.float32)
    k = 10

    want_s, want_i = flat_topk_ref(
        jnp.asarray(queries), jnp.asarray(corpus), k, metric
    )

    for n_dev in (1, 8):
        mesh = build_mesh(corpus_axis=n_dev, data_axis=1)
        sharded, n_actual = shard_corpus(jnp.asarray(corpus), mesh)
        got_s, got_i = sharded_flat_topk(
            jnp.asarray(queries), sharded, k, n_actual, mesh, metric=metric
        )
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_allclose(
            np.asarray(got_s), np.asarray(want_s), rtol=1e-4, atol=1e-4
        )


def test_small_corpus_fewer_rows_than_shards(rng):
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    corpus = rng.standard_normal((5, 16)).astype(np.float32)
    queries = rng.standard_normal((2, 16)).astype(np.float32)
    sharded, n_actual = shard_corpus(jnp.asarray(corpus), mesh)
    s, i = sharded_flat_topk(jnp.asarray(queries), sharded, 5, n_actual, mesh)
    assert sorted(np.asarray(i)[0].tolist()) == [0, 1, 2, 3, 4]


def test_sharded_fast_mode_set_recall(rng):
    mesh = build_mesh(corpus_axis=4, data_axis=1)
    corpus = rng.standard_normal((801, 32)).astype(np.float32)
    queries = rng.standard_normal((5, 32)).astype(np.float32)
    want_s, want_i = flat_topk_ref(
        jnp.asarray(queries), jnp.asarray(corpus), 8, "dot"
    )
    sharded, n_actual = shard_corpus(jnp.asarray(corpus), mesh)
    got_s, got_i = sharded_flat_topk(
        jnp.asarray(queries), sharded, 8, n_actual, mesh,
        metric="dot", mode="fast",
    )
    for q in range(5):
        assert set(np.asarray(got_i)[q]) == set(np.asarray(want_i)[q])
