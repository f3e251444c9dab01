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


# -- 2-D (query-dp x corpus) serving path ------------------------------------


@pytest.mark.parametrize("metric", ["dot", "l2"])
def test_2d_path_with_serving_caches_matches_ref(rng, metric):
    """sharded_flat_topk_2d with threaded sqnorm/bf16 caches returns the
    same ids as the unsharded reference scan (non-divisible N and a
    query count not divisible by the data axis)."""
    from persian_rag_tpu.parallel.sharded_search import sharded_flat_topk_2d

    n, d, k = 1003, 32, 7
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((9, d)).astype(np.float32)
    want_s, want_i = flat_topk_ref(
        jnp.asarray(queries), jnp.asarray(corpus), k, metric
    )
    mesh = build_mesh(corpus_axis=4, data_axis=2)
    sharded, n_actual = shard_corpus(jnp.asarray(corpus), mesh)
    csq = jnp.sum(sharded.astype(jnp.float32) ** 2, axis=-1)
    c16 = sharded.astype(jnp.bfloat16)
    got_s, got_i = sharded_flat_topk_2d(
        jnp.asarray(queries), sharded, k, n_actual, mesh, metric=metric,
        corpus_sqnorm_sharded=csq, corpus_bf16_sharded=c16,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(want_s), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_dense_index_mesh_routes_2d_with_caches(rng, metric):
    """DenseIndex.search on a (4, 2) mesh uses the 2-D data-parallel
    path for batches >= data axis and returns single-chip-identical
    results, with the commit()-built caches threaded through."""
    from persian_rag_tpu.index.dense import DenseIndex

    n, d, k = 515, 24, 6
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((10, d)).astype(np.float32)

    single = DenseIndex(d, metric=metric)
    single.add(vectors)
    single.commit()
    want_s, want_i = single.search(queries, k)
    ref_metric = "dot" if metric == "ip" else metric
    ref_s, ref_i = flat_topk_ref(
        jnp.asarray(queries), jnp.asarray(vectors), k, ref_metric
    )
    np.testing.assert_array_equal(want_i, np.asarray(ref_i))

    mesh = build_mesh(corpus_axis=4, data_axis=2)
    idx = DenseIndex(d, metric=metric, mesh=mesh)
    idx.add(vectors)
    idx.commit()
    assert idx._sqnorms is not None  # caches built and sharded
    got_s, got_i = idx.search(queries, k)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-4, atol=1e-4)

    # small batches (< data axis) fall back to the replicated-query path
    got_s1, got_i1 = idx.search(queries[:1], k)
    np.testing.assert_array_equal(got_i1, want_i[:1])


def test_dense_index_bf16_storage_on_mesh_matches_single_chip(rng):
    """bf16 storage tier on a data-axis mesh: ids identical to the
    single-chip bf16 tier (the corpus IS the stage-1 image)."""
    from persian_rag_tpu.index.dense import DenseIndex

    n, d, k = 700, 32, 8
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((6, d)).astype(np.float32)

    single = DenseIndex(d, metric="ip", storage_dtype=jnp.bfloat16)
    single.add(vectors)
    single.commit()
    want_s, want_i = single.search(queries, k)

    mesh = build_mesh(corpus_axis=4, data_axis=2)
    idx = DenseIndex(d, metric="ip", mesh=mesh, storage_dtype=jnp.bfloat16)
    idx.add(vectors)
    idx.commit()
    got_s, got_i = idx.search(queries, k)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-2, atol=1e-2)


def test_dense_index_int8_tier_on_mesh(rng):
    """int8 candidate tier + exact refine on a corpus-sharded mesh.
    Per-shard candidate sets are a superset of the single-chip global
    selection, so recall vs the exact scan must be >= the single-chip
    int8 tier's; a 1-device mesh must match the single-chip tier
    exactly."""
    from persian_rag_tpu.index.dense import DenseIndex

    n, d, k = 1003, 32, 10
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((16, d)).astype(np.float32)

    exact = DenseIndex(d, metric="cosine")
    exact.add(vectors)
    exact.commit()
    _, want = exact.search(queries, k)

    single = DenseIndex(d, metric="cosine", storage_dtype=jnp.int8)
    single.add(vectors)
    single.commit()
    _, got1 = single.search(queries, k)

    def recall(got):
        return np.mean(
            [len(set(got[q]) & set(want[q])) / k for q in range(len(got))]
        )

    mesh1 = build_mesh(corpus_axis=1, data_axis=1)
    idx1 = DenseIndex(d, metric="cosine", mesh=mesh1,
                      storage_dtype=jnp.int8)
    idx1.add(vectors)
    idx1.commit()
    s1m, i1m = idx1.search(queries, k)
    np.testing.assert_array_equal(i1m, got1)

    mesh = build_mesh(corpus_axis=8, data_axis=1)
    idx = DenseIndex(d, metric="cosine", mesh=mesh, storage_dtype=jnp.int8)
    idx.add(vectors)
    idx.commit()
    s8, i8 = idx.search(queries, k)
    assert recall(i8) >= recall(got1) - 1e-9
    assert recall(i8) >= 0.95
    # refined scores are exact cosines for the rows they name
    vn = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    true = np.einsum("qd,qkd->qk", qn, vn[np.maximum(i8, 0)])
    np.testing.assert_allclose(s8, true, rtol=1e-4, atol=1e-5)


def test_dense_index_int8_mesh_requires_refine_copy():
    from persian_rag_tpu.index.dense import DenseIndex

    mesh = build_mesh(corpus_axis=8, data_axis=1)
    with pytest.raises(ValueError, match="refine"):
        DenseIndex(16, metric="ip", mesh=mesh, storage_dtype=jnp.int8,
                   refine_dtype=None)
