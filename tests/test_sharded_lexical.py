"""Sharded lexical + 2-D dense search equal single-chip results."""
import numpy as np
import pytest

from persian_rag_tpu.core.mesh import build_mesh
from persian_rag_tpu.index.lexical import BM25Index, TfidfIndex
from persian_rag_tpu.ops.flat_topk import flat_topk_ref
from persian_rag_tpu.parallel.sharded_search import (
    shard_corpus,
    sharded_flat_topk_2d,
)

CORPUS = [
    f"document {i} about topic{i % 13} and subject{i % 7} words{i % 3}"
    for i in range(101)
]


@pytest.mark.parametrize("cls", [BM25Index, TfidfIndex])
def test_sharded_lexical_matches_single_chip(cls):
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    plain = cls().build(CORPUS)
    sharded = cls(mesh=mesh).build(CORPUS)
    queries = ["topic3 subject2 words1", "document about topic5"]
    s1, i1 = plain.search(queries, k=7)
    s2, i2 = sharded.search(queries, k=7)
    np.testing.assert_allclose(
        np.sort(s1, axis=1), np.sort(s2, axis=1), rtol=1e-5, atol=1e-6
    )
    for q in range(len(queries)):
        assert set(i1[q]) == set(i2[q])


def test_2d_sharded_dense_matches_reference(rng):
    import jax.numpy as jnp

    mesh = build_mesh(corpus_axis=4, data_axis=2)
    corpus = rng.standard_normal((333, 48)).astype(np.float32)
    queries = rng.standard_normal((11, 48)).astype(np.float32)  # pads to 12
    want_s, want_i = flat_topk_ref(
        jnp.asarray(queries), jnp.asarray(corpus), 10, "dot"
    )
    sharded, n_actual = shard_corpus(jnp.asarray(corpus), mesh)
    got_s, got_i = sharded_flat_topk_2d(
        jnp.asarray(queries), sharded, 10, n_actual, mesh, metric="dot"
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(want_s), rtol=1e-4, atol=1e-4
    )


def test_2d_sharded_l2(rng):
    import jax.numpy as jnp

    mesh = build_mesh(corpus_axis=4, data_axis=2)
    corpus = rng.standard_normal((200, 32)).astype(np.float32)
    queries = rng.standard_normal((4, 32)).astype(np.float32)
    want_s, want_i = flat_topk_ref(
        jnp.asarray(queries), jnp.asarray(corpus), 5, "l2"
    )
    sharded, n_actual = shard_corpus(jnp.asarray(corpus), mesh)
    got_s, got_i = sharded_flat_topk_2d(
        jnp.asarray(queries), sharded, 5, n_actual, mesh, metric="l2"
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


@pytest.mark.parametrize("cls", [BM25Index, TfidfIndex])
def test_sharded_bucketed_lexical_matches_single_chip(cls):
    """Varied doc lengths force multiple length buckets; the mesh path's
    one-dispatch all-bucket merge must equal the single-chip result."""
    docs = []
    for i in range(73):
        n_words = 3 if i % 3 == 0 else (20 if i % 3 == 1 else 90)
        docs.append(
            " ".join(f"tok{(i * 7 + j) % 41}" for j in range(n_words))
        )
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    plain = cls().build(docs)
    sharded = cls(mesh=mesh).build(docs)
    assert sharded._buckets is not None and len(sharded._buckets) > 1
    queries = ["tok3 tok11 tok40", "tok0", "tok17 tok17 tok5"]
    s1, i1 = plain.search(queries, k=9)
    s2, i2 = sharded.search(queries, k=9)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i1, i2)


def test_sharded_bucketed_k_exceeds_corpus():
    """k > ntotal over a tiny multi-bucket corpus must clamp identically
    on the mesh and single-chip paths (short-result edge of the fused
    all-bucket merge)."""
    docs = [
        "a b c",
        "a b c d e f g h i j k l m n o p q r s t u v w x y z",
        "a a a",
        "z y x w v u t s r q p o n m l k j i h g f e d c b a",
        "b c",
    ]
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    plain = BM25Index().build(docs)
    sharded = BM25Index(mesh=mesh).build(docs)
    assert sharded._buckets is not None and len(sharded._buckets) > 1
    s1, i1 = plain.search(["a b", "zzz"], k=10)
    s2, i2 = sharded.search(["a b", "zzz"], k=10)
    assert s1.shape == s2.shape == (2, len(docs))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("bucketed", [False, True])
def test_sharded_union_kernel_matches_single_chip(bucketed):
    """batch_kernel='union' on a mesh routes each shard's scan through
    the batch-dedup union kernel; ids must match the single-chip flat
    result (per-shard dedup replicates — queries are replicated)."""
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    rng = np.random.default_rng(23)
    docs = [
        " ".join(map(str, rng.zipf(1.4, size=rng.integers(5, 12)) % 300))
        for _ in range(137)
    ]
    if bucketed:
        docs[2] = " ".join(map(str, rng.zipf(1.4, size=500) % 300))
    plain = BM25Index().build(docs)
    sharded = BM25Index(mesh=mesh).build(docs)
    assert (sharded._buckets is not None) == bucketed
    queries = [
        " ".join(map(str, rng.zipf(1.4, size=5) % 300)) for _ in range(16)
    ]
    plain.batch_kernel = "flat"
    s1, i1 = plain.search(queries, k=7)
    sharded.batch_kernel = "union"
    s2, i2 = sharded.search(queries, k=7)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)
