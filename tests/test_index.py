"""Dense index + FAISS file-format interop tests."""
import os

import numpy as np
import pytest

from persian_rag_tpu.core.mesh import build_mesh
from persian_rag_tpu.index.dense import DenseIndex
from persian_rag_tpu.index.faiss_io import read_faiss_flat, write_faiss_flat

REFERENCE_INDEX = (
    "/root/reference/results/faiss/drugs_word_chunks.index"
)


def test_faiss_roundtrip(tmp_path, rng):
    vectors = rng.standard_normal((37, 24)).astype(np.float32)
    path = str(tmp_path / "x.index")
    write_faiss_flat(path, vectors, metric="l2")
    loaded, metric = read_faiss_flat(path)
    assert metric == "l2"
    np.testing.assert_array_equal(loaded, vectors)


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_INDEX), reason="reference artifacts absent"
)
def test_reads_reference_shipped_index():
    vectors, metric = read_faiss_flat(REFERENCE_INDEX)
    assert metric == "l2"
    assert vectors.shape[1] == 512  # distiluse dimensionality
    assert vectors.shape[0] > 100
    assert np.isfinite(vectors).all()


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_INDEX), reason="reference artifacts absent"
)
def test_search_over_reference_index_matches_numpy():
    index = DenseIndex.from_faiss(REFERENCE_INDEX)
    vectors = index.vectors()
    queries = vectors[:5] + 0.01  # near-duplicates of known rows
    d2, ids = index.search(queries, k=3)
    brute = (
        (queries**2).sum(1)[:, None]
        - 2 * queries @ vectors.T
        + (vectors**2).sum(1)[None, :]
    )
    want = np.argsort(brute, axis=1, kind="stable")[:, :3]
    np.testing.assert_array_equal(ids, want)
    np.testing.assert_allclose(
        d2, np.take_along_axis(brute, want, axis=1), rtol=1e-3, atol=1e-4
    )


def test_dense_index_l2_and_ip(rng):
    vectors = rng.standard_normal((200, 32)).astype(np.float32)
    queries = rng.standard_normal((4, 32)).astype(np.float32)

    for metric in ("l2", "ip", "cosine"):
        index = DenseIndex(32, metric=metric)
        index.add(vectors[:100])
        index.add(vectors[100:])
        index.commit()
        scores, ids = index.search(queries, k=7)
        if metric == "l2":
            brute = (
                (queries**2).sum(1)[:, None]
                - 2 * queries @ vectors.T
                + (vectors**2).sum(1)[None, :]
            )
            want = np.argsort(brute, axis=1, kind="stable")[:, :7]
        elif metric == "ip":
            brute = queries @ vectors.T
            want = np.argsort(-brute, axis=1, kind="stable")[:, :7]
        else:
            qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
            vn = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
            brute = qn @ vn.T
            want = np.argsort(-brute, axis=1, kind="stable")[:, :7]
        np.testing.assert_array_equal(ids, want)


def test_dense_index_save_load(tmp_path, rng):
    vectors = rng.standard_normal((50, 16)).astype(np.float32)
    index = DenseIndex(16, metric="cosine")
    index.add(vectors)
    index.save(str(tmp_path / "idx"))
    loaded = DenseIndex.load(str(tmp_path / "idx"))
    assert loaded.metric == "cosine"
    assert loaded.ntotal == 50
    q = rng.standard_normal((2, 16)).astype(np.float32)
    s1, i1 = index.search(q, 5)
    s2, i2 = loaded.search(q, 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_dense_index_sharded_matches_unsharded(rng):
    vectors = rng.standard_normal((203, 48)).astype(np.float32)
    queries = rng.standard_normal((3, 48)).astype(np.float32)
    plain = DenseIndex(48, metric="l2")
    plain.add(vectors)
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    sharded = DenseIndex(48, metric="l2", mesh=mesh)
    sharded.add(vectors)
    s1, i1 = plain.search(queries, 10)
    s2, i2 = sharded.search(queries, 10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-4)


def test_faiss_export_import(tmp_path, rng):
    vectors = rng.standard_normal((30, 8)).astype(np.float32)
    index = DenseIndex(8, metric="l2")
    index.add(vectors)
    path = str(tmp_path / "export.index")
    index.export_faiss(path)
    back = DenseIndex.from_faiss(path)
    np.testing.assert_array_equal(back.vectors(), vectors)


def test_int8_storage_high_recall(rng):
    vectors = rng.standard_normal((600, 64)).astype(np.float32)
    queries = rng.standard_normal((16, 64)).astype(np.float32)
    exact = DenseIndex(64, metric="cosine")
    exact.add(vectors)
    compact = DenseIndex(64, metric="cosine", storage_dtype="int8")
    compact.add(vectors)
    _, want = exact.search(queries, 10)
    scores, got = compact.search(queries, 10)
    recall = np.mean(
        [len(set(got[q]) & set(want[q])) / 10 for q in range(16)]
    )
    assert recall >= 0.9, recall
    # dequantized vectors are close to the originals
    deq = compact.vectors()
    vn = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
    np.testing.assert_allclose(deq, vn, atol=0.02)
    # top-1 self-match survives quantization
    s, i = compact.search(vectors[:5], 1)
    assert (i[:, 0] == np.arange(5)).all()


def test_int8_rejects_l2_and_unrefined_mesh(rng):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        DenseIndex(8, metric="l2", storage_dtype="int8")
    # a mesh int8 tier is supported WITH a refine copy (round 3); only
    # the raw no-refine int8 serving mode stays single-chip
    mesh = build_mesh(corpus_axis=2, data_axis=1)
    with _pytest.raises(ValueError):
        DenseIndex(8, metric="cosine", storage_dtype="int8", mesh=mesh,
                   refine_dtype=None)
    DenseIndex(8, metric="cosine", storage_dtype="int8", mesh=mesh)


def test_int8_incremental_add(rng):
    a = rng.standard_normal((40, 16)).astype(np.float32)
    b = rng.standard_normal((40, 16)).astype(np.float32)
    index = DenseIndex(16, metric="cosine", storage_dtype="int8")
    index.add(a)
    index.commit()
    index.add(b)
    index.commit()
    assert index.ntotal == 80
    s, i = index.search(b[:3], 1)
    assert (i[:, 0] == np.arange(40, 43)).all()
