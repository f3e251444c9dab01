"""FAISS IndexIVFFlat file interop: write -> read roundtrip, import into
IVFIndex, export from IVFIndex, and search-parity through the import."""
import numpy as np
import pytest

from persian_rag_tpu.index import faiss_io
from persian_rag_tpu.index.ivf import IVFIndex


def _synthetic(rng, n=500, d=24, nlist=12):
    centroids = rng.standard_normal((nlist, d)).astype(np.float32) * 4
    assign = rng.integers(0, nlist, size=n).astype(np.int32)
    vectors = (
        centroids[assign] + rng.standard_normal((n, d)).astype(np.float32)
    )
    return vectors, centroids, assign


def test_ivf_write_read_roundtrip(tmp_path, rng):
    vectors, centroids, assign = _synthetic(rng)
    path = str(tmp_path / "ivf.index")
    faiss_io.write_faiss_ivf(
        path, vectors, centroids, assign, metric="l2", nprobe=4
    )
    data = faiss_io.read_faiss_ivf(path)
    np.testing.assert_array_equal(data["vectors"], vectors)
    np.testing.assert_array_equal(data["centroids"], centroids)
    np.testing.assert_array_equal(data["assign"], assign)
    assert data["metric"] == "l2" and data["nprobe"] == 4


def test_ivf_reader_rejects_flat_file(tmp_path, rng):
    path = str(tmp_path / "flat.index")
    faiss_io.write_faiss_flat(
        path, rng.standard_normal((10, 8)).astype(np.float32)
    )
    with pytest.raises(ValueError):
        faiss_io.read_faiss_ivf(path)
    # and the flat reader rejects IVF files with a clear error
    vectors, centroids, assign = _synthetic(rng, n=40, d=8, nlist=4)
    ivf_path = str(tmp_path / "ivf.index")
    faiss_io.write_faiss_ivf(ivf_path, vectors, centroids, assign)
    with pytest.raises(ValueError):
        faiss_io.read_faiss_flat(ivf_path)


def test_ivfindex_from_faiss_search_parity(tmp_path, rng):
    """Full-probe search through an imported file equals exact flat
    search (same vectors, same l2 semantics)."""
    vectors, centroids, assign = _synthetic(rng)
    path = str(tmp_path / "ivf.index")
    faiss_io.write_faiss_ivf(
        path, vectors, centroids, assign, metric="l2", nprobe=2
    )
    index = IVFIndex.from_faiss(path)
    assert index.ntotal == len(vectors)
    q = rng.standard_normal((5, vectors.shape[1])).astype(np.float32)
    s, i = index.search(q, 5, nprobe=index.n_cells)  # probe everything
    dists = ((q[:, None] - vectors[None]) ** 2).sum(-1)
    want = np.argsort(dists, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(i, want)


def test_ivfindex_export_import_roundtrip(tmp_path, rng):
    vectors = rng.standard_normal((400, 16)).astype(np.float32)
    built = IVFIndex(16, n_cells=10, nprobe=3).build(vectors)
    path = str(tmp_path / "out.index")
    built.export_faiss(path)
    back = IVFIndex.from_faiss(path)
    assert back.ntotal == 400 and back.n_cells == 10
    q = rng.standard_normal((4, 16)).astype(np.float32)
    s0, i0 = built.search(q, 6, nprobe=10)
    s1, i1 = back.search(q, 6, nprobe=10)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-5, atol=1e-5)


def test_ivf_export_with_overflow(tmp_path, rng):
    """Overflow rows must survive export (assigned to nearest centroid)."""
    vectors = rng.standard_normal((300, 12)).astype(np.float32)
    built = IVFIndex(12, n_cells=8, nprobe=8, cell_cap=10).build(vectors)
    assert built._overflow is not None, "test premise: overflow exists"
    path = str(tmp_path / "ovf.index")
    built.export_faiss(path)
    data = faiss_io.read_faiss_ivf(path)
    np.testing.assert_allclose(data["vectors"], vectors, rtol=1e-6)
    assert (data["assign"] >= 0).all()


def test_retrieval_system_loads_ivf_index_file(tmp_path, rng):
    from persian_rag_tpu.retrieval.system import RetrievalSystem

    vectors, centroids, assign = _synthetic(rng, n=60, d=16, nlist=6)
    path = str(tmp_path / "drugs_ivf.index")
    faiss_io.write_faiss_ivf(path, vectors, centroids, assign, nprobe=6)
    chunks = [{"id": f"c{i}", "text": f"chunk {i}"} for i in range(60)]
    rs = RetrievalSystem(method="dense")
    assert rs.load_chunks_and_index(chunks, path)
    assert isinstance(rs.dense_index, IVFIndex)
    out = rs.dense_index.search(vectors[:3], 1, nprobe=6)
    assert (out[1][:, 0] == np.arange(3)).all()
