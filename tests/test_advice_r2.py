"""Regression tests for the round-2 advisor findings (ADVICE.md).

1. high   — hybrid/dense retrieval with rerank=True over an IVF dense
   index must not raise (IVFIndex now implements rows(); the fast path
   is additionally hasattr-gated).
2. medium — rebuilding a mesh-backed BM25/TF-IDF index must invalidate
   the jitted mesh search closures (they bake bucket count/kbs/
   n_actuals of the previous build).
3. low    — int8 storage must not build the bf16 stage-1 image or f32
   sqnorms (no int8 search path consumes them; the bf16 copy alone
   would triple per-element HBM).
4. low    — the rerank stored-vector fast path only engages when index
   rows are certified to live in this system's embedding space.
"""
import jax.numpy as jnp
import numpy as np

from persian_rag_tpu.core.mesh import build_mesh
from persian_rag_tpu.index.dense import DenseIndex
from persian_rag_tpu.index.ivf import IVFIndex
from persian_rag_tpu.index.lexical import BM25Index
from persian_rag_tpu.retrieval.system import RetrievalSystem

from tests.test_retrieval_system import CHUNKS, make_encoder


def test_ivf_rows_gather_matches_stored_vectors(rng):
    vectors = rng.standard_normal((300, 16)).astype(np.float32)
    index = IVFIndex(16, n_cells=30, nprobe=4, cell_cap=8).build(vectors)
    ids = np.array([0, 5, 123, 299, 123, 42])
    got = index.rows(ids)
    np.testing.assert_allclose(got, vectors[ids], rtol=1e-6)


def test_ivf_rows_after_save_load(rng, tmp_path):
    vectors = rng.standard_normal((120, 8)).astype(np.float32)
    index = IVFIndex(8, n_cells=10, nprobe=2, cell_cap=6).build(vectors)
    path = str(tmp_path / "ivf.npz")
    index.save(path)
    loaded = IVFIndex.load(path)
    ids = np.arange(0, 120, 7)
    np.testing.assert_allclose(loaded.rows(ids), vectors[ids], rtol=1e-6)


def test_hybrid_rerank_with_ivf_dense_index_does_not_raise():
    """Round-2 regression: rerank=True + dense_index_type='ivf' raised
    AttributeError (IVFIndex had no rows())."""
    rs = RetrievalSystem(
        method="hybrid", encoder=make_encoder(),
        dense_index_type="ivf", ivf_cells=3, ivf_nprobe=3,
    )
    assert rs.load_chunks_and_index(CHUNKS)
    results = rs.retrieve_hybrid_batch(
        ["دارو برای درمان"], top_k=3, rerank=True
    )
    assert len(results[0]) >= 1


def test_mesh_lexical_rebuild_invalidates_fused_cache():
    """Round-2 regression: after rebuilding a mesh-backed BM25 index on a
    different corpus, the cached jitted closures returned the OLD build's
    top-k. Rebuilt index must match a fresh one exactly."""
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    vocab = [f"term{i}" for i in range(37)]
    docs_a = [
        " ".join(vocab[i % 11: i % 11 + 5] * (1 + i % 3)) for i in range(73)
    ]
    docs_b = [
        " ".join(vocab[i % 13: i % 13 + 7] * (1 + i % 4)) for i in range(95)
    ]
    # make one doc of the second corpus the unambiguous best hit
    docs_b[81] = "needle needle needle needle " + docs_b[81]
    query = "needle term3 term4"

    index = BM25Index(mesh=mesh).build(docs_a)
    index.search([query], k=5)  # populate the jitted mesh cache
    index2 = BM25Index(mesh=mesh).build(docs_b)  # fresh, never cached
    want_s, want_i = index2.search([query], k=5)

    # rebuild the SAME object in place
    index.build(docs_b)
    got_s, got_i = index.search([query], k=5)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-6)
    assert got_i[0, 0] == 81


def test_int8_storage_skips_stage1_caches(rng):
    v = rng.standard_normal((64, 32)).astype(np.float32)
    idx = DenseIndex(32, metric="ip", storage_dtype=jnp.int8)
    idx.add(v)
    idx.commit()
    assert idx._stage1_bf16 is None
    assert idx._sqnorms is None
    assert idx._refine_corpus is not None


def test_rerank_fast_path_requires_encoder_provenance(rng, monkeypatch):
    """Caller-supplied embeddings marked foreign must re-encode for
    rerank, not gather stored rows from a different embedding space."""
    encoder = make_encoder()
    # embeddings deliberately NOT from the encoder
    foreign = rng.standard_normal((len(CHUNKS), 32)).astype(np.float32)

    rs = RetrievalSystem(method="dense", encoder=encoder)
    assert rs.load_chunks_and_index(
        CHUNKS, embeddings=foreign, embeddings_from_encoder=False
    )
    assert rs._rows_match_encoder is False
    calls = {"rows": 0}
    orig = rs.dense_index.rows

    def spy(ids):
        calls["rows"] += 1
        return orig(ids)

    monkeypatch.setattr(rs.dense_index, "rows", spy)
    cands = rs.retrieve_dense_batch([CHUNKS[0]["text"]], top_k=3)
    out = rs.rerank_batch([CHUNKS[0]["text"]], cands)
    assert calls["rows"] == 0  # fell back to re-encoding
    assert len(out[0]) == len(cands[0])

    # encoder-built index keeps the fast path
    rs2 = RetrievalSystem(method="dense", encoder=encoder)
    assert rs2.load_chunks_and_index(CHUNKS)
    assert rs2._rows_match_encoder is True
