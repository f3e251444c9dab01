"""One-dispatch device hybrid fusion (+rerank) vs the host fusion loop.

The device path must be score- and order-identical to the host
implementation (which itself mirrors reference src/retrieval.py:174-216),
including channel max-normalization guards, dedup-by-id keeping the
dense occurrence, and stable tie order.
"""
import numpy as np
import pytest

from persian_rag_tpu.ops.hybrid_fusion import fuse_hybrid, rerank_cosine
from persian_rag_tpu.retrieval.system import RetrievalSystem

from tests.test_retrieval_system import CHUNKS, make_encoder

QUERIES = [
    "دارو برای درمان بیماری",
    "قلب خون بدن",
    "واکسن پیشگیری عفونی",
    "سموم کبد",
]


def _ids_scores(results):
    return [
        [(c["id"], round(s, 5)) for c, s in row] for row in results
    ]


@pytest.fixture(scope="module")
def hybrid_rs():
    rs = RetrievalSystem(method="hybrid", encoder=make_encoder())
    assert rs.load_chunks_and_index(CHUNKS)
    return rs


def test_fused_hybrid_matches_host(hybrid_rs):
    rs = hybrid_rs
    assert rs._hybrid_fused_supported()
    host = rs.retrieve_hybrid_batch(QUERIES, top_k=4, fused=False)
    dev = rs.retrieve_hybrid_batch(QUERIES, top_k=4, fused=True)
    for h, d in zip(host, dev):
        assert [c["id"] for c, _ in h] == [c["id"] for c, _ in d]
        np.testing.assert_allclose(
            [s for _, s in h], [s for _, s in d], rtol=1e-5, atol=1e-6
        )


def test_fused_hybrid_rerank_matches_host(hybrid_rs):
    rs = hybrid_rs
    host = rs.retrieve_hybrid_batch(
        QUERIES, top_k=3, rerank=True, fused=False
    )
    dev = rs.retrieve_hybrid_batch(QUERIES, top_k=3, rerank=True, fused=True)
    for h, d in zip(host, dev):
        assert [c["id"] for c, _ in h] == [c["id"] for c, _ in d]
        np.testing.assert_allclose(
            [s for _, s in h], [s for _, s in d], rtol=1e-4, atol=1e-5
        )


def test_fused_hybrid_nondefault_weights(hybrid_rs):
    rs = hybrid_rs
    host = rs.retrieve_hybrid_batch(
        QUERIES[:2], top_k=4, dense_weight=0.3, bm25_weight=0.7, fused=False
    )
    dev = rs.retrieve_hybrid_batch(
        QUERIES[:2], top_k=4, dense_weight=0.3, bm25_weight=0.7, fused=True
    )
    assert _ids_scores(host) == _ids_scores(dev)


def test_fused_hybrid_k_exceeding_corpus(hybrid_rs):
    rs = hybrid_rs
    host = rs.retrieve_hybrid_batch(QUERIES[:1], top_k=50, fused=False)
    dev = rs.retrieve_hybrid_batch(QUERIES[:1], top_k=50, fused=True)
    assert [c["id"] for c, _ in host[0]] == [c["id"] for c, _ in dev[0]]


def test_fused_hybrid_cosine_metric():
    rs = RetrievalSystem(
        method="hybrid", encoder=make_encoder(), dense_metric="cosine"
    )
    assert rs.load_chunks_and_index(CHUNKS)
    host = rs.retrieve_hybrid_batch(QUERIES, top_k=4, fused=False)
    dev = rs.retrieve_hybrid_batch(QUERIES, top_k=4, fused=True)
    assert _ids_scores(host) == _ids_scores(dev)


def test_fused_gate_respects_rerank_provenance(rng):
    """Foreign embeddings + rerank must NOT take the device path (its
    rerank gathers stored rows; host path re-encodes)."""
    enc = make_encoder()
    foreign = rng.standard_normal((len(CHUNKS), 32)).astype(np.float32)
    rs = RetrievalSystem(method="hybrid", encoder=enc)
    assert rs.load_chunks_and_index(
        CHUNKS, embeddings=foreign, embeddings_from_encoder=False
    )
    # without rerank the fused path is still legal
    out = rs.retrieve_hybrid_batch(QUERIES[:1], top_k=3)
    assert out[0]
    # with rerank it must fall back to the host loop (spy on the fused fn)
    called = {"n": 0}
    orig = rs._retrieve_hybrid_fused

    def spy(*a, **k):
        called["n"] += 1
        return orig(*a, **k)

    rs._retrieve_hybrid_fused = spy
    rs.retrieve_hybrid_batch(QUERIES[:1], top_k=3, rerank=True)
    assert called["n"] == 0


def test_fuse_hybrid_dedup_keeps_dense_occurrence():
    """An id in both channels gets one fused entry carrying both
    contributions (host dict semantics)."""
    import jax.numpy as jnp

    d_s = jnp.asarray([[1.0, 4.0]])  # l2 distances -> sims 0.5, 0.2
    d_i = jnp.asarray([[7, 3]])
    l_s = jnp.asarray([[2.0, 1.0]])
    l_i = jnp.asarray([[3, 9]])
    s, i = fuse_hybrid(d_s, d_i, l_s, l_i, k=4, dense_sim="l2")
    s, i = np.asarray(s)[0], np.asarray(i)[0]
    # dense sims: id7=0.5 (max) -> 1.0*0.6, id3=0.2 -> 0.4*0.6=0.24
    # bm25: id3=2.0 (max) -> 1.0*0.4, id9=1.0 -> 0.5*0.4=0.2
    # fused: id3 = 0.24+0.4 = 0.64, id7 = 0.6, id9 = 0.2; no dup id3
    want = {3: 0.64, 7: 0.6, 9: 0.2}
    got = {int(ii): float(ss) for ss, ii in zip(s, i) if ii >= 0}
    assert set(got) == set(want)
    for key_ in want:
        np.testing.assert_allclose(got[key_], want[key_], rtol=1e-6)


def test_rerank_cosine_invalid_slots_stay_masked(rng):
    import jax.numpy as jnp

    q = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)
    rows = jnp.asarray(rng.standard_normal((1, 3, 8)), jnp.float32)
    ids = jnp.asarray([[4, -1, 2]])
    fused = jnp.asarray([[0.9, -3e38, 0.1]])
    s, i = rerank_cosine(q, rows, fused, ids)
    i = np.asarray(i)[0]
    assert set(i[:2]) == {4, 2}
    assert i[2] == -1


def test_hybrid_on_mesh_matches_single_chip(hybrid_rs):
    """Hybrid retrieval composes with mesh-sharded dense + lexical
    indexes (fused single-dispatch is single-chip-only; on a mesh the
    host fusion consumes the sharded channels) and must return the same
    ids/scores as the single-chip host path."""
    import jax

    from persian_rag_tpu.core.mesh import build_mesh
    from persian_rag_tpu.retrieval.system import RetrievalSystem

    mesh = build_mesh(corpus_axis=2, data_axis=2,
                      devices=jax.devices()[:4])
    rs_mesh = RetrievalSystem(
        method="hybrid", encoder=make_encoder(), mesh=mesh
    )
    assert rs_mesh.load_chunks_and_index(CHUNKS)
    assert not rs_mesh._hybrid_fused_supported()
    host = hybrid_rs.retrieve_hybrid_batch(QUERIES, top_k=4, fused=False)
    got = rs_mesh.retrieve_hybrid_batch(QUERIES, top_k=4)
    for h, d in zip(host, got):
        assert [c["id"] for c, _ in h] == [c["id"] for c, _ in d]
        np.testing.assert_allclose(
            [s for _, s in h], [s for _, s in d], rtol=1e-4, atol=1e-5
        )


def test_fused_hybrid_union_kernel_matches_host(hybrid_rs, monkeypatch):
    """With the union gate forced open (and the union-hash copy built),
    the hybrid fused dispatch routes its lexical share through the
    batch-dedup kernels and must stay score-identical to the host
    fusion loop."""
    import persian_rag_tpu.index.lexical as lex

    rs = hybrid_rs
    monkeypatch.setattr(lex, "_UNION_MIN_SLOTS", 1)
    monkeypatch.setattr(lex, "_UNION_MAX_FRAC", 1.0)
    qids, _ = rs.bm25_index._encode_queries(
        [rs.bm25_index._query_terms(q) for q in QUERIES]
    )
    assert rs.bm25_index._union_gate(qids)  # gate now opens
    host = rs.retrieve_hybrid_batch(QUERIES, top_k=4, fused=False)
    dev = rs.retrieve_hybrid_batch(QUERIES, top_k=4, fused=True)
    for h, d in zip(host, dev):
        assert [c["id"] for c, _ in h] == [c["id"] for c, _ in d]
        np.testing.assert_allclose(
            [s for _, s in h], [s for _, s in d], rtol=1e-5, atol=1e-6
        )
    # and with per-bucket hashed-union copies forced to build
    monkeypatch.setattr(lex, "_UNION_HASH_MIN_N", 1)
    monkeypatch.setattr(lex, "_UNION_HASH_MIN_L", 1)
    rs2 = RetrievalSystem(method="hybrid", encoder=make_encoder())
    assert rs2.load_chunks_and_index(CHUNKS)
    bm = rs2.bm25_index
    has3 = (
        bm._dev_ids3 is not None
        if bm._buckets is None
        else any(b.dev_ids3 is not None for b in bm._buckets)
    )
    assert has3, "union-hash copy must build under the forced gate"
    host2 = rs2.retrieve_hybrid_batch(QUERIES, top_k=4, fused=False)
    dev2 = rs2.retrieve_hybrid_batch(QUERIES, top_k=4, fused=True)
    for h, d in zip(host2, dev2):
        assert [c["id"] for c, _ in h] == [c["id"] for c, _ in d]
