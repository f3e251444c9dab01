"""The fused encode+search step must match the two-dispatch path exactly
and must not bounce embeddings through the host."""
import numpy as np
import pytest

from persian_rag_tpu.models.encoder import EncoderConfig
from persian_rag_tpu.models.sentence_encoder import SentenceEncoder
from persian_rag_tpu.models.tokenizer import HashTokenizer
from persian_rag_tpu.retrieval.system import RetrievalSystem


def _make_encoder():
    config = EncoderConfig(
        vocab_size=512, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=64,
    )
    return SentenceEncoder(
        config, tokenizer=HashTokenizer(512), max_seq_len=16
    )


CHUNKS = [
    {"id": f"c{i}", "text": f"سند شماره {i} درباره دارو و درمان {i % 5}"}
    for i in range(37)
]
QUERIES = ["دارو چیست", "درمان بیماری", "سند شماره 7"]


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_fused_matches_unfused(metric):
    enc = _make_encoder()
    rs = RetrievalSystem(method="dense", encoder=enc, dense_metric=metric)
    assert rs.load_chunks_and_index(CHUNKS)
    assert rs._fused_supported()

    fused = rs.retrieve_dense_batch(QUERIES, top_k=5)

    # force the unfused path on identical state
    rs2 = RetrievalSystem(method="dense", encoder=enc, dense_metric=metric)
    assert rs2.load_chunks_and_index(CHUNKS)
    rs2._fused_supported = lambda: False
    unfused = rs2.retrieve_dense_batch(QUERIES, top_k=5)

    for f_row, u_row in zip(fused, unfused):
        assert [c["id"] for c, _ in f_row] == [c["id"] for c, _ in u_row]
        np.testing.assert_allclose(
            [s for _, s in f_row], [s for _, s in u_row], rtol=2e-5, atol=2e-6
        )


def test_fused_is_single_dispatch():
    """The fused path must not call encoder.encode (host-returning) or
    DenseIndex.search (separate dispatch) — everything rides one jitted
    step."""
    enc = _make_encoder()
    rs = RetrievalSystem(method="dense", encoder=enc)
    assert rs.load_chunks_and_index(CHUNKS)

    calls = {"encode": 0, "search": 0}
    orig_encode = enc.encode
    enc.encode = lambda *a, **k: calls.__setitem__("encode", calls["encode"] + 1) or orig_encode(*a, **k)
    orig_search = rs.dense_index.search
    rs.dense_index.search = lambda *a, **k: calls.__setitem__("search", calls["search"] + 1) or orig_search(*a, **k)

    results = rs.retrieve_dense_batch(QUERIES, top_k=3)
    assert len(results) == 3 and all(len(r) == 3 for r in results)
    assert calls == {"encode": 0, "search": 0}


def test_fused_int8_storage_refines_through():
    """int8-quantized corpus works through the fused path (row scales are
    passed as arguments, not closed over)."""
    from persian_rag_tpu.index.dense import DenseIndex

    enc = _make_encoder()
    rs = RetrievalSystem(method="dense", encoder=enc, dense_metric="cosine")
    texts = [str(c["text"]) for c in CHUNKS]
    vectors = enc.encode(texts)
    rs.chunks = CHUNKS
    idx = DenseIndex(vectors.shape[1], metric="cosine", storage_dtype="int8")
    idx.add(vectors)
    idx.commit()
    rs.dense_index = idx
    rs.is_ready = True
    assert rs._fused_supported()
    results = rs.retrieve_dense_batch(QUERIES, top_k=4)
    assert all(len(r) == 4 for r in results)


def test_fused_falls_back_with_mesh():
    from persian_rag_tpu.core.mesh import build_mesh

    enc = _make_encoder()
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    rs = RetrievalSystem(method="dense", encoder=enc, mesh=mesh)
    assert rs.load_chunks_and_index(CHUNKS)
    assert not rs._fused_supported()
    results = rs.retrieve_dense_batch(QUERIES, top_k=5)
    assert all(len(r) == 5 for r in results)
