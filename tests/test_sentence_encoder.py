"""SentenceEncoder behavior: shapes, determinism, data-parallel equality."""
import numpy as np

from persian_rag_tpu.core.mesh import build_mesh
from persian_rag_tpu.models.encoder import EncoderConfig
from persian_rag_tpu.models.sentence_encoder import SentenceEncoder
from persian_rag_tpu.models.tokenizer import HashTokenizer

TINY = EncoderConfig(
    vocab_size=512,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
)

TEXTS = [
    "دارو برای درمان بیماری استفاده می شود",
    "this is a test sentence",
    "another document about drugs and treatments",
    "short",
    "",
]


def test_encode_shape_and_determinism():
    enc = SentenceEncoder(TINY, tokenizer=HashTokenizer(512), seed=0)
    emb1 = enc.encode(TEXTS, batch_size=2)
    emb2 = enc.encode(TEXTS, batch_size=4)
    assert emb1.shape == (5, 32)
    np.testing.assert_allclose(emb1, emb2, rtol=1e-4, atol=1e-5)


def test_projection_and_normalize():
    enc = SentenceEncoder(
        TINY,
        tokenizer=HashTokenizer(512),
        projection_dim=16,
        normalize=True,
    )
    emb = enc.encode(TEXTS[:3])
    assert emb.shape == (3, 16)
    np.testing.assert_allclose(
        np.linalg.norm(emb, axis=1), np.ones(3), rtol=1e-5
    )


def test_data_parallel_encode_matches_single_device():
    single = SentenceEncoder(TINY, tokenizer=HashTokenizer(512), seed=3)
    mesh = build_mesh(corpus_axis=1, data_axis=8)
    parallel = SentenceEncoder(
        TINY, params=single.params["encoder"], tokenizer=HashTokenizer(512), mesh=mesh
    )
    e1 = single.encode(TEXTS, batch_size=8)
    e2 = parallel.encode(TEXTS, batch_size=8)
    np.testing.assert_allclose(e1, e2, rtol=1e-4, atol=1e-5)


def test_similarity_reasonable():
    enc = SentenceEncoder(TINY, tokenizer=HashTokenizer(512))
    sim_same = enc.similarity("hello world", "hello world")
    assert abs(sim_same - 1.0) < 1e-4


def test_encode_robust_fallback(monkeypatch):
    enc = SentenceEncoder(TINY, tokenizer=HashTokenizer(512), seed=0)
    texts = ["یک", "دو", "سه"]
    # normal path
    emb, stats = enc.encode_robust(texts)
    assert emb.shape == (3, 32) and stats["failed"] == 0

    # force the batch path to fail -> per-item retry also fails -> zeros
    calls = {"n": 0}
    original = enc.encode

    def flaky(texts_, batch_size=32, **kw):
        calls["n"] += 1
        if calls["n"] == 1 or len(texts_) == 1 and "دو" in texts_[0]:
            raise RuntimeError("simulated device failure")
        return original(texts_, batch_size=batch_size, **kw)

    enc.encode = flaky
    emb, stats = enc.encode_robust(texts)
    assert stats["failed"] == 1
    assert stats["fallback_items"] == 2
    assert np.allclose(emb[1], 0.0)  # failed item got the zero vector
    assert not np.allclose(emb[0], 0.0)
