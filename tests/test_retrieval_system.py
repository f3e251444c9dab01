"""RetrievalSystem behavior parity tests."""
import numpy as np
import pytest

from persian_rag_tpu.models.encoder import EncoderConfig
from persian_rag_tpu.models.sentence_encoder import SentenceEncoder
from persian_rag_tpu.models.tokenizer import HashTokenizer
from persian_rag_tpu.retrieval.system import RetrievalSystem

CHUNKS = [
    {"id": f"chunk_{i}", "text": t, "chunk_type": "word_based"}
    for i, t in enumerate(
        [
            "دارو برای درمان بیماری استفاده می شود و عوارض کمی دارد",
            "قلب خون را در بدن پمپاژ می کند و عضو حیاتی است",
            "واکسن برای پیشگیری از بیماری های عفونی استفاده می شود",
            "کبد سموم بدن را تصفیه می کند و نقش مهمی دارد",
            "آنتی بیوتیک برای مقابله با عفونت باکتریایی تجویز می شود",
            "ویتامین ث سیستم ایمنی بدن را تقویت می کند",
        ]
    )
]

TINY = EncoderConfig(
    vocab_size=1024, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, max_position_embeddings=64,
)


def make_encoder():
    return SentenceEncoder(TINY, tokenizer=HashTokenizer(1024), seed=7)


def test_bm25_retrieval_ranks_matching_terms_first():
    rs = RetrievalSystem(method="bm25")
    assert rs.load_chunks_and_index(CHUNKS)
    results = rs.retrieve("واکسن پیشگیری", top_k=3)
    assert results[0][0]["id"] == "chunk_2"
    assert results[0][1] > results[1][1]


def test_tfidf_retrieval():
    rs = RetrievalSystem(method="tfidf")
    assert rs.load_chunks_and_index(CHUNKS)
    results = rs.retrieve("قلب خون بدن", top_k=2)
    assert results[0][0]["id"] == "chunk_1"


def test_dense_retrieval_self_similarity():
    rs = RetrievalSystem(method="dense", encoder=make_encoder())
    assert rs.load_chunks_and_index(CHUNKS)
    # querying with a chunk's own text must retrieve that chunk first
    results = rs.retrieve(CHUNKS[3]["text"], top_k=2)
    assert results[0][0]["id"] == "chunk_3"
    # similarity mapping is 1/(1+L2) in (0, 1]
    assert 0.0 < results[0][1] <= 1.0 + 1e-6


def test_dense_similarity_is_one_over_one_plus_l2():
    encoder = make_encoder()
    rs = RetrievalSystem(method="dense", encoder=encoder)
    rs.load_chunks_and_index(CHUNKS)
    q = CHUNKS[0]["text"]
    emb_q = encoder.encode([q])[0]
    emb_c = encoder.encode([c["text"] for c in CHUNKS])
    d2 = ((emb_q[None, :] - emb_c) ** 2).sum(1)
    want = 1.0 / (1.0 + d2.min())
    results = rs.retrieve(q, top_k=1)
    np.testing.assert_allclose(results[0][1], want, rtol=1e-3)


def test_hybrid_fusion_weights():
    rs = RetrievalSystem(method="hybrid", encoder=make_encoder())
    assert rs.load_chunks_and_index(CHUNKS)
    results = rs.retrieve("دارو درمان", top_k=4)
    assert len(results) >= 1
    # top hybrid score <= dense_weight + bm25_weight
    assert results[0][1] <= 1.0 + 1e-6
    # best-matching chunk should contain both normalized channels
    assert results[0][0]["id"] == "chunk_0"


def test_hybrid_matches_manual_fusion():
    rs = RetrievalSystem(method="hybrid", encoder=make_encoder())
    rs.load_chunks_and_index(CHUNKS)
    q = "واکسن بیماری"
    k = 3
    dense = rs.retrieve_dense(q, k * 2)
    bm25 = rs.retrieve_bm25(q, k * 2)
    combined = {}
    max_d = max(s for _, s in dense)
    for c, s in dense:
        combined[c["id"]] = 0.6 * (s / max_d if max_d > 0 else 0)
    max_b = max(s for _, s in bm25)
    for c, s in bm25:
        combined[c["id"]] = combined.get(c["id"], 0.0) + 0.4 * (
            s / max_b if max_b > 0 else 0
        )
    want = sorted(combined.items(), key=lambda x: x[1], reverse=True)[:k]
    got = rs.retrieve_hybrid(q, k)
    assert [c["id"] for c, _ in got] == [cid for cid, _ in want]
    np.testing.assert_allclose(
        [s for _, s in got], [s for _, s in want], rtol=1e-6
    )


def test_get_contexts_for_rag_budget():
    rs = RetrievalSystem(method="bm25")
    rs.load_chunks_and_index(CHUNKS)
    contexts, metadata = rs.get_contexts_for_rag(
        "دارو", top_k=5, max_context_length=80
    )
    assert sum(len(c) for c in contexts) <= 80 + 3  # "..." allowance
    assert len(contexts) == len(metadata)
    assert all("chunk_id" in m and "score" in m for m in metadata)


def test_retrieve_batch_matches_single():
    rs = RetrievalSystem(method="bm25")
    rs.load_chunks_and_index(CHUNKS)
    queries = ["دارو درمان", "قلب خون", "ویتامین ایمنی"]
    batched = rs.retrieve_batch(queries, top_k=3)
    for q, batch_result in zip(queries, batched):
        single = rs.retrieve(q, top_k=3)
        assert [c["id"] for c, _ in single] == [c["id"] for c, _ in batch_result]


def test_evaluate_retrieval_quality():
    rs = RetrievalSystem(method="bm25")
    rs.load_chunks_and_index(CHUNKS)
    queries = [
        {"id": "q0", "question": "واکسن پیشگیری بیماری"},
        {"id": "q1", "question": "قلب پمپاژ خون"},
    ]
    relevant = {"q0": ["chunk_2"], "q1": ["chunk_1"]}
    metrics = rs.evaluate_retrieval_quality(queries, relevant)
    assert metrics["hit_at_1"] == 1.0
    assert metrics["mrr"] == 1.0
    assert metrics["total_queries"] == 2


def test_not_ready_raises():
    rs = RetrievalSystem(method="bm25")
    with pytest.raises(RuntimeError):
        rs.retrieve("x", 1)


def test_dense_ivf_index_type():
    rs = RetrievalSystem(
        method="dense", encoder=make_encoder(),
        dense_index_type="ivf", ivf_cells=2, ivf_nprobe=2,
    )
    assert rs.load_chunks_and_index(CHUNKS)
    results = rs.retrieve(CHUNKS[1]["text"], top_k=2)
    assert results[0][0]["id"] == "chunk_1"
    assert 0.0 < results[0][1] <= 1.0 + 1e-6  # 1/(1+L2) mapping applies


def test_ivf_backend_with_target_recall(rng):
    """dense_index_type='ivf' + ivf_target_recall calibrates nprobe at
    build instead of serving the raw knob."""
    from persian_rag_tpu.retrieval.system import RetrievalSystem

    centers = rng.standard_normal((12, 32)) * 10
    vectors = np.concatenate([
        c + rng.standard_normal((40, 32)) for c in centers
    ]).astype(np.float32)
    chunks = [{"id": i, "text": f"chunk {i}"} for i in range(len(vectors))]
    rs = RetrievalSystem(
        method="dense",
        dense_index_type="ivf",
        ivf_cells=12,
        ivf_nprobe=1,
        ivf_target_recall=0.95,
        dense_metric="l2",
    )
    assert rs.load_chunks_and_index(chunks, embeddings=vectors)
    cal = rs.dense_index.calibration
    assert cal is not None and (
        cal["achieved"] >= 0.95 or cal["nprobe"] == rs.dense_index.n_cells
    )
    # serving returns valid neighbors for an in-corpus query
    s, i = rs.dense_index.search(vectors[:3] + 0.01, 5)
    assert (i >= 0).all()
    assert i[0, 0] == 0 or 0 in set(i[0])
