"""Timing utilities, rerank stage, e5 prefixes."""
import time

import numpy as np

from persian_rag_tpu.models.encoder import EncoderConfig
from persian_rag_tpu.models.sentence_encoder import SentenceEncoder
from persian_rag_tpu.models.tokenizer import HashTokenizer
from persian_rag_tpu.pipelines.common import prefixes_for
from persian_rag_tpu.retrieval.system import RetrievalSystem
from persian_rag_tpu.utils.timing import Timer, timed


def test_timer_sections_and_summary():
    timer = Timer()
    with timer.section("retrieval"):
        time.sleep(0.01)
    with timer.section("retrieval"):
        time.sleep(0.01)
    with timer.section("generation"):
        time.sleep(0.005)
    summary = timer.summary(prefix="m_")
    assert summary["m_avg_retrieval_time"] >= 0.005
    assert summary["m_avg_generation_time"] >= 0.001
    assert summary["m_total_time"] >= summary["m_avg_generation_time"]


def test_timed_sink():
    sink = {}
    with timed("x", sink):
        pass
    assert "x" in sink and sink["x"] >= 0


def test_e5_prefixes():
    p = prefixes_for("intfloat/multilingual-e5-base")
    assert p["query_prefix"] == "query: "
    assert p["passage_prefix"] == "passage: "
    assert prefixes_for("unknown")["query_prefix"] == ""


CHUNKS = [
    {"id": f"c{i}", "text": t, "chunk_type": "word_based"}
    for i, t in enumerate(
        [
            "دارو برای درمان بیماری استفاده می شود",
            "قلب خون را پمپاژ می کند",
            "واکسن از بیماری پیشگیری می کند",
            "ویتامین سیستم ایمنی را تقویت می کند",
        ]
    )
]


def test_hybrid_rerank_scores_are_cosines():
    encoder = SentenceEncoder(
        EncoderConfig(
            vocab_size=512, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_position_embeddings=64,
        ),
        tokenizer=HashTokenizer(512),
    )
    rs = RetrievalSystem(method="hybrid", encoder=encoder)
    rs.load_chunks_and_index(CHUNKS)
    q = CHUNKS[2]["text"]
    results = rs.retrieve_hybrid_batch([q], top_k=3, rerank=True)[0]
    # reranked scores are exact cosines, descending, self-match first
    assert results[0][0]["id"] == "c2"
    assert abs(results[0][1] - 1.0) < 1e-4
    scores = [s for _, s in results]
    assert scores == sorted(scores, reverse=True)
    assert all(-1.0 - 1e-6 <= s <= 1.0 + 1e-6 for s in scores)
