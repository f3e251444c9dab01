"""End-to-end RAG evaluation with a real retriever and the fake backend."""
import numpy as np

from persian_rag_tpu.eval.evaluator import RAGEvaluator
from persian_rag_tpu.gen.client import LlamaClient
from persian_rag_tpu.gen.fake_server import FakeLlamaServer
from persian_rag_tpu.retrieval.system import RetrievalSystem

CHUNKS = [
    {"id": f"c{i}", "text": t, "chunk_type": "word_based"}
    for i, t in enumerate(
        [
            "دارو برای درمان بیماری استفاده می شود",
            "قلب خون را در بدن پمپاژ می کند",
            "واکسن برای پیشگیری از بیماری استفاده می شود",
        ]
    )
]

TEST_DATA = [
    {"question": "دارو برای چه استفاده می شود؟", "answer": "برای درمان بیماری"},
    {"question": "قلب چه کاری انجام می دهد؟", "answer": "پمپاژ خون در بدن"},
]


def make_retriever():
    rs = RetrievalSystem(method="bm25")
    rs.load_chunks_and_index(CHUNKS)
    return rs


def test_evaluate_single_rag_keys_and_ranges():
    with FakeLlamaServer() as url:
        evaluator = RAGEvaluator(llama_client=LlamaClient(url))
        results = evaluator.evaluate_single_rag(
            make_retriever(), TEST_DATA, model_name="bm25"
        )
    for key in (
        "bm25_exact_match", "bm25_f1_score", "bm25_precision", "bm25_recall",
        "bm25_bleu_score", "bm25_rouge_l", "bm25_context_precision",
        "bm25_context_recall", "bm25_avg_retrieval_time",
        "bm25_avg_generation_time", "bm25_total_time",
        "bm25_failed_retrievals", "bm25_failed_generations",
        "bm25_success_rate", "bm25_num_samples",
    ):
        assert key in results, key
    assert results["bm25_num_samples"] == 2
    assert results["bm25_success_rate"] == 1.0
    assert results["bm25_f1_score"] > 0  # extractive fake answers overlap gold


def test_evaluator_counts_generation_failures():
    # no endpoints at all -> all generations fail, retrieval still works
    client = LlamaClient("http://127.0.0.1:1")
    evaluator = RAGEvaluator(llama_client=client)
    results = evaluator.evaluate_single_rag(
        make_retriever(), TEST_DATA, model_name="x"
    )
    assert results["x_failed_generations"] == 2
    assert results["x_success_rate"] == 0.0
    assert results["x_f1_score"] == 0.0


def test_model_comparison_and_report():
    evaluator = RAGEvaluator(llama_client=LlamaClient("http://127.0.0.1:1"))
    perf = {
        "model_a": {
            "model_a_f1_score": 0.3,
            "model_a_bleu_score": 0.1,
            "model_a_success_rate": 1.0,
            "model_a_total_time": 2.0,
        },
        "model_b": {
            "model_b_f1_score": 0.5,
            "model_b_bleu_score": 0.05,
            "model_b_success_rate": 0.9,
            "model_b_total_time": 1.0,
        },
    }
    cmp_ = evaluator._analyze_model_comparison(perf)
    assert cmp_["best_models"]["f1_score"]["model"] == "model_b"
    assert cmp_["best_models"]["bleu_score"]["model"] == "model_a"
    # total_time ranks ascending (faster is better)
    assert cmp_["best_models"]["total_time"]["model"] == "model_b"
    assert cmp_["ranking"]["f1_score"][0]["model"] == "model_b"
    stats = cmp_["detailed_stats"]["f1_score"]
    np.testing.assert_allclose(stats["mean"], 0.4)
    np.testing.assert_allclose(stats["range"], 0.2)

    report = evaluator.create_evaluation_report(
        {
            "evaluation_metadata": {
                "timestamp": "t", "models_evaluated": ["a", "b"],
                "num_test_questions": 2, "chunk_types": ["word"],
            },
            "word_chunks_comparison": cmp_,
        }
    )
    assert "# Enhanced RAG Evaluation Report" in report
    assert "Best Models for Word Chunks" in report
    assert "model_b" in report


def test_save_results_numpy_safe(tmp_path):
    evaluator = RAGEvaluator(llama_client=LlamaClient("http://127.0.0.1:1"))
    path = evaluator.save_evaluation_results(
        {"a": np.float32(0.5), "b": np.arange(3), "c": {"d": np.int64(2)}},
        "out.json",
        directory=str(tmp_path),
    )
    import json

    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    assert data == {"a": 0.5, "b": [0, 1, 2], "c": {"d": 2}}
