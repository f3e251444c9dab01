"""End-to-end pipeline tests on tiny synthetic data in tmp directories."""
import json
import os

import pytest

from persian_rag_tpu.core.config import Config
from persian_rag_tpu.data.loader import synthetic_persian_qa
from persian_rag_tpu.gen.client import LlamaClient
from persian_rag_tpu.gen.fake_server import FakeLlamaServer
from persian_rag_tpu.pipelines import phase1, phase2, phase3, phase4
from persian_rag_tpu.pipelines.fast_test import (
    show_system_status,
    test_full_rag_pipeline as full_rag_check,
    test_retrieval_only as retrieval_check,
)


@pytest.fixture
def config(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = Config()
    cfg.models = ["tiny-model"]
    cfg.training.epochs = 1
    cfg.training.batch_size = 8
    cfg.training.warmup_steps = 1
    cfg.training.max_train_samples = 40
    cfg.evaluation.sample_size = 4
    cfg.chunking.word_chunk_size = 30
    cfg.chunking.word_overlap = 5
    return cfg


@pytest.mark.slow
def test_phase1_trains_and_persists(config):
    results = phase1.main(config, tiny=True)
    assert results["train_size"] > 0 and results["test_size"] > 0
    model_result = results["models"]["tiny-model"]
    assert model_result["samples_per_second"] > 0
    assert os.path.exists(
        os.path.join(model_result["model_path"], "params.msgpack")
    )
    assert os.path.exists("results/phase1_training_results.json")
    assert os.path.exists("data/processed/train_data.csv")


def test_phase2_accuracy_metrics(config):
    results = phase2.main(
        config, tiny=True, test_data=synthetic_persian_qa(60, seed=3)
    )
    model = results["models"]["tiny-model"]
    assert 0.0 <= model["retrieval_accuracy"] <= 1.0
    assert "cosine_similarity" in model
    # the reference's simulated EM/F1 are intentionally absent
    assert "exact_match" not in model
    assert os.path.exists("results/phase2_evaluation_results.json")
    assert results["comparison"]["best_model"]["retrieval_accuracy"]


def test_phase3_builds_indexes_and_smoke_tests(config):
    results = phase3.main(config, tiny=True)
    assert results["success"]
    chunking = results["steps"]["chunking"]
    assert chunking["word_chunks"] > 0 and chunking["sentence_chunks"] > 0
    for chunk_type in ("word", "sentence"):
        step = results["steps"][f"{chunk_type}_index"]
        assert step["num_vectors"] == chunking[f"{chunk_type}_chunks"]
        assert results["steps"][f"{chunk_type}_smoke_test"]["success"]
        assert os.path.exists(f"results/index/drugs_{chunk_type}_chunks.npz")
        assert os.path.exists(f"results/index/drugs_{chunk_type}_chunks.index")
    assert os.path.exists("data/processed/drugs_word_chunks.csv")


def test_phase4_full_rag_eval(config):
    phase3.main(config, tiny=True)  # produce chunks
    with FakeLlamaServer() as url:
        results = phase4.main(
            config,
            tiny=True,
            methods=["bm25", "tfidf"],
            test_data=synthetic_persian_qa(10, seed=5),
            llama_client=LlamaClient(url),
            sample_size=4,
        )
    assert "word_bm25_results" in results
    assert results["word_bm25_results"]["bm25_num_samples"] == 4
    assert results["word_bm25_results"]["bm25_success_rate"] > 0
    comparison = results["word_chunks_comparison"]
    assert comparison["best_models"]
    assert os.path.exists(results["artifacts"]["json"])
    assert os.path.exists(results["artifacts"]["report"])
    with open(results["artifacts"]["json"], encoding="utf-8") as f:
        json.load(f)  # valid JSON


def test_phase4_full_rag_eval_with_jax_decoder(config):
    """The COMPLETE reference stack in-process: retrieval + generation +
    evaluation, with generation served by the real JAX decoder behind the
    llama.cpp HTTP contract (reference runs an external llama.cpp process
    at src/llama_client.py:10) instead of the canned fake backend."""
    import jax.numpy as jnp

    from persian_rag_tpu.gen.generator import TextGenerator
    from persian_rag_tpu.gen.local_server import LocalGenerationServer
    from persian_rag_tpu.models.decoder import DecoderConfig

    phase3.main(config, tiny=True)  # produce chunks
    gen = TextGenerator(
        DecoderConfig.tiny(compute_dtype=jnp.bfloat16), max_len=96, seed=3
    )
    server = LocalGenerationServer(gen, max_batch=4).start()
    try:
        results = phase4.main(
            config,
            tiny=True,
            methods=["bm25"],
            test_data=synthetic_persian_qa(6, seed=11),
            llama_client=LlamaClient(server.url),
            sample_size=3,
        )
    finally:
        server.stop()
    res = results["word_bm25_results"]
    assert res["bm25_num_samples"] == 3
    # Retrieval must work regardless of generation quality. Random-weight
    # generations may clean to empty answers (counted as failed, matching
    # the reference's accounting), but every item must have completed a
    # real HTTP round trip through the decoder server.
    assert res["bm25_failed_retrievals"] == 0
    assert res["bm25_avg_generation_time"] > 0.0


def test_phase4_requires_chunks(config):
    with pytest.raises(FileNotFoundError):
        phase4.main(config, tiny=True, test_data=[{"question": "q", "answer": "a"}])


def test_fast_test_harness(config):
    phase3.main(config, tiny=True)
    import pandas as pd

    chunks = pd.read_csv(
        "data/processed/drugs_word_chunks.csv", encoding="utf-8"
    ).to_dict("records")
    assert retrieval_check(chunks)["passed"]
    with FakeLlamaServer() as url:
        result = full_rag_check(
            chunks, synthetic_persian_qa(3, seed=6), LlamaClient(url)
        )
    assert result["passed"]
    status = show_system_status(config)
    assert status["artifacts"]["drugs_word_chunks.csv"]


def test_ui_system(config):
    phase3.main(config, tiny=True)
    from persian_rag_tpu.ui.app import DrugRAGSystem

    system = DrugRAGSystem(config, method="tfidf")
    assert system.initialize_system()
    with FakeLlamaServer() as url:
        system.llama = LlamaClient(url)
        out = system.ask_question("دارو چیست؟", top_k=5)
    assert out["answer"]
    assert out["total_time"] >= 0
    assert "زمان بازیابی" in out["timing_panel"]
    # guard rails
    assert "error" in system.ask_question("", 5)


def test_ui_http_endpoints(config):
    import requests

    phase3.main(config, tiny=True)
    from persian_rag_tpu.ui.app import launch

    server, system = launch(config, port=0, block=False)
    import threading

    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        page = requests.get(base + "/").text
        assert "سیستم پرسش و پاسخ" in page
        init = requests.post(base + "/api/init").json()
        assert init["ok"]
        with FakeLlamaServer() as url:
            system.llama = LlamaClient(url)
            answer = requests.post(
                base + "/api/ask",
                json={"question": "دارو چیست؟", "top_k": 5},
            ).json()
        assert answer["answer"]
    finally:
        server.shutdown()


def test_phase4_enhanced_rank_metrics(config):
    from persian_rag_tpu.pipelines import phase4_enhanced

    phase3.main(config, tiny=True)
    import pandas as pd

    chunks = pd.read_csv(
        "data/processed/drugs_word_chunks.csv", encoding="utf-8"
    ).to_dict("records")
    test_data = synthetic_persian_qa(12, seed=7)
    with FakeLlamaServer() as url:
        results = phase4_enhanced.main(
            config,
            tiny=True,
            chunks=chunks,
            test_data=test_data,
            llama_client=LlamaClient(url),
            sample_size=6,
        )
    perf = results["tiny-model_results"]
    # rank metrics present with the enhanced-run schema
    for k in (1, 3, 5, 10):
        assert f"tiny-model_hit_at_{k}" in perf
        assert f"tiny-model_precision_at_{k}" in perf
        assert f"tiny-model_recall_at_{k}" in perf
    assert "tiny-model_mrr_at_10" in perf
    assert "tiny-model_rouge_1" in perf
    assert perf["tiny-model_relevance_queries"] > 0
    # synthetic contexts directly contain the answers: recall grows with k
    assert perf["tiny-model_recall_at_10"] >= perf["tiny-model_recall_at_1"]
    assert results["word_chunks_comparison"]["best_models"]


def test_real_context_metrics_when_gold_context_present(config):
    phase3.main(config, tiny=True)
    import pandas as pd

    from persian_rag_tpu.eval.evaluator import RAGEvaluator
    from persian_rag_tpu.retrieval.system import RetrievalSystem

    chunks = pd.read_csv(
        "data/processed/drugs_word_chunks.csv", encoding="utf-8"
    ).to_dict("records")
    rs = RetrievalSystem(method="bm25")
    rs.load_chunks_and_index(chunks)
    test_data = synthetic_persian_qa(6, seed=8)  # items carry contexts
    with FakeLlamaServer() as url:
        evaluator = RAGEvaluator(llama_client=LlamaClient(url))
        results = evaluator.evaluate_single_rag(rs, test_data, model_name="m")
    # with gold contexts, context precision is a real measurement, not
    # the all-1.0 placeholder (retrieved chunks rarely all match)
    assert 0.0 <= results["m_context_precision"] <= 1.0
    assert 0.0 <= results["m_context_recall"] <= 1.0


@pytest.mark.slow
def test_run_all_orchestrates_all_phases(config):
    from persian_rag_tpu.pipelines import run_all

    with FakeLlamaServer() as url:
        results = run_all.main(
            config,
            tiny=True,
            methods=["bm25"],
            test_data=synthetic_persian_qa(6, seed=10),
            llama_client=LlamaClient(url),
            sample_size=3,
        )
    assert set(results) == {"phase1", "phase2", "phase3", "phase4"}
    assert results["phase1"]["train_size"] > 0
    assert results["phase3"]["success"]
    assert "word_bm25_results" in results["phase4"]
