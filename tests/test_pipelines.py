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
