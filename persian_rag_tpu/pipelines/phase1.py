"""Phase 1 — data preparation + embedding fine-tuning.

Equivalent of reference scripts/phase1_data_and_training.py: load the QA
datasets, build training records, split train/test, save CSVs, fine-tune
each configured embedding model, write
results/phase1_training_results.json with the same shape (per-model
training_time / samples_per_second / model_path keys).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

from persian_rag_tpu.core.config import Config, ensure_directories
from persian_rag_tpu.data.loader import DataLoader
from persian_rag_tpu.pipelines.common import build_encoder, short_name
from persian_rag_tpu.train.trainer import EmbeddingTrainer


def main(
    config: Optional[Config] = None,
    mesh=None,
    tiny: bool = False,
    max_records: Optional[int] = None,
) -> Dict:
    config = config or Config()
    ensure_directories(config)
    loader = DataLoader()

    pquad, persian_qa = loader.load_datasets()
    qa_data = loader.prepare_qa_data_for_training(pquad, persian_qa)
    if max_records:
        qa_data = qa_data[:max_records]
    max_train = config.training.max_train_samples
    if max_train and len(qa_data) > max_train:
        qa_data = qa_data[:max_train]

    train_data, test_data = loader.create_test_split(
        qa_data, test_size=config.evaluation.test_size
    )
    loader.save_processed_data(
        train_data, "train_data.csv", config.paths.processed_dir
    )
    loader.save_processed_data(
        test_data, "test_data.csv", config.paths.processed_dir
    )

    results: Dict = {
        "total_qa_pairs": len(qa_data),
        "train_size": len(train_data),
        "test_size": len(test_data),
        "models": {},
    }
    for model_name in config.models:
        encoder = build_encoder(model_name, config, mesh=mesh, tiny=tiny)
        trainer = EmbeddingTrainer(encoder)
        examples = trainer.prepare_training_data(train_data)
        eval_examples = trainer.prepare_evaluation_data(test_data)
        out_dir = os.path.join(
            config.paths.models_dir, short_name(model_name) + "_finetuned"
        )
        t0 = time.time()
        summary = trainer.fine_tune(
            examples,
            eval_examples=eval_examples,
            epochs=config.training.epochs,
            batch_size=config.training.batch_size,
            warmup_steps=config.training.warmup_steps,
            learning_rate=config.training.learning_rate,
            output_path=out_dir,
        )
        results["models"][model_name] = {
            "training_examples": len(examples),
            "training_time": time.time() - t0,
            "samples_per_second": summary["samples_per_second"],
            "final_loss": summary["final_loss"],
            "model_path": out_dir,
        }

    os.makedirs(config.paths.results_dir, exist_ok=True)
    out = os.path.join(
        config.paths.results_dir, "phase1_training_results.json"
    )
    with open(out, "w", encoding="utf-8") as f:
        json.dump(results, f, ensure_ascii=False, indent=2)
    return results
