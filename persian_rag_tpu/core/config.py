"""Configuration system.

One YAML config drives every pipeline phase, mirroring the behavior surface
of the reference's ``config.yaml`` + ``load_config`` (reference:
src/utils.py:71-77, config.yaml:1-27) while adding TPU-specific knobs
(mesh shape, dtype policy, kernel tile sizes).
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

DEFAULT_MODELS = [
    "sentence-transformers/paraphrase-multilingual-MiniLM-L12-v2",
    "sentence-transformers/distiluse-base-multilingual-cased-v2",
    "intfloat/multilingual-e5-base",
]


@dataclass
class ChunkingConfig:
    # Defaults match reference config.yaml:8-11.
    word_chunk_size: int = 150
    word_overlap: int = 25
    sentences_per_chunk: int = 5


@dataclass
class RetrievalConfig:
    # Defaults match reference config.yaml:14-16.
    methods: List[str] = field(default_factory=lambda: ["bm25", "dense", "tfidf"])
    top_k: List[int] = field(default_factory=lambda: [1, 3, 5, 10])
    # Hybrid fusion weights (reference: src/retrieval.py:174-175 defaults).
    dense_weight: float = 0.6
    bm25_weight: float = 0.4
    max_context_length: int = 2000


@dataclass
class EvaluationConfig:
    # Defaults match reference config.yaml:19-21.
    test_size: float = 0.1
    batch_size: int = 16
    sample_size: Optional[int] = 100


@dataclass
class TrainingConfig:
    # Defaults match reference config.yaml:24-27.
    epochs: int = 1
    warmup_steps: int = 50
    max_train_samples: Optional[int] = 5000
    batch_size: int = 16
    learning_rate: float = 2e-5


@dataclass
class MeshConfig:
    """TPU device-mesh layout (no analogue in the single-GPU reference)."""

    # Number of mesh devices along the corpus (index-row) axis; -1 = all.
    corpus_axis: int = -1
    # Data-parallel axis for batched encoding / training.
    data_axis: int = 1


@dataclass
class ComputeConfig:
    """Dtype and kernel policy."""

    matmul_dtype: str = "bfloat16"  # MXU-friendly compute dtype
    accum_dtype: str = "float32"    # accumulation / score dtype
    corpus_tile: int = 1024          # rows of the index scanned per kernel step
    query_tile: int = 128            # queries per kernel block
    use_pallas: Optional[bool] = None  # None = auto (TPU only)


@dataclass
class PathsConfig:
    data_dir: str = "data"
    raw_dir: str = "data/raw"
    processed_dir: str = "data/processed"
    results_dir: str = "results"
    models_dir: str = "models"
    index_dir: str = "results/index"
    logs_dir: str = "logs"


@dataclass
class GenerationConfig:
    # Reference: src/llama_client.py:10 (server URL), :204-216 (params).
    server_url: str = "http://127.0.0.1:8080"
    max_tokens: int = 128
    temperature: float = 0.05
    top_p: float = 0.85
    timeout: int = 120


@dataclass
class Config:
    models: List[str] = field(default_factory=lambda: list(DEFAULT_MODELS))
    chunking: ChunkingConfig = field(default_factory=ChunkingConfig)
    retrieval: RetrievalConfig = field(default_factory=RetrievalConfig)
    evaluation: EvaluationConfig = field(default_factory=EvaluationConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    compute: ComputeConfig = field(default_factory=ComputeConfig)
    paths: PathsConfig = field(default_factory=PathsConfig)
    generation: GenerationConfig = field(default_factory=GenerationConfig)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    # Dict-style access so code written against the reference's raw-YAML
    # config dict (e.g. config['chunking']['word_chunk_size']) keeps working.
    def __getitem__(self, key: str) -> Any:
        value = getattr(self, key)
        if dataclasses.is_dataclass(value):
            return dataclasses.asdict(value)
        return value


def _update_dataclass(obj: Any, data: Dict[str, Any]) -> None:
    for key, value in data.items():
        if not hasattr(obj, key):
            continue
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            _update_dataclass(current, value)
        else:
            setattr(obj, key, value)


def load_config(path: str = "config.yaml") -> Config:
    """Load a YAML config, overlaying defaults.

    Unlike the reference (which crashes without config.yaml), a missing file
    returns pure defaults so library use needs no working directory setup.
    """
    config = Config()
    if path and os.path.exists(path):
        import yaml

        with open(path, "r", encoding="utf-8") as f:
            raw = yaml.safe_load(f) or {}
        _update_dataclass(config, raw)
    return config


def save_results(results, filename: str, directory: str = "results") -> str:
    """JSON/CSV result writer (reference: src/utils.py:55-69)."""
    import json

    os.makedirs(directory, exist_ok=True)
    filepath = os.path.join(directory, filename)
    if filename.endswith(".json"):
        with open(filepath, "w", encoding="utf-8") as f:
            json.dump(results, f, ensure_ascii=False, indent=2)
    elif filename.endswith(".csv"):
        import pandas as pd

        pd.DataFrame(results).to_csv(filepath, index=False, encoding="utf-8")
    else:
        raise ValueError(f"unsupported result format: {filename}")
    return filepath


def ensure_directories(config: Optional[Config] = None) -> None:
    """Create the artifact directory tree (reference: src/utils.py:43-53)."""
    paths = (config or Config()).paths
    for directory in (
        paths.raw_dir,
        paths.processed_dir,
        paths.results_dir,
        paths.models_dir,
        paths.index_dir,
        paths.logs_dir,
    ):
        os.makedirs(directory, exist_ok=True)
