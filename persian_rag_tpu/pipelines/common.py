"""Shared pipeline plumbing: encoder construction and artifact paths."""
from __future__ import annotations

import os
from typing import Optional

from persian_rag_tpu.core.config import Config
from persian_rag_tpu.models.encoder import EncoderConfig
from persian_rag_tpu.models.sentence_encoder import SentenceEncoder

# Architecture presets for the three reference models (config.yaml:2-5),
# used when no local checkpoint exists (zero-egress environment): the
# encoder has the exact architecture and pooling head, randomly
# initialized, with the hashing tokenizer.
PRESETS = {
    "sentence-transformers/paraphrase-multilingual-MiniLM-L12-v2": dict(
        config=EncoderConfig.minilm_l12, pooling="mean",
        projection_dim=None, normalize=False,
    ),
    "sentence-transformers/distiluse-base-multilingual-cased-v2": dict(
        config=EncoderConfig.distilbert_base, pooling="mean",
        projection_dim=512, normalize=False,
    ),
    "intfloat/multilingual-e5-base": dict(
        config=EncoderConfig.xlmr_base, pooling="mean",
        projection_dim=None, normalize=True,
        query_prefix="query: ", passage_prefix="passage: ",
    ),
}


def prefixes_for(model_name: str) -> dict:
    """e5-style instruction prefixes for models that need them."""
    preset = PRESETS.get(model_name, {})
    return {
        "query_prefix": preset.get("query_prefix", ""),
        "passage_prefix": preset.get("passage_prefix", ""),
    }

# A small architecture for smoke runs / CI (full presets are 100M+ params).
TINY_PRESET = EncoderConfig(
    vocab_size=4096, hidden_size=64, num_layers=2, num_heads=4,
    intermediate_size=128, max_position_embeddings=128,
)


def short_name(model_name: str) -> str:
    return model_name.split("/")[-1]


def build_encoder(
    model_name: str,
    config: Optional[Config] = None,
    mesh=None,
    tiny: bool = False,
    seed: int = 0,
) -> SentenceEncoder:
    """Resolve a model name to a SentenceEncoder.

    Priority: our native fine-tuned checkpoint dir -> local
    sentence-transformers dir -> architecture preset (random init) ->
    tiny smoke config.
    """
    models_dir = (config or Config()).paths.models_dir
    native_dir = os.path.join(models_dir, short_name(model_name) + "_finetuned")
    if os.path.exists(os.path.join(native_dir, "params.msgpack")):
        from persian_rag_tpu.train.trainer import EmbeddingTrainer

        return EmbeddingTrainer.load_model(native_dir, mesh=mesh)
    for candidate in (model_name, os.path.join(models_dir, short_name(model_name))):
        if os.path.isdir(candidate) and os.path.exists(
            os.path.join(candidate, "config.json")
        ):
            try:
                return SentenceEncoder.from_pretrained(candidate, mesh=mesh)
            except Exception:
                pass
    if tiny:
        return SentenceEncoder(TINY_PRESET, mesh=mesh, seed=seed, max_seq_len=64)
    preset = PRESETS.get(model_name)
    if preset is None:
        return SentenceEncoder(TINY_PRESET, mesh=mesh, seed=seed, max_seq_len=64)
    return SentenceEncoder(
        preset["config"](),
        pooling=preset["pooling"],
        projection_dim=preset["projection_dim"],
        normalize=preset["normalize"],
        mesh=mesh,
        seed=seed,
    )
