"""HuggingFace checkpoint import.

Maps torch state dicts of the three reference architectures (BERT,
DistilBERT, XLM-RoBERTa — the backbones of the models listed in
reference config.yaml:2-5) onto the Flax parameter tree of
persian_rag_tpu.models.encoder.TransformerEncoder.

Works from:
* an in-memory state dict (numpy arrays or torch tensors),
* a local HF checkpoint dir (pytorch_model.bin / model.safetensors),
* a local sentence-transformers model dir (modules.json layout), which
  also yields the pooling-head configuration.

No network access is assumed anywhere.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np

from persian_rag_tpu.models.encoder import EncoderConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _dense(sd, prefix) -> Dict[str, np.ndarray]:
    return {
        "kernel": _np(sd[prefix + ".weight"]).T,
        "bias": _np(sd[prefix + ".bias"]),
    }


def _layer_norm(sd, prefix) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[prefix + ".weight"]),
        "bias": _np(sd[prefix + ".bias"]),
    }


def _strip_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Drop a leading model-name prefix (bert./roberta./distilbert./0.auto_model.)."""
    for prefix in ("0.auto_model.", "bert.", "roberta.", "distilbert."):
        if any(k.startswith(prefix) for k in sd):
            return {
                k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
            }
    return sd


def params_from_bert(sd: Dict[str, Any], num_layers: int) -> Dict:
    """BERT / XLM-RoBERTa naming (encoder.layer.N....)."""
    sd = _strip_prefix(sd)
    emb = {
        "word_embeddings": {
            "embedding": _np(sd["embeddings.word_embeddings.weight"])
        },
        "position_embeddings": {
            "embedding": _np(sd["embeddings.position_embeddings.weight"])
        },
        "layer_norm": _layer_norm(sd, "embeddings.LayerNorm"),
    }
    if "embeddings.token_type_embeddings.weight" in sd:
        emb["token_type_embeddings"] = {
            "embedding": _np(sd["embeddings.token_type_embeddings.weight"])
        }
    params = {"embeddings": emb}
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": _dense(sd, f"{p}.attention.self.query"),
                "key": _dense(sd, f"{p}.attention.self.key"),
                "value": _dense(sd, f"{p}.attention.self.value"),
                "output": _dense(sd, f"{p}.attention.output.dense"),
            },
            "attention_norm": _layer_norm(sd, f"{p}.attention.output.LayerNorm"),
            "intermediate": _dense(sd, f"{p}.intermediate.dense"),
            "ffn_output": _dense(sd, f"{p}.output.dense"),
            "output_norm": _layer_norm(sd, f"{p}.output.LayerNorm"),
        }
    return params


def params_from_distilbert(sd: Dict[str, Any], num_layers: int) -> Dict:
    sd = _strip_prefix(sd)
    params = {
        "embeddings": {
            "word_embeddings": {
                "embedding": _np(sd["embeddings.word_embeddings.weight"])
            },
            "position_embeddings": {
                "embedding": _np(sd["embeddings.position_embeddings.weight"])
            },
            "layer_norm": _layer_norm(sd, "embeddings.LayerNorm"),
        }
    }
    for i in range(num_layers):
        p = f"transformer.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": _dense(sd, f"{p}.attention.q_lin"),
                "key": _dense(sd, f"{p}.attention.k_lin"),
                "value": _dense(sd, f"{p}.attention.v_lin"),
                "output": _dense(sd, f"{p}.attention.out_lin"),
            },
            "attention_norm": _layer_norm(sd, f"{p}.sa_layer_norm"),
            "intermediate": _dense(sd, f"{p}.ffn.lin1"),
            "ffn_output": _dense(sd, f"{p}.ffn.lin2"),
            "output_norm": _layer_norm(sd, f"{p}.output_layer_norm"),
        }
    return params


def params_from_state_dict(
    sd: Dict[str, Any], arch: str, num_layers: int
) -> Dict:
    if arch in ("bert", "roberta", "xlm-roberta"):
        return params_from_bert(sd, num_layers)
    if arch == "distilbert":
        return params_from_distilbert(sd, num_layers)
    raise ValueError(f"unknown architecture {arch!r}")


# ---------------------------------------------------------------------------
# Local checkpoint directory loading.
# ---------------------------------------------------------------------------


def _read_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    st_path = os.path.join(model_dir, "model.safetensors")
    pt_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    if os.path.exists(pt_path):
        import torch

        sd = torch.load(pt_path, map_location="cpu", weights_only=True)
        return {k: _np(v) for k, v in sd.items()}
    raise FileNotFoundError(f"no weights found under {model_dir}")


_ARCH_BY_MODEL_TYPE = {
    "bert": "bert",
    "roberta": "roberta",
    "xlm-roberta": "roberta",
    "distilbert": "distilbert",
}


def config_from_hf_dict(cfg: Dict[str, Any]) -> Tuple[EncoderConfig, str]:
    model_type = cfg.get("model_type", "bert")
    arch = _ARCH_BY_MODEL_TYPE.get(model_type)
    if arch is None:
        raise ValueError(f"unsupported model_type {model_type!r}")
    if arch == "distilbert":
        config = EncoderConfig(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["dim"],
            num_layers=cfg["n_layers"],
            num_heads=cfg["n_heads"],
            intermediate_size=cfg["hidden_dim"],
            max_position_embeddings=cfg["max_position_embeddings"],
            type_vocab_size=0,
            hidden_act=cfg.get("activation", "gelu"),
            pad_token_id=cfg.get("pad_token_id", 0),
        )
    else:
        roberta = model_type in ("roberta", "xlm-roberta")
        pad = cfg.get("pad_token_id", 1 if roberta else 0)
        config = EncoderConfig(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            intermediate_size=cfg["intermediate_size"],
            max_position_embeddings=cfg["max_position_embeddings"],
            type_vocab_size=cfg.get("type_vocab_size", 2),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
            hidden_act=cfg.get("hidden_act", "gelu"),
            position_offset=(pad + 1) if roberta else 0,
            pad_token_id=pad,
        )
    return config, arch


def load_hf_checkpoint(model_dir: str) -> Tuple[EncoderConfig, Dict]:
    """Load (config, flax params) from a local HF checkpoint directory."""
    with open(os.path.join(model_dir, "config.json"), encoding="utf-8") as f:
        cfg = json.load(f)
    config, arch = config_from_hf_dict(cfg)
    sd = _read_state_dict(model_dir)
    params = params_from_state_dict(sd, arch, config.num_layers)
    return config, params


def load_sentence_transformer(
    model_dir: str,
) -> Tuple[EncoderConfig, Dict, Dict[str, Any]]:
    """Load a sentence-transformers model directory.

    Returns (encoder config, flax backbone params, pooling spec) where the
    pooling spec has keys: pooling ("mean"/"cls"), normalize (bool),
    projection_dim (int|None) and, if a Dense module exists, its weights
    under "projection_params".
    """
    config, params = load_hf_checkpoint(model_dir)
    pooling: Dict[str, Any] = {
        "pooling": "mean",
        "normalize": False,
        "projection_dim": None,
    }
    modules_path = os.path.join(model_dir, "modules.json")
    if os.path.exists(modules_path):
        with open(modules_path, encoding="utf-8") as f:
            modules = json.load(f)
        for mod in modules:
            mtype = mod.get("type", "")
            mpath = os.path.join(model_dir, mod.get("path", ""))
            if mtype.endswith("Pooling"):
                with open(
                    os.path.join(mpath, "config.json"), encoding="utf-8"
                ) as f:
                    pc = json.load(f)
                if pc.get("pooling_mode_cls_token"):
                    pooling["pooling"] = "cls"
                else:
                    pooling["pooling"] = "mean"
            elif mtype.endswith("Dense"):
                with open(
                    os.path.join(mpath, "config.json"), encoding="utf-8"
                ) as f:
                    dc = json.load(f)
                pooling["projection_dim"] = dc["out_features"]
                sd = _read_state_dict(mpath)
                key = "linear.weight" if "linear.weight" in sd else "weight"
                bkey = "linear.bias" if "linear.bias" in sd else "bias"
                pooling["projection_params"] = {
                    "projection": {
                        "kernel": _np(sd[key]).T,
                        "bias": _np(sd[bkey]),
                    }
                }
            elif mtype.endswith("Normalize"):
                pooling["normalize"] = True
    return config, params, pooling
