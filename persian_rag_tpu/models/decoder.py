"""Flax Llama-family decoder (the generation model).

The reference fine-tunes Llama-3.2-1B with LoRA in a Colab notebook and
serves the GGUF export through llama.cpp (reference:
notebooks/*.ipynb cells 0-7; served at src/llama_client.py:10). This is
the TPU-native replacement: a Llama-architecture decoder (RMSNorm,
rotary embeddings, SwiGLU MLP, grouped-query attention) in Flax with

* a jitted full-sequence forward (training / prefill),
* an incremental KV-cache decode step under jit (static shapes: the
  cache is a fixed-length ring written at a dynamic position),
* greedy and temperature/top-p sampling loops via lax.while_loop.

HF LlamaForCausalLM checkpoints import via params_from_llama (tested for
numerical parity against torch transformers on random weights).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from persian_rag_tpu.ops import quant_matmul


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 128_256
    hidden_size: int = 2048
    num_layers: int = 16
    num_heads: int = 32
    num_kv_heads: int = 8
    intermediate_size: int = 8192
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500_000.0
    tie_word_embeddings: bool = True
    compute_dtype: Any = jnp.float32
    # serving-time transform: q/k/v concatenated into ONE projection and
    # gate/up into another (7 -> 4 weight matmuls per layer). Batch-1
    # decode is weight-stream-bound and small matmuls underrun the HBM
    # stream, so fewer/larger weight reads help; use fuse_params() to
    # convert an unfused checkpoint. Training/HF-import/TP stay unfused.
    fused_projections: bool = False
    # serving-time int8 weight quantization (the reference serves a
    # quantized GGUF through llama.cpp — notebooks cell 7 / BASELINE.md).
    # Params must be transformed by quantize_decoder_params(); every
    # Dense kernel and the tied embedding become {values int8, scale
    # f32}, consumed by the Pallas weight-streaming kernels
    # (ops/quant_matmul.py) that halve HBM bytes per decode step.
    # quantized_backend: "pallas" (int8 tiles dequantized in VMEM) or
    # "xla" (convert-in-dot; the measured-slower A/B arm, kept for
    # whole-step benchmarking and non-TPU execution).
    quantized_weights: bool = False
    quantized_backend: str = "pallas"
    # 8 (Q8_0 parity; per-output-channel int8 everywhere) or 4 (layer
    # projections int4 K-half-packed — ~1.3x faster weight stream,
    # coarser per-channel quantization; embedding/lm_head stay int8:
    # the logits argmax is the quality-critical matmul).
    quantized_bits: int = 8

    @classmethod
    def llama32_1b(cls, **kw) -> "DecoderConfig":
        return cls(**kw)  # defaults above are Llama-3.2-1B

    @classmethod
    def from_hf(cls, cfg: Dict[str, Any], **kw) -> "DecoderConfig":
        """Map an HF LlamaForCausalLM config.json dict (the checkpoint
        format `params_from_llama` consumes) to a DecoderConfig."""
        fields = dict(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            num_kv_heads=cfg.get(
                "num_key_value_heads", cfg["num_attention_heads"]
            ),
            intermediate_size=cfg["intermediate_size"],
            max_position_embeddings=cfg.get("max_position_embeddings", 4096),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 500_000.0),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
        )
        fields.update(kw)
        return cls(**fields)

    @classmethod
    def tiny(cls, **kw) -> "DecoderConfig":
        defaults = dict(
            vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128,
            max_position_embeddings=128, rope_theta=10_000.0,
        )
        defaults.update(kw)
        return cls(**defaults)


def _rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding, HF 'half-split' convention. x: (B, S, H, D)."""
    d = x.shape[-1]
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    )
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (B, S, D/2)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


def _init_i8(key, shape, dtype=jnp.int8):
    return jnp.zeros(shape, dtype)


class QuantDense(nn.Module):
    """Dense layer over int8-quantized weights (serving only).

    Param tree {values (K, N) int8, scale (1, N) f32} — produced by
    quantize_decoder_params, never trained. On TPU the matmul streams
    the int8 values through the Pallas dequant kernel at full HBM rate
    (ops/quant_matmul.py); elsewhere (CPU tests, backend="xla") it runs
    the identical-math XLA dequant reference."""

    features: int
    backend: str = "pallas"
    bits: int = 8

    @nn.compact
    def __call__(self, x):
        k = x.shape[-1]
        on_tpu = jax.default_backend() == "tpu"
        scale = self.param(
            "scale", nn.initializers.ones, (1, self.features), jnp.float32
        )
        if self.bits == 4:
            values = self.param(
                "values", _init_i8, (k // 2, self.features)
            )
            if self.backend == "pallas" and on_tpu:
                out = quant_matmul.w4a16_matmul(x, values, scale)
            else:
                out = quant_matmul.dequant_matmul_int4_reference(
                    x, values, scale
                )
        else:
            values = self.param("values", _init_i8, (k, self.features))
            if self.backend == "pallas" and on_tpu:
                out = quant_matmul.w8a16_matmul(x, values, scale)
            else:
                out = quant_matmul.dequant_matmul_reference(
                    x, values, scale, nt=False
                )
        return out.astype(x.dtype)


class QuantEmbed(nn.Module):
    """Tied embedding over one int8 table: row gather for token embed,
    n-transposed Pallas matmul for the lm_head — quantized serving does
    not store a second transposed copy of the (V, H) matrix."""

    vocab_size: int
    features: int
    backend: str = "pallas"

    def setup(self):
        self.values = self.param(
            "values", _init_i8, (self.vocab_size, self.features)
        )
        self.scale = self.param(
            "scale",
            nn.initializers.ones,
            (self.vocab_size, 1),
            jnp.float32,
        )

    def __call__(self, ids):
        rows = jnp.take(self.values, ids, axis=0).astype(jnp.float32)
        return rows * jnp.take(self.scale, ids, axis=0)

    def attend(self, x):
        """x (..., H) -> f32 logits (..., V)."""
        if self.backend == "pallas" and jax.default_backend() == "tpu":
            return quant_matmul.w8a16_matmul_nt(x, self.values, self.scale)
        return quant_matmul.dequant_matmul_reference(
            x, self.values, self.scale, nt=True
        )


def _dense(c: DecoderConfig, features: int, name: str):
    if c.quantized_weights:
        # the untied lm_head stays int8 even in 4-bit mode: the logits
        # argmax is the quality-critical matmul (quantize_decoder_params
        # applies the same exception)
        bits = 8 if name == "lm_head" else c.quantized_bits
        return QuantDense(
            features, backend=c.quantized_backend, bits=bits, name=name
        )
    return nn.Dense(features, use_bias=False, name=name)


class DecoderAttention(nn.Module):
    config: DecoderConfig

    @nn.compact
    def __call__(self, x, positions, attn_bias, cache=None):
        c = self.config
        b, s, h = x.shape
        head_dim = h // c.num_heads
        if c.fused_projections:
            qkv = _dense(
                c,
                (c.num_heads + 2 * c.num_kv_heads) * head_dim,
                "qkv_proj",
            )(x)
            q, k, v = jnp.split(
                qkv,
                [
                    c.num_heads * head_dim,
                    (c.num_heads + c.num_kv_heads) * head_dim,
                ],
                axis=-1,
            )
        else:
            q = _dense(c, c.num_heads * head_dim, "q_proj")(x)
            k = _dense(c, c.num_kv_heads * head_dim, "k_proj")(x)
            v = _dense(c, c.num_kv_heads * head_dim, "v_proj")(x)
        q = q.reshape(b, s, c.num_heads, head_dim)
        k = k.reshape(b, s, c.num_kv_heads, head_dim)
        v = v.reshape(b, s, c.num_kv_heads, head_dim)
        q = _rope(q, positions, c.rope_theta)
        k = _rope(k, positions, c.rope_theta)

        if cache is not None:
            # write this step's k/v block at the SCALAR cache position:
            # prefill writes the whole prompt block at 0; every decode
            # step (single or batched) writes one token at a shared slot
            # — batched ragged decode decouples slot from token position
            # (generator._batch_loop_fn), so no per-row scatter exists.
            k_cache, v_cache, cache_pos = cache
            if jnp.ndim(cache_pos) == 0:
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, k.astype(k_cache.dtype), (0, cache_pos, 0, 0)
                )
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, v.astype(v_cache.dtype), (0, cache_pos, 0, 0)
                )
            else:
                # (B,) per-row block starts: batched SPECULATIVE decode
                # commits different counts per row, so rows' blocks start
                # at different slots. Scatter writes measured ~cost-
                # neutral vs DUS at batch 8 on chip (scripts/
                # bench_decode.py round-3 A/B); out-of-bounds rows
                # (already-done rows parked at the edge) drop silently.
                rows = jnp.arange(b)[:, None]
                slots = cache_pos[:, None] + jnp.arange(s)[None, :]
                k_cache = k_cache.at[rows, slots].set(
                    k.astype(k_cache.dtype)
                )
                v_cache = v_cache.at[rows, slots].set(
                    v.astype(v_cache.dtype)
                )
            k, v = k_cache, v_cache
            new_cache = (k_cache, v_cache)
        else:
            new_cache = None

        # Grouped-query attention WITHOUT materializing repeated K/V:
        # query head h reads kv head h // groups (same mapping as
        # jnp.repeat(k, groups, axis=2), which would stream 4x the KV
        # cache per decode step). q: (B, S, KV, G, D) vs k: (B, L, KV, D).
        groups = c.num_heads // c.num_kv_heads
        qg = q.reshape(b, s, c.num_kv_heads, groups, head_dim)
        scores = jnp.einsum(
            "bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32
        ) / np.sqrt(head_dim)
        # attn_bias is (B|1, 1, S, L); insert the group axis it broadcasts over
        scores = scores + attn_bias[:, :, None]
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = jnp.einsum(
            "bhgqk,bkhd->bqhgd", probs, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = _dense(c, h, "o_proj")(
            ctx.reshape(b, s, c.num_heads * head_dim)
        )
        return out, new_cache


class DecoderMLP(nn.Module):
    config: DecoderConfig

    @nn.compact
    def __call__(self, x):
        c = self.config
        if c.fused_projections:
            gu = _dense(c, 2 * c.intermediate_size, "gateup_proj")(x)
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = _dense(c, c.intermediate_size, "gate_proj")(x)
            up = _dense(c, c.intermediate_size, "up_proj")(x)
        return _dense(c, x.shape[-1], "down_proj")(
            jax.nn.silu(gate) * up
        )


class DecoderLayer(nn.Module):
    config: DecoderConfig

    @nn.compact
    def __call__(self, x, positions, attn_bias, cache=None):
        c = self.config
        attn_in = RMSNorm(c.rms_norm_eps, name="input_norm")(x)
        attn_out, new_cache = DecoderAttention(c, name="attention")(
            attn_in, positions, attn_bias, cache
        )
        x = x + attn_out
        mlp_in = RMSNorm(c.rms_norm_eps, name="post_attention_norm")(x)
        x = x + DecoderMLP(c, name="mlp")(mlp_in)
        return x, new_cache


class LlamaDecoder(nn.Module):
    """Returns logits (B, S, V). With `cache`, runs one incremental step."""

    config: DecoderConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        positions: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        cache: Optional[Dict] = None,
        cache_pos: Optional[jnp.ndarray] = None,
        kv_valid: Optional[jnp.ndarray] = None,
    ):
        c = self.config
        b, s = input_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(
                jnp.arange(s, dtype=jnp.int32)[None, :], (b, s)
            )
        if c.quantized_weights:
            embed = QuantEmbed(
                c.vocab_size,
                c.hidden_size,
                backend=c.quantized_backend,
                name="embed_tokens",
            )
        else:
            embed = nn.Embed(c.vocab_size, c.hidden_size, name="embed_tokens")
        x = embed(input_ids).astype(c.compute_dtype)

        if cache is None:
            # causal (+ padding) bias over the in-sequence keys
            causal = jnp.tril(jnp.ones((s, s), bool))
            bias = jnp.where(causal[None, None], 0.0, -1e9)
            if attention_mask is not None:
                pad = jnp.where(
                    attention_mask[:, None, None, :] > 0, 0.0, -1e9
                )
                bias = bias + pad
        elif kv_valid is not None:
            # decode step with cache SLOTS decoupled from token
            # positions (batched ragged decode writes every row's step-t
            # token at the same scalar slot, so the KV update is a
            # dynamic_update_slice instead of 2-per-layer scatters): the
            # caller supplies the full (B, cache_len) key-validity mask
            # — which slots hold real, causally visible tokens — and
            # `positions` stays the true per-row token position (RoPE).
            # A (B, S, cache_len) mask gives each query token its OWN
            # visible-key set — the speculative verify block needs
            # within-block causality (query at block offset o must not
            # see the drafts after it).
            if kv_valid.ndim == 3:
                bias = jnp.where(kv_valid[:, None, :, :], 0.0, -1e9)
            else:
                bias = jnp.where(kv_valid[:, None, None, :], 0.0, -1e9)
        else:
            # cache mode (prefill or decode step): query at position p
            # attends cache keys at positions <= p. attention_mask, when
            # given, is a (B, cache_len) key-validity mask — used by
            # batched prefill to hide right-padding of shorter prompts.
            cache_len = cache["k"][0].shape[1]
            key_pos = jnp.arange(cache_len, dtype=jnp.int32)
            bias = jnp.where(
                key_pos[None, None, None, :] <= positions[:, None, :, None],
                0.0,
                -1e9,
            )
            if attention_mask is not None:
                bias = bias + jnp.where(
                    attention_mask[:, None, None, :] > 0, 0.0, -1e9
                )

        new_cache = {"k": [], "v": []} if cache is not None else None
        for i in range(c.num_layers):
            layer_cache = None
            if cache is not None:
                layer_cache = (cache["k"][i], cache["v"][i], cache_pos)
            x, updated = DecoderLayer(c, name=f"layer_{i}")(
                x, positions, bias, layer_cache
            )
            if updated is not None:
                new_cache["k"].append(updated[0])
                new_cache["v"].append(updated[1])
        x = RMSNorm(c.rms_norm_eps, name="final_norm")(x)
        if c.tie_word_embeddings:
            if c.quantized_weights:
                logits = embed.attend(x)
            else:
                # f32 logits WITHOUT upcasting the (V, H) table: keep both
                # operands in their stored dtype and accumulate in f32
                # (embed.attend(x.astype(f32)) forces a full f32 read of
                # the half-GB embedding every decode step when params are
                # bf16).
                logits = jax.lax.dot_general(
                    x,
                    embed.embedding,
                    dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        else:
            logits = _dense(c, c.vocab_size, "lm_head")(x)
            if c.quantized_weights:
                logits = logits.astype(jnp.float32)
        if cache is not None:
            return logits, new_cache
        return logits


def fuse_params(params: Dict) -> Dict:
    """Convert an unfused param tree (q/k/v + gate/up projections) to the
    fused-serving layout consumed when ``config.fused_projections`` is
    set. Concatenation along the OUTPUT dim is exact: each output column
    keeps its own reduction, so fused matmuls are the same arithmetic."""
    out: Dict[str, Any] = {}
    for name, sub in params.items():
        if not name.startswith("layer_"):
            out[name] = sub
            continue
        att, mlp = sub["attention"], sub["mlp"]
        out[name] = dict(sub)
        out[name]["attention"] = {
            "qkv_proj": {
                "kernel": jnp.concatenate(
                    [
                        att["q_proj"]["kernel"],
                        att["k_proj"]["kernel"],
                        att["v_proj"]["kernel"],
                    ],
                    axis=1,
                )
            },
            "o_proj": att["o_proj"],
        }
        out[name]["mlp"] = {
            "gateup_proj": {
                "kernel": jnp.concatenate(
                    [mlp["gate_proj"]["kernel"], mlp["up_proj"]["kernel"]],
                    axis=1,
                )
            },
            "down_proj": mlp["down_proj"],
        }
    return out


def cast_params(params: Dict, dtype) -> Dict:
    """Cast floating-point weight leaves to `dtype` (serving wants bf16:
    batch-1 decode is HBM-bound on the weight stream, and f32 params
    double it — measured 2x step latency on the 1B config)."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        params,
    )


def quantize_decoder_params(params: Dict, bits: int = 8) -> Dict:
    """Convert a served param tree to the quantized layout consumed when
    ``config.quantized_weights`` is set: every Dense ``{kernel}`` leaf
    becomes ``{values int8, scale f32}`` (per-output-channel symmetric;
    bits=4 packs layer projections two-nibbles-per-byte, K-half layout),
    and the tied embedding ``{embedding}`` becomes a per-row-quantized
    int8 table shared by the token gather and the lm_head matmul
    (embedding/lm_head stay int8 in 4-bit mode — the logits argmax is
    the quality-critical matmul).

    Apply AFTER cast_params (scales are derived in f32 either way and
    must STAY f32 — the kernels fold them into the f32 accumulator).
    """
    from persian_rag_tpu.ops.quant_matmul import (
        quantize_weight,
        quantize_weight_int4,
    )

    def walk(d, path=()):
        out = {}
        for name, sub in d.items():
            if isinstance(sub, dict):
                keys = set(sub)
                if keys == {"kernel"}:
                    kernel = jnp.asarray(sub["kernel"])
                    if bits == 4 and name != "lm_head":
                        values, scale = quantize_weight_int4(kernel)
                    else:
                        values, scale = quantize_weight(kernel, axis=0)
                    out[name] = {"values": values, "scale": scale}
                elif keys == {"embedding"}:
                    values, scale = quantize_weight(
                        jnp.asarray(sub["embedding"]), axis=1
                    )
                    out[name] = {"values": values, "scale": scale}
                else:
                    out[name] = walk(sub, path + (name,))
            else:
                out[name] = sub
        return out

    return walk(params)


def init_cache(
    config: DecoderConfig, batch: int, max_len: int
) -> Dict[str, list]:
    head_dim = config.hidden_size // config.num_heads
    shape = (batch, max_len, config.num_kv_heads, head_dim)
    # distinct buffers per layer (not one zeros array list-multiplied):
    # the continuous batcher donates the whole cache pytree to its
    # jitted segment/admit calls, and donating one aliased buffer twice
    # is a runtime error.
    return {
        "k": [
            jnp.zeros(shape, config.compute_dtype)
            for _ in range(config.num_layers)
        ],
        "v": [
            jnp.zeros(shape, config.compute_dtype)
            for _ in range(config.num_layers)
        ],
    }


# ---------------------------------------------------------------------------
# HF checkpoint import (LlamaForCausalLM naming).
# ---------------------------------------------------------------------------


def params_from_llama(sd: Dict[str, Any], config: DecoderConfig) -> Dict:
    def _np(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x)

    def dense(prefix):
        return {"kernel": _np(sd[prefix + ".weight"]).T}

    prefix = "model." if any(k.startswith("model.") for k in sd) else ""
    params: Dict[str, Any] = {
        "embed_tokens": {
            "embedding": _np(sd[f"{prefix}embed_tokens.weight"])
        },
        "final_norm": {"scale": _np(sd[f"{prefix}norm.weight"])},
    }
    for i in range(config.num_layers):
        p = f"{prefix}layers.{i}"
        params[f"layer_{i}"] = {
            "input_norm": {"scale": _np(sd[f"{p}.input_layernorm.weight"])},
            "post_attention_norm": {
                "scale": _np(sd[f"{p}.post_attention_layernorm.weight"])
            },
            "attention": {
                "q_proj": dense(f"{p}.self_attn.q_proj"),
                "k_proj": dense(f"{p}.self_attn.k_proj"),
                "v_proj": dense(f"{p}.self_attn.v_proj"),
                "o_proj": dense(f"{p}.self_attn.o_proj"),
            },
            "mlp": {
                "gate_proj": dense(f"{p}.mlp.gate_proj"),
                "up_proj": dense(f"{p}.mlp.up_proj"),
                "down_proj": dense(f"{p}.mlp.down_proj"),
            },
        }
    if not config.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = dense("lm_head")
    return params
