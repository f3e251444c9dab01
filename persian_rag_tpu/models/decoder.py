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
    # KV-cache storage: "compute" (bf16/f32 = compute_dtype) or "int8"
    # (llama.cpp --cache-type-k/-v q8_0 parity). int8 halves the
    # per-step KV read — the bottleneck once batch grows (batch-32
    # decode measured KV-read-bound) — and halves cache HBM residency,
    # doubling the serveable batch x context budget. Symmetric
    # per-(token, kv-head) scales (finer than q8_0's 32-element
    # blocks); dequant folds into the attention einsums, so the HBM
    # stream stays int8 end to end.
    kv_cache_dtype: str = "compute"

    @classmethod
    def llama32_1b(cls, **kw) -> "DecoderConfig":
        return cls(**kw)  # defaults above are Llama-3.2-1B

    @classmethod
    def llama32_3b(cls, **kw) -> "DecoderConfig":
        """Llama-3.2-3B arch — the next size up from the reference's
        served 1B (notebooks cell 7 fine-tunes 3.2-1B; BASELINE.md).
        int8 weights are ~3.2 GB: comfortable single-v5e serving."""
        fields = dict(
            hidden_size=3072, num_layers=28, num_heads=24,
            num_kv_heads=8, intermediate_size=8192,
        )
        fields.update(kw)
        return cls(**fields)

    @classmethod
    def llama31_8b(cls, **kw) -> "DecoderConfig":
        """Llama-3.1-8B arch (untied lm_head). int8 weights ~7.5 GB —
        fits one 16 GB v5e only through the quantized serving path."""
        fields = dict(
            hidden_size=4096, num_layers=32, num_heads=32,
            num_kv_heads=8, intermediate_size=14336,
            tie_word_embeddings=False,
        )
        fields.update(kw)
        return cls(**fields)

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


def _quantize_kv(x: jnp.ndarray):
    """Symmetric int8 over the head dim: x (B, S, H, D) -> (values int8,
    scale f32 (B, S, H)). amax scaling per (token, head); an all-zero
    vector (e.g. a padding slot) maps to values 0 / scale 0 rather than
    a 0/0 NaN."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    inv = jnp.where(amax > 0, 127.0 / amax, 0.0)
    values = jnp.round(xf * inv[..., None]).astype(jnp.int8)
    return values, amax / 127.0


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

        k_scale = v_scale = None
        if cache is not None:
            # write this step's k/v block at the SCALAR cache position:
            # prefill writes the whole prompt block at 0; every decode
            # step (single or batched) writes one token at a shared slot
            # — batched ragged decode decouples slot from token position
            # (generator._batch_loop_fn), so no per-row scatter exists.
            k_cache, v_cache, cache_pos, k_scale, v_scale = cache
            quant_kv = k_scale is not None
            if quant_kv:
                # int8 KV (config.kv_cache_dtype): quantize the fresh
                # block once at write; reads stream int8 forever after.
                k_new, ks_new = _quantize_kv(k)
                v_new, vs_new = _quantize_kv(v)
            else:
                k_new = k.astype(k_cache.dtype)
                v_new = v.astype(v_cache.dtype)
            if jnp.ndim(cache_pos) == 0:
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, k_new, (0, cache_pos, 0, 0)
                )
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, v_new, (0, cache_pos, 0, 0)
                )
                if quant_kv:
                    k_scale = jax.lax.dynamic_update_slice(
                        k_scale, ks_new, (0, cache_pos, 0)
                    )
                    v_scale = jax.lax.dynamic_update_slice(
                        v_scale, vs_new, (0, cache_pos, 0)
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
                k_cache = k_cache.at[rows, slots].set(k_new)
                v_cache = v_cache.at[rows, slots].set(v_new)
                if quant_kv:
                    k_scale = k_scale.at[rows, slots].set(ks_new)
                    v_scale = v_scale.at[rows, slots].set(vs_new)
            k, v = k_cache, v_cache
            new_cache = (k_cache, v_cache, k_scale, v_scale)
        else:
            new_cache = None

        # Grouped-query attention WITHOUT materializing repeated K/V:
        # query head h reads kv head h // groups (same mapping as
        # jnp.repeat(k, groups, axis=2), which would stream 4x the KV
        # cache per decode step). q: (B, S, KV, G, D) vs k: (B, L, KV, D).
        groups = c.num_heads // c.num_kv_heads
        qg = q.reshape(b, s, c.num_kv_heads, groups, head_dim)
        # int8 KV dequant folds into the einsums: the convert runs
        # in-register (XLA convert-in-dot) and the per-(token, head)
        # scale multiplies the f32 scores / probs AFTER the reduction —
        # HBM only ever streams the int8 values.
        k_mat = k.astype(x.dtype) if k_scale is not None else k
        scores = jnp.einsum(
            "bqhgd,bkhd->bhgqk", qg, k_mat,
            preferred_element_type=jnp.float32,
        ) / np.sqrt(head_dim)
        if k_scale is not None:
            # scale (B, L, KV) -> broadcast over (g, q): (B, KV, 1, 1, L)
            scores = scores * k_scale.transpose(0, 2, 1)[:, :, None, None]
        # attn_bias is (B|1, 1, S, L); insert the group axis it broadcasts over
        scores = scores + attn_bias[:, :, None]
        probs = jax.nn.softmax(scores, axis=-1)
        if v_scale is not None:
            # fold the v dequant scale into the (still-f32) probs
            probs = probs * v_scale.transpose(0, 2, 1)[:, :, None, None]
        probs = probs.astype(x.dtype)
        v_mat = v.astype(x.dtype) if v_scale is not None else v
        ctx = jnp.einsum(
            "bhgqk,bkhd->bqhgd", probs, v_mat,
            preferred_element_type=jnp.float32,
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
        return_hidden: bool = False,
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

        quant_kv = cache is not None and "k_scale" in cache
        new_cache = None
        if cache is not None:
            new_cache = {"k": [], "v": []}
            if quant_kv:
                new_cache.update({"k_scale": [], "v_scale": []})
        for i in range(c.num_layers):
            layer_cache = None
            if cache is not None:
                layer_cache = (
                    cache["k"][i],
                    cache["v"][i],
                    cache_pos,
                    cache["k_scale"][i] if quant_kv else None,
                    cache["v_scale"][i] if quant_kv else None,
                )
            x, updated = DecoderLayer(c, name=f"layer_{i}")(
                x, positions, bias, layer_cache
            )
            if updated is not None:
                new_cache["k"].append(updated[0])
                new_cache["v"].append(updated[1])
                if quant_kv:
                    new_cache["k_scale"].append(updated[2])
                    new_cache["v_scale"].append(updated[3])
        x = RMSNorm(c.rms_norm_eps, name="final_norm")(x)
        if return_hidden:
            # embedding extraction (llama.cpp --embedding serving): the
            # final-norm hidden states are the embedding source; skip
            # the (H, V) logits matmul entirely — at 128k vocab it is
            # the most expensive matmul in the step and the /embedding
            # contract never reads logits.
            if cache is not None:
                return x, new_cache
            return x
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
    double it — measured 2x step latency on the 1B config).

    Quantized ``{values int8, scale f32}`` pairs pass through untouched:
    the dequant kernels fold the scale into the f32 accumulator and
    require it to STAY f32 (a pre-quantized tree, e.g. from
    random_quantized_params, must survive the serving cast)."""

    def walk(d):
        if isinstance(d, dict):
            if set(d) == {"values", "scale"} and jnp.issubdtype(
                jnp.asarray(d["values"]).dtype, jnp.integer
            ):
                return d
            return {name: walk(sub) for name, sub in d.items()}
        return (
            d.astype(dtype)
            if jnp.issubdtype(d.dtype, jnp.floating)
            else d
        )

    return walk(params)


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


def random_quantized_params(
    config: DecoderConfig, seed: int = 0, bits: Optional[int] = None
) -> Dict:
    """Random int8/int4 param tree built DIRECTLY on device, for
    throughput work on model sizes whose float tree cannot exist:
    TextGenerator's default path inits the f32 model and quantizes,
    which for an 8B config means a ~32 GB f32 tree — 2x this chip's
    HBM. Here every leaf is generated quantized (peak memory = the
    final int8 tree plus one leaf), so 3B/8B-arch serving benches run
    without a checkpoint or a float intermediate.

    Scales are per-output-channel constants chosen so dequantized
    weights match lecun-normal magnitude (std 1/sqrt(fan_in)) — the
    forward stays numerically sane (no bf16 overflow through 32
    layers); values are uniform ints, which is what throughput cares
    about (the byte stream, not the distribution)."""
    bits = config.quantized_bits if bits is None else bits
    c, h = config, config.hidden_size
    head_dim = h // c.num_heads
    key = jax.random.PRNGKey(seed)
    counter = [0]

    def ints(shape):
        counter[0] += 1
        return jax.random.randint(
            jax.random.fold_in(key, counter[0]),
            shape,
            -127,
            128,
            dtype=jnp.int8,
        )

    def dense(k_in, n_out, four_bit: bool):
        # uniform[-127,127] int8 has std ~73.6; a packed random byte's
        # two nibbles decode to uniform[-8,7], std ~4.6
        if four_bit:
            values = ints((k_in // 2, n_out))
            scale = 1.0 / (4.6 * np.sqrt(k_in))
        else:
            values = ints((k_in, n_out))
            scale = 1.0 / (73.6 * np.sqrt(k_in))
        return {
            "values": values,
            "scale": jnp.full((1, n_out), scale, jnp.float32),
        }

    four = bits == 4
    norm = lambda: {"scale": jnp.ones((h,), c.compute_dtype)}  # noqa: E731
    params: Dict[str, Any] = {
        "embed_tokens": {
            "values": ints((c.vocab_size, h)),
            "scale": jnp.full(
                (c.vocab_size, 1), 1.0 / (73.6 * np.sqrt(h)), jnp.float32
            ),
        },
        "final_norm": norm(),
    }
    for i in range(c.num_layers):
        params[f"layer_{i}"] = {
            "attention": {
                "q_proj": dense(h, c.num_heads * head_dim, four),
                "k_proj": dense(h, c.num_kv_heads * head_dim, four),
                "v_proj": dense(h, c.num_kv_heads * head_dim, four),
                "o_proj": dense(c.num_heads * head_dim, h, four),
            },
            "mlp": {
                "gate_proj": dense(h, c.intermediate_size, four),
                "up_proj": dense(h, c.intermediate_size, four),
                "down_proj": dense(c.intermediate_size, h, four),
            },
            "input_norm": norm(),
            "post_attention_norm": norm(),
        }
    if not c.tie_word_embeddings:
        # the untied lm_head stays int8 even in 4-bit mode (the logits
        # argmax is the quality-critical matmul; quantize_decoder_params
        # applies the same exception)
        params["lm_head"] = dense(h, c.vocab_size, False)
    return params


def init_cache(
    config: DecoderConfig, batch: int, max_len: int
) -> Dict[str, list]:
    head_dim = config.hidden_size // config.num_heads
    shape = (batch, max_len, config.num_kv_heads, head_dim)
    kv_dtype = (
        jnp.int8
        if config.kv_cache_dtype == "int8"
        else config.compute_dtype
    )
    # distinct buffers per layer (not one zeros array list-multiplied):
    # the continuous batcher donates the whole cache pytree to its
    # jitted segment/admit calls, and donating one aliased buffer twice
    # is a runtime error.
    out = {
        "k": [jnp.zeros(shape, kv_dtype) for _ in range(config.num_layers)],
        "v": [jnp.zeros(shape, kv_dtype) for _ in range(config.num_layers)],
    }
    if config.kv_cache_dtype == "int8":
        out["k_scale"] = [
            jnp.zeros(shape[:3], jnp.float32)
            for _ in range(config.num_layers)
        ]
        out["v_scale"] = [
            jnp.zeros(shape[:3], jnp.float32)
            for _ in range(config.num_layers)
        ]
    return out


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
