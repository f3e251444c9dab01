"""Flax transformer text encoder.

One configurable post-LayerNorm encoder covers the three architectures the
reference runs through sentence-transformers/torch (reference:
src/embedding_trainer.py:22, src/create_embeddings.py:78, config.yaml:2-5):

* BERT family — paraphrase-multilingual-MiniLM-L12-v2
  (12 layers, hidden 384, heads 12, token-type embeddings)
* DistilBERT — distiluse-base-multilingual-cased-v2
  (6 layers, hidden 768, no token types, + a 512-d tanh projection head)
* XLM-RoBERTa — intfloat/multilingual-e5-base
  (12 layers, hidden 768, position ids offset past padding_idx)

TPU notes: everything runs under jit with static shapes (host-side
tokenization pads to bucketed lengths); matmuls prefer bfloat16 with f32
accumulation via the `compute_dtype` knob; attention uses an additive mask
so padded positions never contribute.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2          # 0 disables token-type embeddings
    layer_norm_eps: float = 1e-12
    # RoBERTa-style position offset: positions start at pad_token_id+1 and
    # padding positions keep the pad position id. 0 disables (BERT style).
    position_offset: int = 0
    pad_token_id: int = 0
    hidden_act: str = "gelu"          # exact erf gelu (HF default)
    compute_dtype: jnp.dtype = jnp.float32
    # rematerialize each layer in the backward pass (jax.checkpoint):
    # trades ~30% more FLOPs for activation memory ~ O(layers) less,
    # the standard TPU recipe for long-sequence / large-batch training
    remat: bool = False

    @classmethod
    def minilm_l12(cls, **kw) -> "EncoderConfig":
        """paraphrase-multilingual-MiniLM-L12-v2 backbone (BERT, 384-d)."""
        return cls(
            vocab_size=250037, hidden_size=384, num_layers=12, num_heads=12,
            intermediate_size=1536, **kw,
        )

    @classmethod
    def distilbert_base(cls, **kw) -> "EncoderConfig":
        """distiluse-base-multilingual-cased-v2 backbone (DistilBERT)."""
        return cls(
            vocab_size=119547, hidden_size=768, num_layers=6, num_heads=12,
            intermediate_size=3072, type_vocab_size=0, **kw,
        )

    @classmethod
    def xlmr_base(cls, **kw) -> "EncoderConfig":
        """multilingual-e5-base backbone (XLM-RoBERTa base)."""
        return cls(
            vocab_size=250002, hidden_size=768, num_layers=12, num_heads=12,
            intermediate_size=3072, max_position_embeddings=514,
            type_vocab_size=1, layer_norm_eps=1e-5, position_offset=2,
            pad_token_id=1, **kw,
        )


def _act(name: str):
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_new":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unknown activation {name}")


class Embeddings(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, token_type_ids=None):
        c = self.config
        b, s = input_ids.shape
        word = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")(
            input_ids
        )
        if c.position_offset:
            # RoBERTa: sequential ids past the offset for non-pad tokens,
            # pad positions pinned at pad_token_id.
            mask = (input_ids != c.pad_token_id).astype(jnp.int32)
            positions = jnp.cumsum(mask, axis=1) * mask + c.pad_token_id
        else:
            positions = jnp.broadcast_to(
                jnp.arange(s, dtype=jnp.int32)[None, :], (b, s)
            )
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size, name="position_embeddings"
        )(positions)
        x = word + pos
        if c.type_vocab_size:
            if token_type_ids is None:
                token_type_ids = jnp.zeros_like(input_ids)
            x = x + nn.Embed(
                c.type_vocab_size, c.hidden_size, name="token_type_embeddings"
            )(token_type_ids)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(x)


class SelfAttention(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: jnp.ndarray):
        c = self.config
        b, s, h = x.shape
        head_dim = h // c.num_heads
        dtype = c.compute_dtype

        def proj(name):
            return nn.Dense(h, name=name)(x).reshape(
                b, s, c.num_heads, head_dim
            )

        q = proj("query")
        k = proj("key")
        v = proj("value")
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk",
            q.astype(dtype),
            k.astype(dtype),
            preferred_element_type=jnp.float32,
        ) / jnp.sqrt(head_dim).astype(jnp.float32)
        scores = scores + attn_bias  # (b, 1, 1, s) additive mask
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd",
            probs.astype(dtype),
            v.astype(dtype),
            preferred_element_type=jnp.float32,
        ).reshape(b, s, h)
        return nn.Dense(h, name="output")(ctx)


class EncoderLayer(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: jnp.ndarray):
        c = self.config
        attn = SelfAttention(c, name="attention")(x, attn_bias)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attention_norm")(
            x + attn
        )
        inter = nn.Dense(c.intermediate_size, name="intermediate")(x)
        inter = _act(c.hidden_act)(inter)
        out = nn.Dense(c.hidden_size, name="ffn_output")(inter)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_norm")(
            x + out
        )


class TransformerEncoder(nn.Module):
    """Returns per-token hidden states (B, S, H)."""

    config: EncoderConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        c = self.config
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        x = Embeddings(c, name="embeddings")(input_ids, token_type_ids)
        bias = jnp.where(
            attention_mask[:, None, None, :] > 0, 0.0, -1e9
        ).astype(jnp.float32)
        layer_cls = nn.remat(EncoderLayer) if c.remat else EncoderLayer
        for i in range(c.num_layers):
            x = layer_cls(c, name=f"layer_{i}")(x, bias)
        return x
