"""Sentence-embedding pooling heads (sentence-transformers semantics).

The reference's three models pool differently (sentence-transformers module
configs the reference loads implicitly via SentenceTransformer(...)):

* MiniLM-L12 paraphrase: masked mean pooling, no projection, no normalize.
* distiluse-v2: masked mean pooling -> Dense(768->512, tanh), no normalize.
* multilingual-e5-base: masked mean pooling, L2 normalize.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def mean_pool(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over the sequence dim: (B, S, H) -> (B, H)."""
    mask = attention_mask[:, :, None].astype(hidden.dtype)
    summed = jnp.sum(hidden * mask, axis=1)
    counts = jnp.clip(jnp.sum(mask, axis=1), 1e-9, None)
    return summed / counts


def cls_pool(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    del attention_mask
    return hidden[:, 0, :]


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, eps)


class PoolingHead(nn.Module):
    """pool -> optional dense(tanh) projection -> optional normalize."""

    pooling: str = "mean"             # "mean" | "cls"
    projection_dim: Optional[int] = None
    projection_activation: str = "tanh"
    normalize: bool = False

    @nn.compact
    def __call__(
        self, hidden: jnp.ndarray, attention_mask: jnp.ndarray
    ) -> jnp.ndarray:
        if self.pooling == "mean":
            x = mean_pool(hidden, attention_mask)
        elif self.pooling == "cls":
            x = cls_pool(hidden, attention_mask)
        else:
            raise ValueError(f"unknown pooling {self.pooling}")
        if self.projection_dim:
            x = nn.Dense(self.projection_dim, name="projection")(x)
            if self.projection_activation == "tanh":
                x = jnp.tanh(x)
        if self.normalize:
            x = l2_normalize(x)
        return x
