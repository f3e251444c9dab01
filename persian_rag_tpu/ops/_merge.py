"""Shared running-top-k merge used inside Pallas kernels.

Candidates must be ordered [previous best (rank order), new candidates in
ascending index order]; `jnp.argmax` takes the first occurrence, which gives
lower-index-first tie-breaking (FAISS flat-search semantics).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -3.0e38  # plain float: jnp scalars become captured consts in Pallas


def merge_topk(
    cand_s: jnp.ndarray, cand_i: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Extract the k best (score, index) pairs from each row of candidates.

    cand_s, cand_i: (rows, width). Returns ((rows, k), (rows, k)).
    k-step iterative max-extraction: k is small (<=128), so this stays on
    the VPU with no sort network.
    """
    rows, width = cand_s.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    new_s = []
    new_i = []
    for _ in range(k):
        best = jnp.max(cand_s, axis=1, keepdims=True)
        am = jnp.argmax(cand_s, axis=1)[:, None]
        onehot = pos == am
        chosen = jnp.sum(jnp.where(onehot, cand_i, 0), axis=1, keepdims=True)
        new_s.append(best)
        new_i.append(chosen)
        cand_s = jnp.where(onehot, NEG_INF, cand_s)
    return jnp.concatenate(new_s, axis=1), jnp.concatenate(new_i, axis=1)
