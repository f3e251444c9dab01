"""Device-side hybrid score fusion (+ optional stored-vector rerank).

Reproduces the reference's hybrid retrieval semantics (reference:
src/retrieval.py:174-216) — each channel retrieves 2*k candidates,
scores are max-normalized per channel, summed with 0.6/0.4 weights,
deduplicated by id, and re-sorted — as pure jittable array math, so the
whole hybrid (+rerank) pipeline can run as ONE device dispatch instead
of a per-query host Python loop over dicts (measured to dominate
hybrid+rerank serving latency).

Tie/dedup order parity with the host implementation:
* the host builds the fused dict with dense hits first (in dense rank
  order) then adds bm25-only hits (in bm25 rank order), and Python's
  stable sort preserves that insertion order among equal fused scores;
* here candidates are laid out [dense slots asc, bm25 slots asc], bm25
  slots whose id already appears in the dense list are masked out
  (dedup keeps the dense occurrence, whose fused score includes both
  contributions), and `lax.top_k`'s stability reproduces the same
  order among ties.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from persian_rag_tpu.ops._merge import NEG_INF


def _channel_norm(scores: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Per-query max-normalization with the reference's zero guard
    (`norm = s / max if max > 0 else 0.0`, src/retrieval.py:188-199)."""
    masked = jnp.where(valid, scores, NEG_INF)
    mx = jnp.max(masked, axis=1, keepdims=True)
    return jnp.where(
        valid & (mx > 0), scores / jnp.where(mx > 0, mx, 1.0), 0.0
    )


@functools.partial(jax.jit, static_argnames=("k", "dense_sim"))
def fuse_hybrid(
    dense_scores: jnp.ndarray,
    dense_ids: jnp.ndarray,
    lex_scores: jnp.ndarray,
    lex_ids: jnp.ndarray,
    k: int,
    dense_weight: float = 0.6,
    bm25_weight: float = 0.4,
    dense_sim: str = "l2",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fuse per-channel top-m results into hybrid top-k.

    Args:
      dense_scores/dense_ids: (Q, m_d) from the dense channel, rank
        order descending by relevance. For dense_sim="l2" the scores
        are squared distances (mapped here via 1/(1+d2),
        src/retrieval.py:108); otherwise they are similarities as-is.
      lex_scores/lex_ids: (Q, m_b) BM25 channel, score descending.
        Invalid slots carry id -1 (masked out).
      k: number of fused results to return.

    Returns (fused_scores (Q, k), ids (Q, k)); empty slots carry id -1
    and score NEG_INF.
    """
    d_valid = dense_ids >= 0
    b_valid = lex_ids >= 0
    if dense_sim == "l2":
        d_sim = 1.0 / (1.0 + dense_scores)
    else:
        d_sim = dense_scores
    d_norm = _channel_norm(d_sim, d_valid) * dense_weight
    b_norm = _channel_norm(lex_scores, b_valid) * bm25_weight

    # cross-channel contribution lookup by id equality: (Q, m_d, m_b)
    match = dense_ids[:, :, None] == lex_ids[:, None, :]
    match = match & d_valid[:, :, None] & b_valid[:, None, :]
    d_from_b = jnp.sum(jnp.where(match, b_norm[:, None, :], 0.0), axis=2)
    dense_fused = jnp.where(d_valid, d_norm + d_from_b, NEG_INF)

    # bm25-only slots: ids already covered by the dense list are dupes
    dup = jnp.any(match, axis=1)
    lex_fused = jnp.where(b_valid & ~dup, b_norm, NEG_INF)

    cand_s = jnp.concatenate([dense_fused, lex_fused], axis=1)
    cand_i = jnp.concatenate([dense_ids, lex_ids], axis=1)
    kk = min(k, cand_s.shape[1])
    top_s, pos = jax.lax.top_k(cand_s, kk)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    return top_s, top_i


def gather_rows_device(
    ids: jnp.ndarray,
    corpus: jnp.ndarray,
    row_scales: Optional[jnp.ndarray] = None,
    refine_corpus: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(Q, k, d) f32 stored vectors for (Q, k) row ids (-1 -> zeros),
    from whichever representation the index keeps (f32/bf16 storage,
    int8 + per-row scales, or the full-precision refine copy)."""
    safe = jnp.maximum(ids, 0)
    if refine_corpus is not None:
        rows = jnp.take(refine_corpus, safe, axis=0).astype(jnp.float32)
    else:
        rows = jnp.take(corpus, safe, axis=0).astype(jnp.float32)
        if row_scales is not None:
            rows = rows * jnp.take(row_scales, safe)[..., None]
    return jnp.where(ids[..., None] >= 0, rows, 0.0)


@functools.partial(jax.jit, static_argnames=())
def rerank_cosine(
    q_emb: jnp.ndarray,
    cand_rows: jnp.ndarray,
    cand_scores: jnp.ndarray,
    cand_ids: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact-cosine rerank of fused candidates (the 'rerank' stage of
    the enhanced hybrid pipeline): cosine(q, stored vector), stable
    sort descending — ties keep the fused-score order, matching the
    host np.argsort(-sims, kind='stable') over fused candidates.

    Args: q_emb (Q, d); cand_rows (Q, k, d); cand_scores/ids (Q, k)
    fused results (used for masking + tie order). Returns
    (cosine scores, ids) re-sorted."""
    q32 = q_emb.astype(jnp.float32)
    num = jnp.einsum(
        "qd,qkd->qk", q32, cand_rows, preferred_element_type=jnp.float32
    )
    qn = jnp.linalg.norm(q32, axis=1, keepdims=True)
    cn = jnp.linalg.norm(cand_rows, axis=2)
    sims = num / jnp.maximum(qn * cn, 1e-12)
    valid = cand_ids >= 0
    sims = jnp.where(valid, sims, NEG_INF)
    # stable top_k over [candidates in fused order] keeps fused order
    # among exact cosine ties
    top_s, pos = jax.lax.top_k(sims, sims.shape[1])
    top_i = jnp.take_along_axis(cand_ids, pos, axis=1)
    return top_s, jnp.where(top_s > NEG_INF / 2, top_i, -1)
