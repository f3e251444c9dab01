"""Fused flat-index search: tiled matmul + running top-k.

This op replaces the reference's FAISS ``IndexFlatL2.search`` C++ scan
(reference: src/retrieval.py:102, src/create_embeddings.py:130-136) with a
TPU-native kernel:

* The (N, d) corpus matrix lives in HBM; the Pallas kernel streams it
  through VMEM tile by tile (the pipeline double-buffers the DMA), computes
  per-tile scores on the MXU, and folds them into a per-query running top-k
  held in the revisited output block — the (Q, N) score matrix is never
  materialized in HBM.
* Supported metrics:
    - ``dot``    : raw inner product, scores descending.
    - ``l2``     : squared L2 distance ascending (FAISS IndexFlatL2
                   semantics), computed as ||q||^2 - (2 q.c - ||c||^2).
* Tie-breaking matches FAISS flat search: equal scores prefer the lower
  corpus row index, so parity tests against exact references are bit-honest.

A pure-JAX reference implementation (`flat_topk_ref`) backs parity tests and
non-TPU execution; `flat_topk` dispatches.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (memory spaces)

from persian_rag_tpu.ops._merge import NEG_INF, merge_topk


def _pad_to(x: jnp.ndarray, size: int, axis: int, value=0) -> jnp.ndarray:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Pure-JAX reference (also the CPU execution path).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "metric", "compute_dtype"))
def flat_topk_ref(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    metric: str = "dot",
    compute_dtype: Optional[jnp.dtype] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k by full score materialization (O(Q*N) memory)."""
    q = queries
    c = corpus
    if compute_dtype is not None:
        q = q.astype(compute_dtype)
        c = c.astype(compute_dtype)
    scores = jnp.dot(
        q,
        c.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric == "l2":
        c_sq = jnp.sum(
            corpus.astype(jnp.float32) * corpus.astype(jnp.float32), axis=-1
        )
        q_sq = jnp.sum(
            queries.astype(jnp.float32) * queries.astype(jnp.float32), axis=-1
        )
        # maximize s = 2 q.c - ||c||^2  <=>  minimize squared L2
        s = 2.0 * scores - c_sq[None, :]
        top_s, top_i = jax.lax.top_k(s, k)
        return q_sq[:, None] - top_s, top_i.astype(jnp.int32)
    elif metric == "dot":
        top_s, top_i = jax.lax.top_k(scores, k)
        return top_s, top_i.astype(jnp.int32)
    else:
        raise ValueError(f"unknown metric: {metric}")


# ---------------------------------------------------------------------------
# Pallas kernel.
# ---------------------------------------------------------------------------


def _topk_kernel(
    q_ref,
    c_ref,
    cn_ref,
    out_s_ref,
    out_i_ref,
    *,
    k: int,
    n_actual: int,
    tile_n: int,
    metric: str,
    compute_dtype,
):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.full_like(out_i_ref, -1)

    q = q_ref[:].astype(compute_dtype)
    c = c_ref[:].astype(compute_dtype)
    # (QT, d) x (d, TN) on the MXU, f32 accumulation. For f32 inputs force
    # full precision (parity with exact CPU search); bf16 inputs use the
    # native MXU path.
    precision = (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(compute_dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    s = jax.lax.dot_general(
        q,
        c,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if metric == "l2":
        s = 2.0 * s - cn_ref[:]

    qt = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (qt, tile_n), 1) + j * tile_n
    valid = col < n_actual
    s = jnp.where(valid, s, NEG_INF)

    # Fold this tile into the running top-k. Candidates are ordered
    # [running best (extracted earlier, lower global index on ties),
    #  tile columns in ascending index order]; argmax takes the first
    # occurrence, which reproduces FAISS's lower-index-first tie-break.
    cand_s = jnp.concatenate([out_s_ref[:], s], axis=1)
    cand_i = jnp.concatenate([out_i_ref[:], col], axis=1)
    out_s_ref[:], out_i_ref[:] = merge_topk(cand_s, cand_i, k)


def flat_topk_pallas(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    metric: str = "dot",
    corpus_sqnorm: Optional[jnp.ndarray] = None,
    tile_n: int = 1024,
    tile_q: int = 128,
    compute_dtype: jnp.dtype = jnp.float32,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused search over an HBM-resident corpus.

    Returns (scores, indices), each (Q, k). For ``l2`` the scores are squared
    distances ascending; for ``dot`` raw inner products descending.
    """
    n_q, d = queries.shape
    n, dc = corpus.shape
    assert d == dc, (d, dc)
    assert k >= 1
    tile_n = min(tile_n, _round_up(n, 128))
    tile_q = min(tile_q, _round_up(n_q, 8))

    d_pad = _round_up(d, 128)
    q_pad = _round_up(n_q, tile_q)
    n_pad = _round_up(n, tile_n)

    q = _pad_to(_pad_to(queries, d_pad, 1), q_pad, 0)
    c = _pad_to(_pad_to(corpus, d_pad, 1), n_pad, 0)

    if metric == "l2":
        if corpus_sqnorm is None:
            corpus_sqnorm = jnp.sum(
                corpus.astype(jnp.float32) * corpus.astype(jnp.float32), axis=-1
            )
        cn = _pad_to(corpus_sqnorm.astype(jnp.float32)[None, :], n_pad, 1)
    else:
        cn = jnp.zeros((1, n_pad), jnp.float32)

    grid = (q_pad // tile_q, n_pad // tile_n)

    kernel = functools.partial(
        _topk_kernel,
        k=k,
        n_actual=n,
        tile_n=tile_n,
        metric=metric,
        compute_dtype=compute_dtype,
    )

    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, d_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_n, d_pad), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, k), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_q, k), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * n_pad * d_pad,
            bytes_accessed=q_pad * d_pad * 4 + n_pad * d_pad * 4 + q_pad * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, c, cn)

    out_s = out_s[:n_q]
    out_i = out_i[:n_q]
    if metric == "l2":
        q_sq = jnp.sum(
            queries.astype(jnp.float32) * queries.astype(jnp.float32),
            axis=-1,
            keepdims=True,
        )
        out_s = q_sq - out_s
    return out_s, out_i


def _backend() -> str:
    return jax.default_backend()


def flat_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    metric: str = "dot",
    corpus_sqnorm: Optional[jnp.ndarray] = None,
    use_pallas: Optional[bool] = None,
    tile_n: int = 1024,
    tile_q: int = 128,
    compute_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatching entry point: Pallas on TPU, pure-JAX elsewhere."""
    k = min(k, corpus.shape[0])
    if use_pallas is None:
        use_pallas = _backend() == "tpu"
    if use_pallas:
        return flat_topk_pallas(
            queries,
            corpus,
            k,
            metric=metric,
            corpus_sqnorm=corpus_sqnorm,
            tile_n=tile_n,
            tile_q=tile_q,
            compute_dtype=compute_dtype,
            interpret=_backend() != "tpu",
        )
    return flat_topk_ref(queries, corpus, k, metric=metric)
