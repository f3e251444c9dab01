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
    corpus_scale: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k by full score materialization (O(Q*N) memory)."""
    q = queries
    c = corpus
    if compute_dtype is not None:
        q = q.astype(compute_dtype)
        c = c.astype(compute_dtype)
    if c.dtype == jnp.int8:
        c = c.astype(jnp.float32)
    scores = jnp.dot(
        q,
        c.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if corpus_scale is not None:
        scores = scores * corpus_scale[None, :].astype(jnp.float32)
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


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "chunk", "compute_dtype")
)
def flat_topk_scan(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    metric: str = "dot",
    chunk: int = 16_384,
    compute_dtype: Optional[jnp.dtype] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k via an XLA lax.scan over corpus chunks.

    Memory is bounded at Q x chunk (the full (Q, N) matrix never
    materializes), and the matmul runs through XLA's native f32 path —
    measured faster than the Pallas exact kernel at large batches on
    this hardware (XLA's HIGHEST-precision matmul schedule beats
    Mosaic's for this shape). Tie-breaking matches FAISS (lower row id
    wins) because chunk-local top-k candidates carry ascending ids and
    lax.top_k is stable.
    """
    n_q, d = queries.shape
    n = corpus.shape[0]
    k = min(k, n)
    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk
    q = queries
    c = corpus
    if compute_dtype is not None:
        q = q.astype(compute_dtype)
        c = c.astype(compute_dtype)
    c = _pad_to(c, n_pad, 0)
    c_chunks = c.reshape(n_chunks, chunk, d)
    if metric == "l2":
        csq = jnp.sum(
            corpus.astype(jnp.float32) * corpus.astype(jnp.float32), axis=-1
        )
        csq = _pad_to(csq, n_pad, 0).reshape(n_chunks, chunk)
    else:
        csq = jnp.zeros((n_chunks, chunk), jnp.float32)

    def body(carry, xs):
        run_s, run_i, start = carry
        c_tile, csq_tile = xs
        s = jnp.dot(
            q,
            c_tile.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if metric == "l2":
            s = 2.0 * s - csq_tile[None, :]
        col = start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n, s, NEG_INF)
        top_s, pos = jax.lax.top_k(s, k)
        top_i = jnp.take_along_axis(col, pos, axis=1)
        # candidates ordered [running (older, lower ids on ties), new]:
        # lax.top_k is stable, preserving FAISS lower-id-first ties.
        cand_s = jnp.concatenate([run_s, top_s], axis=1)
        cand_i = jnp.concatenate([run_i, top_i], axis=1)
        new_s, pos2 = jax.lax.top_k(cand_s, k)
        new_i = jnp.take_along_axis(cand_i, pos2, axis=1)
        return (new_s, new_i, start + chunk), None

    init = (
        jnp.full((n_q, k), NEG_INF, jnp.float32),
        jnp.full((n_q, k), -1, jnp.int32),
        jnp.int32(0),
    )
    (top_s, top_i, _), _ = jax.lax.scan(body, init, (c_chunks, csq))
    if metric == "l2":
        q_sq = jnp.sum(
            queries.astype(jnp.float32) * queries.astype(jnp.float32),
            axis=-1,
            keepdims=True,
        )
        top_s = q_sq - top_s
    return top_s, top_i


# ---------------------------------------------------------------------------
# Pallas kernel.
# ---------------------------------------------------------------------------


def _tile_scores(q_ref, c_ref, compute_dtype, transposed: bool):
    """(QT, TN) f32 scores for one corpus tile on the MXU.

    transposed=True streams the corpus in (d, N) layout so the
    contraction is a plain row-by-column matmul — the (N, d) layout
    contracts dim 1 of BOTH operands, which costs a per-tile corpus
    transpose before the MXU.
    """
    q = q_ref[:].astype(compute_dtype)
    c = c_ref[:].astype(compute_dtype)
    precision = (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(compute_dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    dims = (((1,), (0,)), ((), ())) if transposed else (((1,), (1,)), ((), ()))
    return jax.lax.dot_general(
        q,
        c,
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=precision,
    )


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
    n_easy: int = 4,
    row_scaled: bool = False,
    transposed: bool = False,
    skip_tiles: bool = True,
):
    """Bit-exact kernel with a staged fast path.

    A tile rarely contributes more than a couple of new top-k entries,
    and the full exact merge costs ~6 VPU passes per rank. This kernel
    extracts n_easy candidates cheaply via packed quantized keys (2
    passes per rank + 2 for exact-score recovery) and PROVES the result
    exact with a residual check: quantization is monotone, so a strict
    quantized inequality implies the exact one — if every remaining key
    is strictly below every query's (new) kth-best quantized score, no
    remaining candidate can alter any top-k. Any boundary tie in
    quantized space falls back to the full exact merge of the tile, so
    results (including FAISS lower-index tie-breaking) are bit-identical
    to the brute-force scan in all cases.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.full_like(out_i_ref, -1)

    # (QT, d) x (d, TN) on the MXU, f32 accumulation. For f32 inputs the
    # HIGHEST precision path gives parity with exact CPU search; bf16
    # inputs use the native MXU path.
    s = _tile_scores(q_ref, c_ref, compute_dtype, transposed)
    if metric == "l2":
        s = 2.0 * s - cn_ref[:]
    elif row_scaled:  # int8 storage: fold per-row dequant scales in
        s = s * cn_ref[:]

    qt = s.shape[0]
    col_local = jax.lax.broadcasted_iota(jnp.int32, (qt, tile_n), 1)
    col = col_local + j * tile_n
    valid = col < n_actual
    s = jnp.where(valid, s, NEG_INF)

    ikey = _score_to_ikey(s)
    key = (ikey & ~_COL_MASK) | (tile_n - 1 - col_local)

    run_s = out_s_ref[:]
    run_i = out_i_ref[:]
    if skip_tiles:
        kth_key = _score_to_ikey(run_s[:, k - 1]) & ~_COL_MASK
        # Skip only on strict quantized inequality (proves exact '<'); a
        # quantized tie must merge because the tie may hide an exact '>'.
        tile_max = jnp.max(key)
        threshold = jnp.min(kth_key)
        merge_pred = (j == 0) | (tile_max >= threshold)
    else:
        merge_pred = j >= 0  # always

    @pl.when(merge_pred)
    def _merge():
        keys = key
        staged_s = []
        staged_i = []
        for _ in range(min(n_easy, k)):
            m = jnp.max(keys, axis=1, keepdims=True)
            hit = keys == m
            exact = jnp.max(
                jnp.where(hit, s, NEG_INF), axis=1, keepdims=True
            )
            keys = jnp.where(hit, _INT_MIN, keys)
            staged_s.append(exact)
            staged_i.append(j * tile_n + (tile_n - 1 - (m & _COL_MASK)))
        new_s, new_i = merge_topk(
            jnp.concatenate([run_s] + staged_s, axis=1),
            jnp.concatenate([run_i] + staged_i, axis=1),
            k,
        )
        new_kth_key = _score_to_ikey(new_s[:, k - 1]) & ~_COL_MASK
        residual = jnp.max(keys) >= jnp.min(new_kth_key)

        @pl.when(jnp.logical_not(residual))
        def _commit_staged():
            out_s_ref[:] = new_s
            out_i_ref[:] = new_i

        @pl.when(residual)
        def _full_exact_merge():
            # Candidates ordered [running best (earlier tiles, lower ids
            # on ties), tile columns ascending]; argmax takes the first
            # occurrence -> FAISS lower-index-first tie-breaking.
            cand_s = jnp.concatenate([run_s, s], axis=1)
            cand_i = jnp.concatenate([run_i, col], axis=1)
            out_s_ref[:], out_i_ref[:] = merge_topk(cand_s, cand_i, k)


# ---------------------------------------------------------------------------
# Fast kernel: packed-key extraction.
#
# The exact kernel's per-tile merge costs ~6 VPU passes per extracted rank
# (max, argmax, one-hot, index-select, mask). The fast kernel packs the
# score and the tile column into ONE int32 key:
#
#   ikey = monotone int32 image of the f32 score (sign-flip trick)
#   key  = (ikey & ~0x7FF) | (TILE_N-1 - col)     # low 11 bits: column
#
# so extraction is just `max` + `mask-by-equality` — 2 passes per rank —
# and ties prefer the lower column automatically. Scores are quantized to
# their top 21 bits (relative error ~1e-6; identical quantization across
# tiles keeps the global ranking consistent). Exact mode remains the
# default for bit-honest FAISS parity.
# ---------------------------------------------------------------------------

_COL_BITS = 11
_COL_MASK = (1 << _COL_BITS) - 1
_INT_MIN = -(1 << 31)


def _score_to_ikey(s: jnp.ndarray) -> jnp.ndarray:
    """Monotone f32 -> int32: a > b  <=>  ikey(a) > ikey(b)."""
    i = jax.lax.bitcast_convert_type(s, jnp.int32)
    return jnp.where(i < 0, i ^ 0x7FFFFFFF, i)


def _ikey_to_score(ikey: jnp.ndarray) -> jnp.ndarray:
    i = jnp.where(ikey < 0, ikey ^ 0x7FFFFFFF, ikey)
    return jax.lax.bitcast_convert_type(i, jnp.float32)


def _fast_topk_kernel(
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
    n_easy: int = 4,
    row_scaled: bool = False,
    transposed: bool = False,
    skip_tiles: bool = True,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.full_like(out_i_ref, -1)

    s = _tile_scores(q_ref, c_ref, compute_dtype, transposed)
    if metric == "l2":
        s = 2.0 * s - cn_ref[:]
    elif row_scaled:
        s = s * cn_ref[:]

    qt = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (qt, tile_n), 1)
    valid = (col + j * tile_n) < n_actual
    s = jnp.where(valid, s, NEG_INF)

    ikey = _score_to_ikey(s)
    key = (ikey & ~_COL_MASK) | (tile_n - 1 - col)

    # A tile rarely contributes more than a couple of new top-k entries
    # (E[entries] = k*TILE_N/N per query), so extract only E ranks in the
    # common path and fall back to a full k-rank extraction in the rare
    # tile where some query still has an unextracted improvement.
    n_easy = min(n_easy, k)

    def _extract(keys, count):
        scores, ids = [], []
        for _ in range(count):
            m = jnp.max(keys, axis=1, keepdims=True)
            keys = jnp.where(keys == m, _INT_MIN, keys)
            scores.append(_ikey_to_score(m & ~_COL_MASK))
            ids.append(j * tile_n + (tile_n - 1 - (m & _COL_MASK)))
        return keys, scores, ids

    def _merge_body():
        keys, scores, ids = _extract(key, n_easy)
        cand_s = jnp.concatenate([out_s_ref[:]] + scores, axis=1)
        cand_i = jnp.concatenate([out_i_ref[:]] + ids, axis=1)
        out_s_ref[:], out_i_ref[:] = merge_topk(cand_s, cand_i, k)

        if n_easy < k:
            new_kth = _score_to_ikey(out_s_ref[:, k - 1]) & ~_COL_MASK
            residual = jnp.max(keys) > jnp.min(new_kth)

            @pl.when(residual)
            def _full():
                _, scores2, ids2 = _extract(keys, k)
                cand_s2 = jnp.concatenate([out_s_ref[:]] + scores2, axis=1)
                cand_i2 = jnp.concatenate([out_i_ref[:]] + ids2, axis=1)
                out_s_ref[:], out_i_ref[:] = merge_topk(cand_s2, cand_i2, k)

    if skip_tiles:
        # Skip the whole tile when nothing can enter any query's top-k.
        tile_max = jnp.max(key)
        kth_key = _score_to_ikey(out_s_ref[:, k - 1]) & ~_COL_MASK
        threshold = jnp.min(kth_key)
        pl.when((j == 0) | (tile_max > threshold))(_merge_body)
    else:
        _merge_body()


def _insert_sorted(run_s, run_i, b_s, b_i):
    """Insert one (score, id) per query into a descending-sorted top-k
    list. ~8 small VPU ops vs ~30 for a rank-extraction merge; ties
    prefer the existing entry (earlier tile / lower id)."""
    k = run_s.shape[1]
    ge = run_s >= b_s  # prefix-true over the sorted list
    # Shift-right with a +inf sentinel in slot 0: prev_ge = shift_s >= b_s
    # is then True at slot 0 by construction (Mosaic cannot concat i1
    # vectors, so the predicate is derived from the f32 shift instead).
    big = jnp.full_like(run_s[:, :1], -NEG_INF)
    shift_s = jnp.concatenate([big, run_s[:, : k - 1]], axis=1)
    shift_i = jnp.concatenate([run_i[:, :1], run_i[:, : k - 1]], axis=1)
    prev_ge = shift_s >= b_s
    new_s = jnp.where(ge, run_s, jnp.where(prev_ge, b_s, shift_s))
    new_i = jnp.where(ge, run_i, jnp.where(prev_ge, b_i, shift_i))
    return new_s, new_i


def _fast_insert_topk_kernel(
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
    n_easy: int = 2,
    row_scaled: bool = False,
    transposed: bool = False,
):
    """Packed-key kernel with sorted-insertion merging.

    Identical candidate selection to the fast kernel (n_easy packed-key
    extractions per tile, full-k fallback proven by the residual check),
    but each extracted candidate merges into the running top-k by sorted
    insertion instead of rank re-extraction — the running list stays
    descending-sorted as an invariant, cutting the per-tile small-array
    op count several-fold.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.full_like(out_i_ref, -1)

    s = _tile_scores(q_ref, c_ref, compute_dtype, transposed)
    if metric == "l2":
        s = 2.0 * s - cn_ref[:]
    elif row_scaled:
        s = s * cn_ref[:]

    qt = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (qt, tile_n), 1)
    ikey = _score_to_ikey(s)
    key = (ikey & ~_COL_MASK) | (tile_n - 1 - col)
    if n_actual % tile_n != 0:
        valid = (col + j * tile_n) < n_actual
        key = jnp.where(valid, key, _INT_MIN)

    n_easy = min(n_easy, k)
    run_s = out_s_ref[:]
    run_i = out_i_ref[:]

    keys = key
    for _ in range(n_easy):
        m = jnp.max(keys, axis=1, keepdims=True)
        keys = jnp.where(keys == m, _INT_MIN, keys)
        b_s = _ikey_to_score(m & ~_COL_MASK)
        b_i = j * tile_n + (tile_n - 1 - (m & _COL_MASK))
        run_s, run_i = _insert_sorted(run_s, run_i, b_s, b_i)
    out_s_ref[:] = run_s
    out_i_ref[:] = run_i

    if n_easy < k:
        new_kth = _score_to_ikey(run_s[:, k - 1]) & ~_COL_MASK
        residual = jnp.max(keys) > jnp.min(new_kth)

        @pl.when(residual)
        def _full():
            rs = out_s_ref[:]
            ri = out_i_ref[:]
            ks = keys
            for _ in range(k):
                m = jnp.max(ks, axis=1, keepdims=True)
                ks = jnp.where(ks == m, _INT_MIN, ks)
                b_s = _ikey_to_score(m & ~_COL_MASK)
                b_i = j * tile_n + (tile_n - 1 - (m & _COL_MASK))
                rs, ri = _insert_sorted(rs, ri, b_s, b_i)
            out_s_ref[:] = rs
            out_i_ref[:] = ri


def _fast_group_topk_kernel(
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
    n_easy: int = 4,
    row_scaled: bool = False,
    transposed: bool = False,
    group: int = 16,
):
    """Group-reduced packed-key kernel.

    The plain fast kernel's per-rank extraction scans the full
    (QT, TILE_N) key array (2 VPU passes per rank). Here each tile is
    first reduced to its per-slot top-2 — reshape keys to
    (QT, GROUP, TILE_N/GROUP), one max pass for the best per slot and
    two more for the second best — and ranks are extracted from the
    2*TILE_N/GROUP-wide reduced array instead (GROUP/2 x cheaper per
    rank). Exactness of the returned top-k set at key precision is
    preserved by a residual proof: every element outside the reduced
    array is bounded by its slot's second-best, so if
    max(unextracted reduced ∪ r2) < every query's new kth key, no
    hidden element can alter any top-k; otherwise the rare tile falls
    back to full k-rank extraction over the raw keys.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.full_like(out_i_ref, -1)

    s = _tile_scores(q_ref, c_ref, compute_dtype, transposed)
    if metric == "l2":
        s = 2.0 * s - cn_ref[:]
    elif row_scaled:
        s = s * cn_ref[:]

    qt = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (qt, tile_n), 1)
    ikey = _score_to_ikey(s)
    key = (ikey & ~_COL_MASK) | (tile_n - 1 - col)
    # Pad rows exist only when N is not a tile multiple; the mask fuses
    # with the key pack and is skipped entirely for aligned corpora.
    if n_actual % tile_n != 0:
        valid = (col + j * tile_n) < n_actual
        key = jnp.where(valid, key, _INT_MIN)

    c_slots = tile_n // group
    keys3 = key.reshape(qt, group, c_slots)
    r1 = jnp.max(keys3, axis=1)  # (qt, C) best per slot
    masked3 = jnp.where(keys3 == r1[:, None, :], _INT_MIN, keys3)
    r2 = jnp.max(masked3, axis=1)  # (qt, C) second best per slot
    reduced = jnp.concatenate([r1, r2], axis=1)  # (qt, 2C)

    n_easy = min(n_easy, k)

    def _extract(keys, count):
        scores, ids = [], []
        for _ in range(count):
            m = jnp.max(keys, axis=1, keepdims=True)
            keys = jnp.where(keys == m, _INT_MIN, keys)
            scores.append(_ikey_to_score(m & ~_COL_MASK))
            ids.append(j * tile_n + (tile_n - 1 - (m & _COL_MASK)))
        return keys, scores, ids

    run_s = out_s_ref[:]  # pre-merge running state (for the fallback)
    run_i = out_i_ref[:]
    remaining, scores, ids = _extract(reduced, n_easy)
    cand_s = jnp.concatenate([run_s] + scores, axis=1)
    cand_i = jnp.concatenate([run_i] + ids, axis=1)
    new_s, new_i = merge_topk(cand_s, cand_i, k)
    out_s_ref[:] = new_s
    out_i_ref[:] = new_i

    # Residual proof: unseen elements are bounded by max(remaining, r2).
    new_kth = _score_to_ikey(new_s[:, k - 1]) & ~_COL_MASK
    bound = jnp.maximum(jnp.max(remaining), jnp.max(r2))
    residual = bound > jnp.min(new_kth)

    @pl.when(residual)
    def _full():
        # The raw-key extraction re-finds the n_easy winners, so merge
        # against the PRE-merge running state to avoid duplicate ids.
        _, scores2, ids2 = _extract(key, k)
        cand_s2 = jnp.concatenate([run_s] + scores2, axis=1)
        cand_i2 = jnp.concatenate([run_i] + ids2, axis=1)
        out_s_ref[:], out_i_ref[:] = merge_topk(cand_s2, cand_i2, k)


def _max_only_kernel(
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
    n_easy: int = 0,
    row_scaled: bool = False,
    transposed: bool = False,
):
    """DIAGNOSTIC ONLY: matmul + running per-query max (one VPU pass per
    tile, no top-k merge). Measures the kernel's compute/stream floor so
    merge overhead can be attributed. Results are not valid top-k."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.full_like(out_i_ref, -1)

    s = _tile_scores(q_ref, c_ref, compute_dtype, transposed)
    if metric == "l2":
        s = 2.0 * s - cn_ref[:]
    m = jnp.max(s, axis=1, keepdims=True)
    out_s_ref[:] = jnp.maximum(
        out_s_ref[:], jnp.broadcast_to(m, out_s_ref.shape)
    )


def flat_topk_pallas(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    metric: str = "dot",
    corpus_sqnorm: Optional[jnp.ndarray] = None,
    corpus_scale: Optional[jnp.ndarray] = None,
    tile_n: int = 1024,
    tile_q: int = 128,
    compute_dtype: jnp.dtype = jnp.float32,
    mode: str = "exact",
    n_easy: int = 4,
    interpret: bool = False,
    corpus_transposed: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused search over an HBM-resident corpus.

    Returns (scores, indices), each (Q, k). For ``l2`` the scores are squared
    distances ascending; for ``dot`` raw inner products descending.

    corpus_scale: (N,) per-row dequantization scales for int8 corpora
    (dot metric only); scores are scale_n * <q, c_int8[n]>.

    corpus_transposed: corpus is stored (d, N) so each tile feeds the MXU
    as a plain (QT, d) x (d, TN) matmul — the (N, d) layout contracts
    dim 1 of both operands, which inserts a corpus-tile transpose on the
    critical path.
    """
    n_q, d = queries.shape
    if corpus_transposed:
        dc, n = corpus.shape
    else:
        n, dc = corpus.shape
    assert d == dc, (d, dc)
    assert k >= 1
    tile_n = min(tile_n, _round_up(n, 128))
    tile_q = min(tile_q, _round_up(n_q, 8))
    assert mode == "maxonly" or tile_n <= 1 << _COL_BITS, (
        f"tile_n={tile_n} exceeds the {_COL_BITS}-bit packed-column budget"
    )

    d_pad = _round_up(d, 128)
    q_pad = _round_up(n_q, tile_q)
    n_pad = _round_up(n, tile_n)

    q = _pad_to(_pad_to(queries, d_pad, 1), q_pad, 0)
    if corpus_transposed:
        c = _pad_to(_pad_to(corpus, d_pad, 0), n_pad, 1)
    else:
        c = _pad_to(_pad_to(corpus, d_pad, 1), n_pad, 0)

    row_scaled = corpus_scale is not None
    if metric == "l2":
        assert not row_scaled, "int8 row scales support dot/cosine only"
        if corpus_sqnorm is None:
            corpus_sqnorm = jnp.sum(
                corpus.astype(jnp.float32) * corpus.astype(jnp.float32),
                axis=0 if corpus_transposed else -1,
            )
        cn = _pad_to(corpus_sqnorm.astype(jnp.float32)[None, :], n_pad, 1)
    elif row_scaled:
        cn = _pad_to(corpus_scale.astype(jnp.float32)[None, :], n_pad, 1)
    else:
        cn = jnp.zeros((1, n_pad), jnp.float32)

    grid = (q_pad // tile_q, n_pad // tile_n)

    if mode in ("exact", "exactns"):
        kernel_fn = _topk_kernel
    elif mode == "maxonly":  # diagnostic floor, not valid top-k
        kernel_fn = _max_only_kernel
    elif mode == "fastg":  # group-reduced extraction
        kernel_fn = _fast_group_topk_kernel
    elif mode == "fasti":  # sorted-insertion merging
        kernel_fn = _fast_insert_topk_kernel
    else:
        kernel_fn = _fast_topk_kernel
    kwargs = {
        "row_scaled": row_scaled,
        "transposed": corpus_transposed,
        "n_easy": n_easy,
    }
    if mode in ("fastns", "exactns"):  # without the per-tile skip branch
        kwargs["skip_tiles"] = False
    elif mode in ("fast", "exact") and tile_q >= 128:
        # The skip predicate depends on the revisited output block, so
        # it serializes the pipeline; at large query tiles the min-over-
        # queries threshold almost never skips anyway (measured: skip ON
        # costs ~8% at tile_q=256, saves ~20% at tile_q=8).
        kwargs["skip_tiles"] = False
    if mode in ("maxonly", "fastg", "fasti"):
        kwargs.pop("skip_tiles", None)
    kernel = functools.partial(
        kernel_fn,
        k=k,
        n_actual=n,
        tile_n=tile_n,
        metric=metric,
        compute_dtype=compute_dtype,
        **kwargs,
    )

    c_spec = (
        pl.BlockSpec((d_pad, tile_n), lambda i, j: (0, j))
        if corpus_transposed
        else pl.BlockSpec((tile_n, d_pad), lambda i, j: (j, 0))
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, d_pad), lambda i, j: (i, 0)),
            c_spec,
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "tile_n", "tile_q", "compute_dtype", "mode",
        "n_easy", "interpret",
    ),
)
def _flat_topk_pallas_jit(
    queries, corpus, corpus_sqnorm, corpus_scale, *,
    k, metric, tile_n, tile_q, compute_dtype, mode, n_easy, interpret,
):
    """One-dispatch wrapper: eager calls would run the pad/layout ops
    around the pallas_call as separate device computations (a full
    corpus copy per search when N is not a tile multiple) — ruinous on
    relay-attached devices."""
    return flat_topk_pallas(
        queries, corpus, k,
        metric=metric, corpus_sqnorm=corpus_sqnorm,
        corpus_scale=corpus_scale, tile_n=tile_n, tile_q=tile_q,
        compute_dtype=compute_dtype, mode=mode, n_easy=n_easy,
        interpret=interpret,
    )


def flat_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    metric: str = "dot",
    corpus_sqnorm: Optional[jnp.ndarray] = None,
    corpus_scale: Optional[jnp.ndarray] = None,
    use_pallas: Optional[bool] = None,
    tile_n: int = 1024,
    tile_q: int = 128,
    compute_dtype: jnp.dtype = jnp.float32,
    mode: str = "exact",
    exact_materialize_budget: int = 256 * 1024 * 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatching entry point: Pallas on TPU, pure-JAX elsewhere.

    mode="exact" reproduces FAISS bit-exactly; mode="fast" uses the
    packed-key kernel (scores quantized to 21 bits, ~1e-6 relative).

    Exact-mode regime choice (measured on v5e, batch 512 x 100k x 384):
    XLA's materialized matmul+top_k runs the f32 HIGHEST contraction
    ~25% faster than the Pallas exact kernel, but needs Q*N*4 bytes of
    HBM for the score matrix. The dispatcher materializes when that
    fits `exact_materialize_budget` and streams through the Pallas
    kernel otherwise (large N or large batches), so callers always get
    the faster exact path without an HBM blowup.
    """
    k = min(k, corpus.shape[0])
    if use_pallas is None:
        use_pallas = _backend() == "tpu"
    if k > 128:
        # the fused kernels unroll k extraction steps; for large k the
        # materialized reference path is both faster and safer on VMEM
        use_pallas = False
    if (
        mode == "exact"
        and use_pallas
        and corpus_scale is None
        and queries.shape[0] * corpus.shape[0] * 4
        <= exact_materialize_budget
    ):
        return flat_topk_ref(
            queries, corpus, k, metric=metric, compute_dtype=compute_dtype
        )
    if use_pallas:
        return _flat_topk_pallas_jit(
            queries,
            corpus,
            corpus_sqnorm,
            corpus_scale,
            k=k,
            metric=metric,
            tile_n=tile_n,
            tile_q=tile_q,
            compute_dtype=jnp.dtype(compute_dtype).name,
            mode=mode,
            n_easy=4,
            interpret=_backend() != "tpu",
        )
    return flat_topk_ref(
        queries, corpus, k, metric=metric, corpus_scale=corpus_scale
    )
