"""Shared running-top-k merge used inside Pallas kernels.

Candidates must be ordered [previous best (rank order), new candidates in
ascending index order]; extraction picks the LOWEST position among tied
maxima (`_first_max_pos` — an explicit reduction: Mosaic's argmax is NOT
tie-deterministic on hardware), giving lower-index-first tie-breaking
(FAISS flat-search semantics).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -3.0e38  # plain float: jnp scalars become captured consts in Pallas


def _first_max_pos(x: jnp.ndarray, best: jnp.ndarray,
                   pos: jnp.ndarray) -> jnp.ndarray:
    """Lowest position attaining the row max, (rows, 1).

    jnp.argmax is NOT tie-safe inside Pallas on TPU: Mosaic's lowering
    returns an arbitrary occurrence on ties (chip micro-probe: col 700
    of maxima {5, 700}, col 127 on an all-equal row — DESIGN.md round-4
    notes), silently breaking the documented lowest-id-first tie order
    at exactly-equal scores (duplicate documents, quantized weights,
    shared single-term matches). CPU interpret follows the jnp
    first-occurrence spec, so tests never saw it. An explicit
    min-over-tied-positions reduction is deterministic on every
    backend at the same VPU pass cost."""
    return jnp.min(jnp.where(x == best, pos, 2 ** 30), axis=1)[:, None]


def merge_topk(
    cand_s: jnp.ndarray, cand_i: jnp.ndarray, k: int,
    force_loop: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Extract the k best (score, index) pairs from each row of candidates.

    cand_s, cand_i: (rows, width). Returns ((rows, k), (rows, k)).
    k-step iterative max-extraction: k is small (<=128), so this stays on
    the VPU with no sort network. force_loop picks the fori-based merge
    below the k=32 unroll threshold — the unroll's ~k live (rows, width)
    copies VMEM-OOM on real hardware at wide rows*width even for k in
    the 17..32 range (measured: k=32 over (512, 928) f32 needs 27.5MB
    of the 16MB scoped budget; invisible to CPU interpret tests).
    """
    rows, width = cand_s.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    if k <= 32 and not force_loop:
        # unrolled extraction: fastest on the VPU for the common small-k
        # serving path
        new_s = []
        new_i = []
        for _ in range(k):
            best = jnp.max(cand_s, axis=1, keepdims=True)
            am = _first_max_pos(cand_s, best, pos)
            onehot = pos == am
            chosen = jnp.sum(
                jnp.where(onehot, cand_i, 0), axis=1, keepdims=True
            )
            new_s.append(best)
            new_i.append(chosen)
            cand_s = jnp.where(onehot, NEG_INF, cand_s)
        return jnp.concatenate(new_s, axis=1), jnp.concatenate(new_i, axis=1)

    # Large k (the int8 tier's over-retrieve runs k_scan~100): the
    # unroll keeps ~k live (rows, width) copies on the Mosaic VMEM stack
    # and overflows the 16MB scoped limit; a fori_loop with carried
    # buffers keeps the stack flat at identical per-step semantics
    # (argmax first-occurrence = lower candidate position on ties).
    kpos = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 1)

    def body(t, carry):
        cs, out_s, out_i = carry
        best = jnp.max(cs, axis=1, keepdims=True)
        am = _first_max_pos(cs, best, pos)
        onehot = pos == am
        chosen = jnp.sum(jnp.where(onehot, cand_i, 0), axis=1, keepdims=True)
        write = kpos == t
        out_s = jnp.where(write, best, out_s)
        out_i = jnp.where(write, chosen, out_i)
        return jnp.where(onehot, NEG_INF, cs), out_s, out_i

    _, out_s, out_i = jax.lax.fori_loop(
        0,
        k,
        body,
        (
            cand_s,
            jnp.full((rows, k), NEG_INF, cand_s.dtype),
            jnp.full((rows, k), -1, cand_i.dtype),
        ),
    )
    return out_s, out_i


def tile_topk_iota(
    scores: jnp.ndarray, k: int, id_offset, force_loop: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tile top-k where candidate ids ARE the column iota + offset.

    Running-merge kernels used to concatenate the (rows, k) carry onto
    the fresh (rows, tile_n) scores and merge_topk the lot: 5 VPU
    passes per rank (max, argmax, onehot, id-gather sum, mask) over a
    lane-MISALIGNED (rows, k + tile_n) array — measured ~4-6 ms per
    rank at 1M x 512 in the union kernels, dominating their runtime.
    When candidate ids are just column + offset, the id-gather pass is
    pure arithmetic on the argmax (no onehot+sum), and extraction runs
    on the aligned (rows, tile_n) scores; the cross-tile merge then
    only touches (rows, 2k). _first_max_pos picks the lowest tied
    position, preserving lowest-col-first tie order. id_offset may be
    traced.
    """
    rows, width = scores.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    if k <= 32 and not force_loop:
        out_s = []
        out_i = []
        for _ in range(k):
            best = jnp.max(scores, axis=1, keepdims=True)
            am = _first_max_pos(scores, best, pos)
            out_s.append(best)
            out_i.append(am + id_offset)
            scores = jnp.where(pos == am, NEG_INF, scores)
        return (
            jnp.concatenate(out_s, axis=1),
            jnp.concatenate(out_i, axis=1).astype(jnp.int32),
        )

    kpos = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 1)

    def body(t, carry):
        cs, o_s, o_i = carry
        best = jnp.max(cs, axis=1, keepdims=True)
        am = _first_max_pos(cs, best, pos)
        write = kpos == t
        o_s = jnp.where(write, best, o_s)
        o_i = jnp.where(write, am + id_offset, o_i)
        return jnp.where(pos == am, NEG_INF, cs), o_s, o_i

    _, out_s, out_i = jax.lax.fori_loop(
        0,
        k,
        body,
        (
            scores,
            jnp.full((rows, k), NEG_INF, scores.dtype),
            jnp.full((rows, k), -1, jnp.int32),
        ),
    )
    return out_s, out_i.astype(jnp.int32)
