"""Lexical (BM25 / TF-IDF) scoring as a padded sparse match-accumulate kernel.

Replaces the reference's rank_bm25 `BM25Okapi.get_scores` NumPy scan and
scikit-learn's sparse TF-IDF cosine (reference: src/retrieval.py:117-172)
with a TPU-native formulation.

Representation (built host-side by persian_rag_tpu.index.lexical):

* The corpus is doc-major padded-ELL: ``doc_ids (N, L) int32`` holds each
  document's unique term ids (-1 padding) and ``doc_vals (N, L) float32``
  holds the *fully precomputed* per-(doc, term) score contribution:
    - BM25:   idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    - TF-IDF: l2-normalized tf-idf weight
* A query is ``q_ids (B, T) int32`` (-1 padding) and ``q_vals (B, T)``
  (BM25: token multiplicity; TF-IDF: l2-normalized query weight).

Then for both methods
    scores[b, n] = sum_t q_vals[b,t] * sum_l [doc_ids[n,l] == q_ids[b,t]]
                                             * doc_vals[n,l]

which is branch-free, gather-free, static-shape VPU work: TPUs dislike
scatter/gather, so the "inverted index" is replaced by an equality-match
dense scan tiled over corpus rows. The fused variant keeps a running
top-k per query so the (B, N) score matrix never hits HBM.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from persian_rag_tpu.ops._merge import NEG_INF, merge_topk, tile_topk_iota


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _exact_split_dot(qw, d, scores):
    """3-pass exact-split contraction for bf16-EXACT query weights:
    split only D into three bf16 terms (8+8+8 mantissa bits >= f32's
    24, an exact decomposition). Every product exact, f32 accumulation
    — the same arithmetic class as HIGHEST at half the MXU passes."""
    qw16 = qw.astype(jnp.bfloat16)
    dh = d.astype(jnp.bfloat16)
    r1 = d - dh.astype(jnp.float32)
    dm = r1.astype(jnp.bfloat16)
    dl = (r1 - dm.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    return (
        scores
        + jax.lax.dot_general(
            qw16, dh, dn, preferred_element_type=jnp.float32
        )
        + jax.lax.dot_general(
            qw16, dm, dn, preferred_element_type=jnp.float32
        )
        + jax.lax.dot_general(
            qw16, dl, dn, preferred_element_type=jnp.float32
        )
    )


def _pad_axis(x: jnp.ndarray, size: int, axis: int, value) -> jnp.ndarray:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# ---------------------------------------------------------------------------
# Pure-JAX reference.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=())
def sparse_scores_ref(
    doc_ids: jnp.ndarray,
    doc_vals: jnp.ndarray,
    q_ids: jnp.ndarray,
    q_vals: jnp.ndarray,
) -> jnp.ndarray:
    """Dense (B, N) lexical scores; reference for parity tests."""

    def per_term(carry, qt):
        qid, qval = qt  # (B,), (B,)
        match = doc_ids[None, :, :] == qid[:, None, None]  # (B, N, L)
        contrib = jnp.sum(
            jnp.where(match, doc_vals[None, :, :], 0.0), axis=-1
        )  # (B, N)
        return carry + qval[:, None] * contrib, None

    init = jnp.zeros((q_ids.shape[0], doc_ids.shape[0]), jnp.float32)
    out, _ = jax.lax.scan(per_term, init, (q_ids.T, q_vals.T))
    return out


# ---------------------------------------------------------------------------
# Pallas kernels.
# ---------------------------------------------------------------------------


def _score_tile(doc_ids, doc_vals, q_ids_ref, q_vals_ref, b, t):
    """(B, TN) scores for one corpus tile, docs in TRANSPOSED ELL layout
    ``doc_ids/doc_vals (L, TN)``.

    With term slots on the sublane axis, L pads to a multiple of 8
    instead of 128 (the doc-major layout wasted up to 2x VPU work and
    VMEM on lane padding: L=64 -> 128). fori_loop over query-term slots
    (not a Python unroll) so Mosaic allocates the (B, L, TN) match
    intermediate once, keeping VMEM footprint independent of T.
    """
    tn = doc_ids.shape[1]
    q_ids = q_ids_ref[:]
    q_vals = q_vals_ref[:]
    slot = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)

    def body(ti, scores):
        # One-hot select slot ti (Mosaic forbids dynamic lane indexing;
        # a masked reduction over the small T dim is free on the VPU).
        # Padded slots are harmless either way: query pad vals are 0 and
        # doc pad vals are 0, so any spurious id match contributes 0.
        sel = slot == ti
        qid = jnp.sum(jnp.where(sel, q_ids, 0), axis=1, keepdims=True)
        qval = jnp.sum(jnp.where(sel, q_vals, 0.0), axis=1, keepdims=True)
        match = doc_ids[None, :, :] == qid[:, :, None]  # (B, L, TN)
        contrib = jnp.sum(jnp.where(match, doc_vals[None, :, :], 0.0), axis=1)
        return scores + qval * contrib

    return jax.lax.fori_loop(0, t, body, jnp.zeros((b, tn), jnp.float32))


def _sparse_topk_kernel(
    q_ids_ref,
    q_vals_ref,
    doc_ids_ref,
    doc_vals_ref,
    out_s_ref,
    out_i_ref,
    *,
    k: int,
    n_actual: int,
    tile_n: int,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.full_like(out_i_ref, -1)

    b, t = q_ids_ref.shape
    scores = _score_tile(
        doc_ids_ref[:], doc_vals_ref[:], q_ids_ref, q_vals_ref, b, t
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1) + j * tile_n
    scores = jnp.where(col < n_actual, scores, NEG_INF)

    cand_s = jnp.concatenate([out_s_ref[:], scores], axis=1)
    cand_i = jnp.concatenate([out_i_ref[:], col], axis=1)
    out_s_ref[:], out_i_ref[:] = merge_topk(cand_s, cand_i, k)


def sparse_topk_pallas(
    doc_ids: jnp.ndarray,
    doc_vals: jnp.ndarray,
    q_ids: jnp.ndarray,
    q_vals: jnp.ndarray,
    k: int,
    tile_n: int = 2048,
    tile_b: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused lexical scores + top-k. Returns ((B, k) scores, (B, k) ids).

    Grid is (query tiles, corpus tiles): the per-tile match intermediate
    is (tile_b, L, tile_n), so VMEM use is independent of the batch size
    (the previous single-axis grid put the whole batch in one block and
    stopped compiling around B~512). Docs stream in transposed ELL
    (L, N) blocks; each query tile's running top-k stays resident across
    the inner corpus-tile loop.
    """
    n, el = doc_ids.shape
    b, t = q_ids.shape
    el_pad = _round_up(el, 8)
    # Scale tile_n down as the ELL widens: the (tile_b, el_pad, tile_n)
    # f32 match intermediate plus the two (el_pad, tile_n) doc blocks
    # must fit scoped VMEM. Budget ~4MB for the intermediate: fine for
    # BM25 (L<=128) at the 2048 default, but TF-IDF (1,2)-gram buckets
    # reach L~1024 and would need 64MB per block without this cap.
    budget = 4 * 1024 * 1024 // (tile_b * el_pad * 4)
    tile_n = min(tile_n, max(128, (budget // 128) * 128))
    tile_n = min(tile_n, _round_up(n, 128))
    n_pad = _round_up(n, tile_n)
    b_pad = _round_up(b, tile_b)

    # transpose to (L, N): term slots ride sublanes (pad-8), docs lanes
    doc_ids_t = _pad_axis(
        _pad_axis(doc_ids, el_pad, 1, -1), n_pad, 0, -1
    ).T
    doc_vals_t = _pad_axis(
        _pad_axis(doc_vals, el_pad, 1, 0.0), n_pad, 0, 0.0
    ).T
    t_pad = _round_up(t, 8)
    q_ids_p = _pad_axis(_pad_axis(q_ids, t_pad, 1, -2), b_pad, 0, -2)
    q_vals_p = _pad_axis(_pad_axis(q_vals, t_pad, 1, 0.0), b_pad, 0, 0.0)

    kernel = functools.partial(
        _sparse_topk_kernel, k=k, n_actual=n, tile_n=tile_n
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(b_pad // tile_b, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec((tile_b, t_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_b, t_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((el_pad, tile_n), lambda i, j: (0, j)),
            pl.BlockSpec((el_pad, tile_n), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, k), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_b, k), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * el_pad * t_pad,
            bytes_accessed=(b_pad // tile_b) * n_pad * el_pad * 8
            + b_pad * t_pad * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_ids_p, q_vals_p, doc_ids_t, doc_vals_t)
    return out_s[:b], out_i[:b]


def sparse_scores(
    doc_ids: jnp.ndarray,
    doc_vals: jnp.ndarray,
    q_ids: jnp.ndarray,
    q_vals: jnp.ndarray,
) -> jnp.ndarray:
    """Dense (B, N) lexical scores (jitted; XLA fuses the scan)."""
    return sparse_scores_ref(doc_ids, doc_vals, q_ids, q_vals)


# ---------------------------------------------------------------------------
# Hashed-segment ELL: per-term matching touches L/S rows instead of L.
#
# The plain kernel's per-query-term match scans ALL L term slots of every
# doc — measured pure-VPU-bound (tile_b sweep: constant 59 ms at 200k
# regardless of HBM stream). Here each doc's terms are partitioned into
# S segments by hash (tid % S) at build time; a query term can only
# match inside segment (qid % S), which the kernel loads by DYNAMIC
# indexing on the leading (untiled) block dimension — the one dynamic
# index Mosaic supports without relayout. Per-term work drops from
# B*L*TN to B*Ls*TN where Ls = padded max segment height (~L/S for
# balanced hashing).
# ---------------------------------------------------------------------------


def hash_segments(
    per_doc_ids: jnp.ndarray,
    per_doc_vals: jnp.ndarray,
    n_segments: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Host-side repack of an (N, L) ELL into (N, S, Ls) hashed-segment
    form (NumPy; build-time only). Segment g of a doc holds its terms
    with tid % S == g, -1/0 padded to the corpus-wide max segment
    height (padded to a multiple of 8)."""
    import numpy as np

    ids = np.asarray(per_doc_ids)
    vals = np.asarray(per_doc_vals)
    n, el = ids.shape
    seg_of = np.where(ids >= 0, ids % n_segments, -1)
    # per-(doc, segment) counts -> corpus-wide max height
    counts = np.zeros((n, n_segments), np.int64)
    for g in range(n_segments):
        counts[:, g] = (seg_of == g).sum(axis=1)
    ls = max(1, int(counts.max()))
    ls = ((ls + 7) // 8) * 8
    out_ids = np.full((n, n_segments, ls), -1, np.int32)
    out_vals = np.zeros((n, n_segments, ls), np.float32)
    # stable fill: for each segment, order of appearance in the ELL row
    doc_idx, slot_idx = np.nonzero(ids >= 0)
    segs = seg_of[doc_idx, slot_idx]
    # position within (doc, segment): cumulative count in appearance order
    order = np.lexsort((slot_idx, segs, doc_idx))
    d_o, s_o, g_o = doc_idx[order], slot_idx[order], segs[order]
    pos = np.zeros(len(order), np.int64)
    if len(order):
        new_group = np.ones(len(order), bool)
        new_group[1:] = (d_o[1:] != d_o[:-1]) | (g_o[1:] != g_o[:-1])
        starts = np.nonzero(new_group)[0]
        pos = np.arange(len(order)) - np.repeat(
            starts, np.diff(np.append(starts, len(order)))
        )
    out_ids[d_o, g_o, pos] = ids[d_o, s_o]
    out_vals[d_o, g_o, pos] = vals[d_o, s_o]
    return out_ids, out_vals


def _hashed_score_tile(
    doc_ids_ref, doc_vals_ref, q_ids_ref, q_vals_ref, b, t, n_segments
):
    """(B, TN) scores for one corpus tile in hashed-segment transposed
    layout ``doc_ids/doc_vals (S, Ls, TN)``.

    q_ids/q_vals live in SMEM, so each (row, slot) scalar reads with
    dynamic indices; the segment for a term loads by dynamic indexing
    the LEADING (untiled) block dimension — the one dynamic index form
    Mosaic supports without relayout. Loop structure: outer fori over
    the tile_b query rows, inner fori over T term slots accumulating a
    (1, TN) row score, then one one-hot merge into the (B, TN) tile
    scores per row (not per term)."""
    tn = doc_ids_ref.shape[2]

    def row_body(bi, scores):
        def term_body(ti, row_acc):
            rid = q_ids_ref[bi, ti]
            rval = q_vals_ref[bi, ti]
            g = jnp.where(rid >= 0, rid % n_segments, 0)
            seg_ids = doc_ids_ref[g]   # (Ls, TN)
            seg_vals = doc_vals_ref[g]
            contrib = jnp.sum(
                jnp.where(seg_ids == rid, seg_vals, 0.0),
                axis=0,
                keepdims=True,
            )                           # (1, TN)
            return row_acc + rval * contrib

        row = jax.lax.fori_loop(
            0, t, term_body, jnp.zeros((1, tn), jnp.float32)
        )
        onehot = jax.lax.broadcasted_iota(jnp.int32, (b, tn), 0) == bi
        return scores + jnp.where(onehot, row, 0.0)

    return jax.lax.fori_loop(
        0, b, row_body, jnp.zeros((b, tn), jnp.float32)
    )


def _sparse_topk_hashed_kernel(
    q_ids_ref,
    q_vals_ref,
    doc_ids_ref,
    doc_vals_ref,
    out_s_ref,
    out_i_ref,
    *,
    k: int,
    n_actual: int,
    tile_n: int,
    n_segments: int,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.full_like(out_i_ref, -1)

    b, t = q_ids_ref.shape
    scores = _hashed_score_tile(
        doc_ids_ref, doc_vals_ref, q_ids_ref, q_vals_ref, b, t, n_segments
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1) + j * tile_n
    scores = jnp.where(col < n_actual, scores, NEG_INF)

    cand_s = jnp.concatenate([out_s_ref[:], scores], axis=1)
    cand_i = jnp.concatenate([out_i_ref[:], col], axis=1)
    out_s_ref[:], out_i_ref[:] = merge_topk(cand_s, cand_i, k)


def sparse_topk_hashed_pallas(
    doc_ids3: jnp.ndarray,
    doc_vals3: jnp.ndarray,
    q_ids: jnp.ndarray,
    q_vals: jnp.ndarray,
    k: int,
    tile_n: int = 2048,
    tile_b: int = 32,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused lexical top-k over an (N, S, Ls) hashed-segment corpus.
    Returns ((B, k) scores, (B, k) ids), identical values to the flat
    ELL kernel (segments merely partition the same (tid, val) entries).
    """
    from jax.experimental.pallas import tpu as pltpu

    n, s, ls = doc_ids3.shape
    b, t = q_ids.shape
    tile_n = min(tile_n, _round_up(n, 128))
    n_pad = _round_up(n, tile_n)
    b_pad = _round_up(b, tile_b)

    # (N, S, Ls) -> (S, Ls, N): segments lead (untiled, dynamically
    # indexable), term slots ride sublanes, docs ride lanes.
    doc_ids_t = jnp.transpose(
        _pad_axis(doc_ids3, n_pad, 0, -1), (1, 2, 0)
    )
    doc_vals_t = jnp.transpose(
        _pad_axis(doc_vals3, n_pad, 0, 0.0), (1, 2, 0)
    )
    q_ids_p = _pad_axis(q_ids, b_pad, 0, -2)
    q_vals_p = _pad_axis(q_vals, b_pad, 0, 0.0)

    kernel = functools.partial(
        _sparse_topk_hashed_kernel,
        k=k,
        n_actual=n,
        tile_n=tile_n,
        n_segments=s,
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(b_pad // tile_b, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec(
                (tile_b, t), lambda i, j: (i, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (tile_b, t), lambda i, j: (i, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((s, ls, tile_n), lambda i, j: (0, 0, j)),
            pl.BlockSpec((s, ls, tile_n), lambda i, j: (0, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, k), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_b, k), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * ls * t,
            bytes_accessed=(b_pad // tile_b) * n_pad * s * ls * 8
            + b_pad * t * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_ids_p, q_vals_p, doc_ids_t, doc_vals_t)
    return out_s[:b], out_i[:b]


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "tile_b", "interpret")
)
def _sparse_topk_hashed_jit(
    doc_ids3, doc_vals3, q_ids, q_vals, k, tile_n, tile_b, interpret
):
    return sparse_topk_hashed_pallas(
        doc_ids3, doc_vals3, q_ids, q_vals, k, tile_n=tile_n,
        tile_b=tile_b, interpret=interpret,
    )


def sparse_topk_hashed(
    doc_ids3: jnp.ndarray,
    doc_vals3: jnp.ndarray,
    q_ids: jnp.ndarray,
    q_vals: jnp.ndarray,
    k: int,
    use_pallas: Optional[bool] = None,
    tile_n: int = 2048,
    tile_b: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatching entry for the hashed-segment layout; the non-Pallas
    path flattens segments back to an (N, S*Ls) ELL for the reference
    scorer (identical scores — segments partition the same entries)."""
    k = min(k, doc_ids3.shape[0])
    backend = jax.default_backend()
    if use_pallas is None:
        use_pallas = backend == "tpu"
    if use_pallas:
        return _sparse_topk_hashed_jit(
            doc_ids3, doc_vals3, q_ids, q_vals, k, tile_n, tile_b,
            backend != "tpu",
        )
    n, s, ls = doc_ids3.shape
    flat_ids = doc_ids3.reshape(n, s * ls)
    flat_vals = doc_vals3.reshape(n, s * ls)
    scores = sparse_scores_ref(flat_ids, flat_vals, q_ids, q_vals)
    top_s, top_i = jax.lax.top_k(scores, k)
    return top_s, top_i.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "interpret")
)
def _sparse_topk_jit(doc_ids, doc_vals, q_ids, q_vals, k, tile_n, interpret):
    """One-dispatch wrapper: without jit, the padding/layout ops around
    the pallas_call execute eagerly as separate device computations —
    ruinous on relay-attached devices (each dispatch pays transfer
    latency, and doc-array pads copy the whole index)."""
    return sparse_topk_pallas(
        doc_ids, doc_vals, q_ids, q_vals, k, tile_n=tile_n,
        interpret=interpret,
    )


def sparse_topk(
    doc_ids: jnp.ndarray,
    doc_vals: jnp.ndarray,
    q_ids: jnp.ndarray,
    q_vals: jnp.ndarray,
    k: int,
    use_pallas: Optional[bool] = None,
    tile_n: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    k = min(k, doc_ids.shape[0])
    backend = jax.default_backend()
    if use_pallas is None:
        use_pallas = backend == "tpu"
    if use_pallas:
        return _sparse_topk_jit(
            doc_ids, doc_vals, q_ids, q_vals, k, tile_n, backend != "tpu"
        )
    scores = sparse_scores_ref(doc_ids, doc_vals, q_ids, q_vals)
    top_s, top_i = jax.lax.top_k(scores, k)
    return top_s, top_i.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Union-slot (batch-deduplicated) kernel.
#
# The flat kernel's match work scales with the QUERY BATCH: every corpus
# ELL slot is compared against all B*T query term slots (fori over T per
# tile_b rows). But a 512-query batch of natural-language queries shares
# vocabulary heavily — the UNION of its terms is typically ~1-2k ids,
# not B*T = 4096. Here the batch's terms are deduplicated into U union
# slots once per dispatch (pure-JAX prep, same jit), each corpus tile
# builds a dense contribution matrix D (U, TN) with U*L*TN compare work
# (independent of B), and the per-query accumulation
#     scores (B, TN) = Qw (B, U) @ D (U, TN)
# rides the MXU, which the lexical path never used. Win factor over the
# flat kernel's VPU match ~ B*T / U_padded, growing with batch size.
# The union chunk loop is bounded by a RUNTIME scalar (SMEM), so work
# tracks the batch's actual unique-term count, not the static worst
# case. Reference semantics unchanged: rank_bm25 get_scores / sklearn
# TF-IDF (reference src/retrieval.py:117-172).
# ---------------------------------------------------------------------------


def union_prep(
    q_ids: jnp.ndarray,
    q_vals: jnp.ndarray,
    u_chunk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deduplicate a (B, T) query batch into union-term form. Pure JAX
    (jit-safe; runs in the same dispatch as the kernel).

    Returns:
      u_ids   (NC, UC, 1) int32 — union term ids, -2 padded, chunked;
      qw      (NC, B, UC) f32   — per-query weight of each union term
                                  (within-query duplicate ids sum — the
                                  score is linear in the query weight);
      n_chunks () int32         — number of chunks actually populated.

    NC * UC = u_cap = B*T rounded up to u_chunk, so overflow is
    impossible by construction; only the first n_chunks chunks hold
    real terms and the kernel never touches the rest.
    """
    b, t = q_ids.shape
    m = b * t
    u_cap = _round_up(max(m, u_chunk), u_chunk)
    nc_max = u_cap // u_chunk

    flat = q_ids.reshape(-1)
    fval = q_vals.reshape(-1)
    valid = flat >= 0
    big = jnp.int32(2**31 - 1)
    order = jnp.argsort(jnp.where(valid, flat, big))
    s = jnp.where(valid, flat, big)[order]
    sval = valid[order]  # valid entries sort first (ids < big)
    first = jnp.concatenate([sval[:1], (s[1:] != s[:-1]) & sval[1:]])
    slot_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_union = jnp.sum(first.astype(jnp.int32))

    u_ids = (
        jnp.full((u_cap,), -2, jnp.int32)
        .at[jnp.where(sval, slot_sorted, u_cap)]
        .set(jnp.where(sval, s, -2), mode="drop")
    )
    # per-element slot in original (b*t) order
    slot_flat = jnp.zeros((m,), jnp.int32).at[order].set(slot_sorted)
    rows = jnp.arange(m, dtype=jnp.int32) // t
    qw = (
        jnp.zeros((b, u_cap), jnp.float32)
        .at[rows, jnp.where(valid, slot_flat, u_cap)]
        .add(jnp.where(valid, fval, 0.0), mode="drop")
    )
    n_chunks = (n_union + u_chunk - 1) // u_chunk
    return (
        u_ids.reshape(nc_max, 1, u_chunk),
        qw.reshape(b, nc_max, u_chunk).transpose(1, 0, 2),
        n_chunks.astype(jnp.int32),
    )


def _sparse_topk_union_kernel(
    nc_ref,       # SMEM (1, 1) int32: populated union chunks
    u_ids_ref,    # (NC, 1, UC) int32, VMEM
    qw_hbm,       # (NC, B, UC) f32, HBM (chunks DMA'd on demand)
    doc_ids_ref,  # (L, 1, TN) int32
    doc_vals_ref, # (L, 1, TN) f32
    out_s_ref,    # (B, k)
    out_i_ref,    # (B, k)
    qw_vmem,      # scratch (B, UC) f32
    dma_sem,
    *,
    k: int,
    n_actual: int,
    tile_n: int,
    stage1: bool = False,
    tile_merge: bool = False,
    qw_exact: bool = False,
):
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.full_like(out_i_ref, -1)

    el = doc_ids_ref.shape[0]
    b, uc = qw_vmem.shape
    tn = doc_ids_ref.shape[2]

    def chunk_body(c, scores):
        # Chunk c of the query-weight matrix streams from HBM while the
        # VPU builds D (the whole qw would blow the 16MB scoped-VMEM
        # budget at NC_max blocks).
        copy = pltpu.make_async_copy(qw_hbm.at[c], qw_vmem, dma_sem)
        copy.start()
        # (1, UC) -> (UC, 1): trailing-size-1 stored layouts crash the
        # Mosaic compiler ("limits[i] <= dim(i)"); store lane-major and
        # transpose the tiny chunk in-kernel instead.
        u8 = jnp.transpose(u_ids_ref[c], (1, 0))  # (UC, 1)
        # D[u, n] = sum_l [doc_ids[l, n] == union[u]] * doc_vals[l, n]
        def l_body(l, d):
            row_ids = doc_ids_ref[l]   # (1, TN)
            row_vals = doc_vals_ref[l]
            return d + jnp.where(row_ids == u8, row_vals, 0.0)

        d = jax.lax.fori_loop(
            0, el, l_body, jnp.zeros((uc, tn), jnp.float32)
        )
        copy.wait()
        if stage1:
            # bf16 candidate pass (ONE MXU pass vs HIGHEST's ~6): with
            # nonnegative weights the rounding is a two-sided relative
            # bound the two-pass proof consumes (sparse_topk_union_
            # twopass) — never a serving result by itself.
            return scores + jax.lax.dot_general(
                qw_vmem[:].astype(jnp.bfloat16),
                d.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if qw_exact:
            # BM25 query weights are small-integer term multiplicities
            # — EXACT in bf16 — so the qw-side splits of the HIGHEST
            # algorithm contribute nothing (see _exact_split_dot).
            return _exact_split_dot(qw_vmem[:], d, scores)
        # HIGHEST: the MXU's default bf16 multiply loses ~4e-3 relative
        # on BM25-scale scores (measured max |ds| 0.11 vs the flat
        # kernel's f32 VPU accumulation -> 20% of top-10 ids flip on
        # near-ties). The f32-exact passes keep the kernel id-parity
        # with get_scores; the MXU share of the runtime is small.
        return scores + jax.lax.dot_general(
            qw_vmem[:], d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    scores = jax.lax.fori_loop(
        0, nc_ref[0, 0], chunk_body, jnp.zeros((b, tn), jnp.float32)
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (b, tn), 1) + j * tile_n
    scores = jnp.where(col < n_actual, scores, NEG_INF)

    if tile_merge:
        # Tile-local extraction on the ALIGNED (B, TN) scores with
        # iota-derived ids, then a (B, 2k) cross-tile merge — the old
        # whole-width merge paid 5 misaligned VPU passes per rank and
        # dominated the kernel at 1M (see tile_topk_iota).
        tile_s, tile_i = tile_topk_iota(
            scores, k, j * tile_n, force_loop=k > 16
        )
        cand_s = jnp.concatenate([out_s_ref[:], tile_s], axis=1)
        cand_i = jnp.concatenate([out_i_ref[:], tile_i], axis=1)
        out_s_ref[:], out_i_ref[:] = merge_topk(cand_s, cand_i, k)
        return

    # Whole-batch merge. (A 128-row-group merge loop — static ref
    # slices — crashes the Mosaic compiler: "limits[i] <= dim(i)";
    # with qw streamed from HBM and tile_n <= 1024 the whole merge
    # fits scoped VMEM at B=512.)
    cand_s = jnp.concatenate([out_s_ref[:], scores], axis=1)
    cand_i = jnp.concatenate([out_i_ref[:], col], axis=1)
    out_s_ref[:], out_i_ref[:] = merge_topk(
        cand_s, cand_i, k, force_loop=k > 16
    )


def sparse_topk_union_pallas(
    doc_ids: jnp.ndarray,
    doc_vals: jnp.ndarray,
    q_ids: jnp.ndarray,
    q_vals: jnp.ndarray,
    k: int,
    tile_n: int = 896,
    u_chunk: int = 256,
    interpret: bool = False,
    stage1: bool = False,
    tile_merge: bool = False,
    qw_exact: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused lexical top-k via batch term dedup + MXU accumulation.
    Returns ((B, k) scores, (B, k) ids) — same semantics and tie order
    (score desc, lower doc id first) as sparse_topk_pallas.
    stage1=True swaps the HIGHEST MXU pass for a single bf16 pass —
    candidate generation only (see sparse_topk_union_twopass)."""
    from jax.experimental.pallas import tpu as pltpu

    n, el = doc_ids.shape
    b, t = q_ids.shape
    el = max(el, 1)
    # The (UC, TN) match intermediate and D tile budget ~2MB (scoped
    # VMEM is 16MB total; the (B, TN) scores carry is the other big
    # resident).
    budget = 2 * 1024 * 1024 // (u_chunk * 4)
    tile_n = min(tile_n, max(128, (budget // 128) * 128))
    tile_n = min(tile_n, _round_up(n, 128))
    n_pad = _round_up(n, tile_n)
    b_pad = _round_up(b, 8)

    u_ids, qw, n_chunks = union_prep(
        _pad_axis(q_ids, b_pad, 0, -2), _pad_axis(q_vals, b_pad, 0, 0.0),
        u_chunk,
    )
    nc_max = u_ids.shape[0]
    nc = jnp.reshape(jnp.minimum(n_chunks, nc_max), (1, 1))

    # (N, L) -> (L, 1, N): term slots lead (dynamically indexable rows),
    # docs ride lanes.
    doc_ids_t = _pad_axis(_pad_axis(doc_ids, el, 1, -1), n_pad, 0, -1).T[
        :, None, :
    ]
    doc_vals_t = _pad_axis(
        _pad_axis(doc_vals, el, 1, 0.0), n_pad, 0, 0.0
    ).T[:, None, :]

    kernel = functools.partial(
        _sparse_topk_union_kernel, k=k, n_actual=n, tile_n=tile_n,
        stage1=stage1, tile_merge=tile_merge, qw_exact=qw_exact,
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((nc_max, 1, u_chunk), lambda j: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((el, 1, tile_n), lambda j: (0, 0, j)),
            pl.BlockSpec((el, 1, tile_n), lambda j: (0, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, k), lambda j: (0, 0)),
            pl.BlockSpec((b_pad, k), lambda j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, u_chunk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * nc_max * u_chunk
            + n_pad * el * nc_max * u_chunk,
            bytes_accessed=n_pad * el * 8
            + nc_max * u_chunk * (b_pad + 1) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(nc, u_ids, qw, doc_ids_t, doc_vals_t)
    return out_s[:b], out_i[:b]


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_n", "u_chunk", "interpret", "qw_exact"),
)
def _sparse_topk_union_jit(
    doc_ids, doc_vals, q_ids, q_vals, k, tile_n, u_chunk, interpret,
    qw_exact,
):
    return sparse_topk_union_pallas(
        doc_ids, doc_vals, q_ids, q_vals, k, tile_n=tile_n,
        u_chunk=u_chunk, interpret=interpret, qw_exact=qw_exact,
    )


def sparse_topk_union(
    doc_ids: jnp.ndarray,
    doc_vals: jnp.ndarray,
    q_ids: jnp.ndarray,
    q_vals: jnp.ndarray,
    k: int,
    use_pallas: Optional[bool] = None,
    tile_n: int = 896,
    u_chunk: int = 256,
    qw_exact: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatching entry for the union-slot kernel (non-Pallas path =
    reference scorer + top_k, identical to sparse_topk's). qw_exact:
    query weights are small integers (bf16-exact) — the kernel runs the
    3-pass exact-split contraction instead of HIGHEST's 6 passes."""
    k = min(k, doc_ids.shape[0])
    backend = jax.default_backend()
    if use_pallas is None:
        use_pallas = backend == "tpu"
    if use_pallas:
        return _sparse_topk_union_jit(
            doc_ids, doc_vals, q_ids, q_vals, k, tile_n, u_chunk,
            backend != "tpu", qw_exact=qw_exact,
        )
    scores = sparse_scores_ref(doc_ids, doc_vals, q_ids, q_vals)
    top_s, top_i = jax.lax.top_k(scores, k)
    return top_s, top_i.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Hashed-union kernel: segment-partitioned batch dedup.
#
# The union kernel's match work is U * L * TN per corpus tile — every
# union term is compared against EVERY term slot of every doc. With the
# hashed-segment corpus layout (tid % S partitions each doc's slots), a
# union term can only match inside its own segment, so grouping union
# chunks by segment cuts per-chunk match work from UC*L to UC*Ls
# (Ls ~ L/S padded). Chunks are segment-homogeneous: union terms sort
# by (tid % S, tid), each segment's run pads up to a u_chunk boundary,
# and an SMEM chunk->segment map tells the kernel which Ls-slot row
# range to scan (rows g*Ls..g*Ls+Ls of the (S*Ls, 1, TN) layout — one
# dynamic LEADING-dim ref index per row, the form Mosaic supports).
# Compute drops ~L/Ls per populated chunk at the price of more chunks
# (per-segment padding) and a 2-2.5x corpus stream (hashed layout
# bytes) — at 200k+ the union path is compute-bound, so the stream is
# noise. Scores are identical to the flat union kernel up to f32
# reduction order (same HIGHEST-precision MXU accumulation).
# ---------------------------------------------------------------------------


def union_prep_hashed(
    q_ids: jnp.ndarray,
    q_vals: jnp.ndarray,
    u_chunk: int,
    n_segments: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Segment-grouped batch dedup (pure JAX, jit-safe).

    Returns:
      u_ids     (NC, 1, UC) int32 — union ids, -2 padded, chunked;
                chunks are segment-homogeneous (all real ids in a chunk
                share tid % S);
      qw        (NC, B, UC) f32   — per-query weights (dup ids sum);
      chunk_seg (1, NC) int32     — segment of each chunk;
      n_chunks  () int32          — populated chunk count.

    NC = ceil(B*T / UC) + S covers the worst per-segment padding case
    (each partially-filled segment wastes < one chunk).
    """
    b, t = q_ids.shape
    m = b * t
    s_n = n_segments
    u_cap = _round_up(max(m, u_chunk), u_chunk)
    nc_max = u_cap // u_chunk + s_n
    cap = nc_max * u_chunk

    flat = q_ids.reshape(-1)
    fval = q_vals.reshape(-1)
    valid = flat >= 0
    seg = jnp.where(valid, flat % s_n, s_n - 1)
    big = jnp.int32(2**31 - 1)
    # (segment, tid) sort key; tid < 2^26 (sklearn/BM25 vocab ids are
    # dense small ints) and S <= 16 keeps the key inside int32
    key = jnp.where(valid, seg * jnp.int32(1 << 26) + flat, big)
    order = jnp.argsort(key)
    s_sorted = jnp.where(valid, flat, big)[order]
    sval = valid[order]
    sseg = seg[order]
    first = jnp.concatenate(
        [sval[:1], (s_sorted[1:] != s_sorted[:-1]) & sval[1:]]
    )
    f32i = first.astype(jnp.int32)
    uniq_rank = jnp.cumsum(f32i) - 1  # global unique rank (seg-major)

    # per-segment unique counts -> u_chunk-padded slot offsets
    seg_onehot = (
        sseg[:, None] == jnp.arange(s_n, dtype=jnp.int32)[None, :]
    )
    cnt = jnp.sum(seg_onehot & first[:, None], axis=0).astype(jnp.int32)
    padded = ((cnt + u_chunk - 1) // u_chunk) * u_chunk
    off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1]]
    )
    seg_rank_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt)[:-1]]
    )
    # padded slot of each sorted entry's union term
    slot_sorted = uniq_rank - seg_rank_start[sseg] + off[sseg]

    u_ids = (
        jnp.full((cap,), -2, jnp.int32)
        .at[jnp.where(sval & first, slot_sorted, cap)]
        .set(jnp.where(sval, s_sorted, -2), mode="drop")
    )
    slot_flat = jnp.zeros((m,), jnp.int32).at[order].set(slot_sorted)
    rows = jnp.arange(m, dtype=jnp.int32) // t
    qw = (
        jnp.zeros((b, cap), jnp.float32)
        .at[rows, jnp.where(valid, slot_flat, cap)]
        .add(jnp.where(valid, fval, 0.0), mode="drop")
    )

    # chunk c covers padded slots [c*UC, (c+1)*UC) -> its segment is
    # the one whose [off, off+padded) range contains c*UC. Chunks past
    # the populated range get segment 0 (never visited).
    ends = jnp.cumsum(padded)  # (S,)
    chunk_start = jnp.arange(nc_max, dtype=jnp.int32) * u_chunk
    chunk_seg = jnp.sum(
        (chunk_start[:, None] >= ends[None, :]).astype(jnp.int32), axis=1
    )
    chunk_seg = jnp.minimum(chunk_seg, s_n - 1)
    n_chunks = ends[-1] // u_chunk
    return (
        u_ids.reshape(nc_max, 1, u_chunk),
        qw.reshape(b, nc_max, u_chunk).transpose(1, 0, 2),
        chunk_seg.reshape(1, nc_max),
        n_chunks.astype(jnp.int32),
    )


def _sparse_topk_union_hashed_kernel(
    nc_ref,        # SMEM (1, 1) int32: populated union chunks
    chunk_seg_ref, # SMEM (1, NC) int32: segment of each chunk
    u_ids_ref,     # (NC, 1, UC) int32, VMEM
    qw_hbm,        # (NC, B, UC) f32, HBM (chunks DMA'd on demand)
    doc_ids_ref,   # (S*Ls, 1, TN) int32 (segment-major row blocks)
    doc_vals_ref,  # (S*Ls, 1, TN) f32
    out_s_ref,     # (B, k)
    out_i_ref,     # (B, k)
    qw_vmem,       # scratch (B, UC) f32
    dma_sem,
    *,
    k: int,
    n_actual: int,
    tile_n: int,
    ls: int,
    stage1: bool = False,
    tile_merge: bool = False,
    qw_exact: bool = False,
):
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.full_like(out_i_ref, -1)

    b, uc = qw_vmem.shape
    tn = doc_ids_ref.shape[2]

    def chunk_body(c, scores):
        copy = pltpu.make_async_copy(qw_hbm.at[c], qw_vmem, dma_sem)
        copy.start()
        g = chunk_seg_ref[0, c]
        u8 = jnp.transpose(u_ids_ref[c], (1, 0))  # (UC, 1)

        # only the Ls rows of segment g can match this chunk's terms
        def l_body(l, d):
            row = g * ls + l
            row_ids = doc_ids_ref[row]   # (1, TN)
            row_vals = doc_vals_ref[row]
            return d + jnp.where(row_ids == u8, row_vals, 0.0)

        d = jax.lax.fori_loop(
            0, ls, l_body, jnp.zeros((uc, tn), jnp.float32)
        )
        copy.wait()
        if stage1:
            # bf16 candidate pass — see _sparse_topk_union_kernel
            return scores + jax.lax.dot_general(
                qw_vmem[:].astype(jnp.bfloat16),
                d.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if qw_exact:
            # 3-pass exact-split contraction — see _exact_split_dot
            return _exact_split_dot(qw_vmem[:], d, scores)
        return scores + jax.lax.dot_general(
            qw_vmem[:], d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    scores = jax.lax.fori_loop(
        0, nc_ref[0, 0], chunk_body, jnp.zeros((b, tn), jnp.float32)
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (b, tn), 1) + j * tile_n
    scores = jnp.where(col < n_actual, scores, NEG_INF)

    if tile_merge:
        tile_s, tile_i = tile_topk_iota(
            scores, k, j * tile_n, force_loop=k > 16
        )
        cand_s = jnp.concatenate([out_s_ref[:], tile_s], axis=1)
        cand_i = jnp.concatenate([out_i_ref[:], tile_i], axis=1)
        out_s_ref[:], out_i_ref[:] = merge_topk(cand_s, cand_i, k)
        return

    cand_s = jnp.concatenate([out_s_ref[:], scores], axis=1)
    cand_i = jnp.concatenate([out_i_ref[:], col], axis=1)
    out_s_ref[:], out_i_ref[:] = merge_topk(
        cand_s, cand_i, k, force_loop=k > 16
    )


def sparse_topk_union_hashed_pallas(
    doc_ids3: jnp.ndarray,
    doc_vals3: jnp.ndarray,
    q_ids: jnp.ndarray,
    q_vals: jnp.ndarray,
    k: int,
    tile_n: int = 896,
    u_chunk: int = 128,
    interpret: bool = False,
    stage1: bool = False,
    tile_merge: bool = False,
    qw_exact: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused lexical top-k: hashed-segment corpus x segment-grouped
    union chunks. Returns ((B, k) scores, (B, k) ids), same semantics
    and tie order as sparse_topk_pallas. stage1=True = bf16 candidate
    pass (see sparse_topk_union_twopass)."""
    from jax.experimental.pallas import tpu as pltpu

    n, s_n, ls = doc_ids3.shape
    b, t = q_ids.shape
    # budget the (UC, TN) match intermediate like the flat union kernel
    budget = 2 * 1024 * 1024 // (u_chunk * 4)
    tile_n = min(tile_n, max(128, (budget // 128) * 128))
    tile_n = min(tile_n, _round_up(n, 128))
    n_pad = _round_up(n, tile_n)
    b_pad = _round_up(b, 8)

    u_ids, qw, chunk_seg, n_chunks = union_prep_hashed(
        _pad_axis(q_ids, b_pad, 0, -2), _pad_axis(q_vals, b_pad, 0, 0.0),
        u_chunk, s_n,
    )
    nc_max = u_ids.shape[0]
    nc = jnp.reshape(jnp.minimum(n_chunks, nc_max), (1, 1))

    # (N, S, Ls) -> (S*Ls, 1, N): segment-major term-slot rows lead
    # (dynamically indexable), docs ride lanes.
    ids_p = _pad_axis(doc_ids3, n_pad, 0, -1)
    vals_p = _pad_axis(doc_vals3, n_pad, 0, 0.0)
    doc_ids_t = ids_p.reshape(n_pad, s_n * ls).T[:, None, :]
    doc_vals_t = vals_p.reshape(n_pad, s_n * ls).T[:, None, :]

    kernel = functools.partial(
        _sparse_topk_union_hashed_kernel,
        k=k, n_actual=n, tile_n=tile_n, ls=ls, stage1=stage1,
        tile_merge=tile_merge, qw_exact=qw_exact,
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, nc_max), lambda j: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((nc_max, 1, u_chunk), lambda j: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((s_n * ls, 1, tile_n), lambda j: (0, 0, j)),
            pl.BlockSpec((s_n * ls, 1, tile_n), lambda j: (0, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, k), lambda j: (0, 0)),
            pl.BlockSpec((b_pad, k), lambda j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, u_chunk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * nc_max * u_chunk
            + n_pad * ls * nc_max * u_chunk,
            bytes_accessed=n_pad * s_n * ls * 8
            + nc_max * u_chunk * (b_pad + 1) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(nc, chunk_seg, u_ids, qw, doc_ids_t, doc_vals_t)
    return out_s[:b], out_i[:b]


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_n", "u_chunk", "interpret", "qw_exact"),
)
def _sparse_topk_union_hashed_jit(
    doc_ids3, doc_vals3, q_ids, q_vals, k, tile_n, u_chunk, interpret,
    qw_exact,
):
    return sparse_topk_union_hashed_pallas(
        doc_ids3, doc_vals3, q_ids, q_vals, k, tile_n=tile_n,
        u_chunk=u_chunk, interpret=interpret, qw_exact=qw_exact,
    )


def sparse_topk_union_hashed(
    doc_ids3: jnp.ndarray,
    doc_vals3: jnp.ndarray,
    q_ids: jnp.ndarray,
    q_vals: jnp.ndarray,
    k: int,
    use_pallas: Optional[bool] = None,
    tile_n: int = 896,
    u_chunk: int = 128,
    qw_exact: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatching entry for the hashed-union kernel (non-Pallas path
    flattens segments back to an ELL for the reference scorer).
    qw_exact: integer query weights -> 3-pass exact-split contraction
    (see sparse_topk_union)."""
    k = min(k, doc_ids3.shape[0])
    backend = jax.default_backend()
    if use_pallas is None:
        use_pallas = backend == "tpu"
    if use_pallas:
        return _sparse_topk_union_hashed_jit(
            doc_ids3, doc_vals3, q_ids, q_vals, k, tile_n, u_chunk,
            backend != "tpu", qw_exact=qw_exact,
        )
    n, s_n, ls = doc_ids3.shape
    scores = sparse_scores_ref(
        doc_ids3.reshape(n, s_n * ls),
        doc_vals3.reshape(n, s_n * ls),
        q_ids, q_vals,
    )
    top_s, top_i = jax.lax.top_k(scores, k)
    return top_s, top_i.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Two-pass union serving: bf16 candidate pass + exact rescore + proof.
#
# At 1M x 512q the adopted hashed-union kernel is MXU-bound and the MXU
# pass runs at HIGHEST precision (~6 bf16 passes) because bf16 scores
# flip ~20% of top-10 ids on near-ties. The dense path's answer to the
# same tension (ops.flat_topk two-stage + residual proof) applies
# directly here, and the lexical case has a luxury the dense one lacks:
# every BM25/TF-IDF contribution is NONNEGATIVE (rank_bm25 floors
# negative idf — reference behavior replaced: src/retrieval.py:117-143;
# sklearn tf-idf weights are nonnegative by construction), so the bf16
# stage-1 score brackets the exact score by a pure RELATIVE bound:
#
#   stage1(d) in [exact(d) * (1 - delta), exact(d) * (1 + delta)]
#   delta = 2*2^-9                 (bf16 rounding of qw and of D)
#         + (U + L + T) * 2^-24    (nonneg f32 accumulation)
#
# Stage 1 extracts the top-k_scan docs by bf16 score (the union kernel's
# own merge, k_scan <= 32 keeps the unrolled extraction). Every
# non-candidate's exact score is then <= cut * (1 + delta') where cut is
# the k_scan-th bf16 score. Candidates are rescored with the exact f32
# per-term accumulation (identical formula/slot values as the full
# scan); if the k-th rescored score strictly clears the bound the top-k
# is proven complete, else ONE lax.cond falls back to the exact
# HIGHEST-precision union kernel inside the same dispatch.
# ---------------------------------------------------------------------------


def rescore_ell(
    ell_ids: jnp.ndarray,
    ell_vals: jnp.ndarray,
    q_ids: jnp.ndarray,
    q_vals: jnp.ndarray,
    cand: jnp.ndarray,
) -> jnp.ndarray:
    """Exact f32 rescore of candidate doc rows.

    cand: (B, C) doc ids (negative = padding -> NEG_INF). Returns (B, C)
    scores via the same per-term match-accumulate the full ELL scan
    performs (padding slots carry id -1 / val 0, so a padded query term
    contributes exactly 0).
    """
    safe = jnp.maximum(cand, 0)
    rows_i = jnp.take(ell_ids, safe, axis=0)   # (B, C, L)
    rows_v = jnp.take(ell_vals, safe, axis=0)

    def per_term(carry, qt):
        qid, qval = qt  # (B,)
        m = rows_i == qid[:, None, None]
        contrib = jnp.sum(jnp.where(m, rows_v, 0.0), axis=-1)  # (B, C)
        return carry + qval[:, None] * contrib, None

    init = jnp.zeros(cand.shape, jnp.float32)
    scores, _ = jax.lax.scan(per_term, init, (q_ids.T, q_vals.T))
    return jnp.where(cand >= 0, scores, NEG_INF)


def _twopass_rel_bound(u, t: int, l_slots: int):
    """Relative clearance factor (see module comment above).

    ``u`` bounds the batch's unique union terms: the serving path
    passes the runtime ``np.unique`` count (it already computes it for
    the union-kernel gate) as a traced scalar; callers without one use
    the static worst case b*t. The distinction matters at scale — the
    b*t worst case adds ~2.4e-4 of slack at batch 512 x 8 slots, so
    marginal queries that pass at small batches would fail (and pay the
    full-kernel fallback) purely because the batch grew, even though
    each score accumulates only matched-union-term many additions.
    The f32 accumulation terms use u plus the ELL width and the query
    slot count. An extra 2^-16 covers the f32 reduction-order
    difference between the rescore and the fallback kernel's own
    accumulation (the same slack the hashed-UB prefilter proof uses).
    """
    delta = 2.0 * 2.0 ** -9 + (u + l_slots + t) * 2.0 ** -24
    # exact <= stage1 / (1 - delta): fold into a multiply with margin
    return delta / (1.0 - delta) + 2.0 ** -16


def _union_twopass_impl(
    doc_ids, doc_vals, doc_ids3, doc_vals3, q_ids, q_vals,
    k: int, k_scan: int, use_pallas: bool, interpret: bool,
    return_ok: bool, n_union=None,
):
    n = doc_ids.shape[0]
    b, t = q_ids.shape
    k_scan = max(min(k_scan, n), k)
    ids2d = doc_ids if doc_ids.ndim == 2 else doc_ids.reshape(n, -1)
    vals2d = doc_vals if doc_vals.ndim == 2 else doc_vals.reshape(n, -1)

    if use_pallas:
        if doc_ids3 is not None:
            s1, i1 = sparse_topk_union_hashed_pallas(
                doc_ids3, doc_vals3, q_ids, q_vals, k_scan,
                interpret=interpret, stage1=True,
            )
        else:
            s1, i1 = sparse_topk_union_pallas(
                ids2d, vals2d, q_ids, q_vals, k_scan,
                interpret=interpret, stage1=True,
            )
    else:
        # XLA emulation (CPU tests / non-Pallas): round each weight to
        # bf16 before the exact accumulation — per-factor rounding of
        # nonneg values sums to the same <= 2^-9 relative envelope the
        # kernel's (qw, D) casts produce.
        r16 = lambda x: x.astype(jnp.bfloat16).astype(jnp.float32)
        scores = sparse_scores_ref(
            ids2d, r16(vals2d), q_ids, r16(q_vals)
        )
        s1, i1 = jax.lax.top_k(scores, k_scan)
        i1 = i1.astype(jnp.int32)

    if n_union is None:
        u = float(b * t)
    else:
        # traced runtime unique-term count (never looser than b*t)
        u = jnp.minimum(jnp.asarray(n_union, jnp.float32), float(b * t))
    rel = _twopass_rel_bound(u, t, ids2d.shape[1])
    bound = s1[:, k_scan - 1] * (1.0 + rel)

    # candidates sorted ascending (-1 pads first) so lax.top_k's
    # stability reproduces the scan's lower-id-first tie order
    cand = jnp.sort(i1, axis=1)
    scores_ex = rescore_ell(ids2d, vals2d, q_ids, q_vals, cand)
    top_s, pos2 = jax.lax.top_k(scores_ex, k)
    top_i = jnp.take_along_axis(cand, pos2, axis=1).astype(jnp.int32)
    # A zero stage-1 cut is TRIVIALLY proven, not a failure: weights
    # are nonnegative, so stage1 == 0 implies exact == 0 for every
    # non-candidate (a positive exact score would have a positive bf16
    # image), and the stage-1 merge already orders zero-score ties
    # lowest-id-first like the full scan. Without this, an all-OOV /
    # empty query (every doc scores 0, so "0 > 0" fails) would drag
    # its whole batch through the exact-kernel fallback on every
    # dispatch — pure overhead, indefinitely.
    cut = s1[:, k_scan - 1]
    ok = (top_s[:, k - 1] > bound) | (
        (cut <= 0.0) & (top_s[:, k - 1] <= 0.0)
    )

    def _keep(_):
        return top_s, top_i

    def _full(_):
        if not use_pallas:
            scores = sparse_scores_ref(ids2d, vals2d, q_ids, q_vals)
            fs, fi = jax.lax.top_k(scores, k)
            return fs, fi.astype(jnp.int32)
        if doc_ids3 is not None:
            return sparse_topk_union_hashed_pallas(
                doc_ids3, doc_vals3, q_ids, q_vals, k,
                interpret=interpret,
            )
        return sparse_topk_union_pallas(
            ids2d, vals2d, q_ids, q_vals, k, interpret=interpret
        )

    s_out, i_out = jax.lax.cond(jnp.all(ok), _keep, _full, None)
    if return_ok:
        return s_out, i_out, ok
    return s_out, i_out


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "k_scan", "use_pallas", "interpret", "return_ok"
    ),
)
def _sparse_topk_union_twopass_jit(
    doc_ids, doc_vals, doc_ids3, doc_vals3, q_ids, q_vals,
    n_union,
    k, k_scan, use_pallas, interpret, return_ok,
):
    return _union_twopass_impl(
        doc_ids, doc_vals, doc_ids3, doc_vals3, q_ids, q_vals,
        k, k_scan, use_pallas, interpret, return_ok, n_union=n_union,
    )


def sparse_topk_union_twopass(
    doc_ids: jnp.ndarray,
    doc_vals: jnp.ndarray,
    doc_ids3,
    doc_vals3,
    q_ids: jnp.ndarray,
    q_vals: jnp.ndarray,
    k: int,
    k_scan: int = 32,
    use_pallas: Optional[bool] = None,
    return_ok: bool = False,
    n_union=None,
):
    """Two-pass exact lexical top-k (bf16 candidates + rescore + proof).

    doc_ids/doc_vals: the primary ELL ((N, L) flat or (N, S, Ls)
    hashed-segment — the rescore flattens either). doc_ids3/doc_vals3:
    optional hashed-union copy for stage 1 (None -> flat union kernel).
    REQUIRES nonnegative weights (caller-gated; the proof bound is a
    relative envelope that only holds for nonneg contributions).
    n_union: optional traced scalar with the batch's unique-term count;
    tightens the proof bound vs the static b*t worst case (the serving
    path passes its union-gate np.unique count through the packed query
    upload). Returns (scores, ids[, ok]) with the same semantics as
    sparse_topk; a failed proof for ANY query falls the whole batch
    back to the exact HIGHEST-precision union kernel inside the same
    dispatch.
    """
    k = min(k, doc_ids.shape[0])
    backend = jax.default_backend()
    if use_pallas is None:
        use_pallas = backend == "tpu"
    return _sparse_topk_union_twopass_jit(
        doc_ids, doc_vals, doc_ids3, doc_vals3, q_ids, q_vals,
        n_union,
        k, k_scan, use_pallas, backend != "tpu", return_ok,
    )
