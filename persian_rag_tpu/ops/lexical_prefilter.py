"""Two-pass exact lexical top-k: hashed upper-bound prefilter + rescore.

The flat equality-match ELL scan (persian_rag_tpu.ops.sparse_scores) is
VPU-match-bound: O(N * L * T) comparisons per batch, ~333 ms / 512
queries at N=1M on one v5e chip — the weakest ratio-to-floor in the
framework (reference behavior being replaced: rank_bm25
``BM25Okapi.get_scores`` + argsort, reference src/retrieval.py:117-143).
This module moves the N-sized pass onto the MXU:

Stage 1 (prefilter).  At build time every document is projected into a
dense H-dim "impact" row
    W[d, h] = sum_{t in d, bucket(t) = h} w(t, d)
where w(t, d) >= 0 is the document's precomputed per-term contribution
(BM25 idf*tf-norm, or the l2-normalized TF-IDF weight) and ``bucket``
maps the vocabulary into H slots: the highest-document-frequency terms
get DEDICATED slots (their scores stay exact), the tail is hashed.  A
query becomes q[h] = sum of its term weights per bucket.  Because every
w and every query weight is non-negative,

    q . W[d]  >=  true_score(q, d)          (collisions only ADD mass)

so the dense (B, H) x (H, N) product is a rigorous per-document upper
bound, computed by the SAME Pallas candidate-extraction kernel the dense
two-stage path uses (ops.flat_topk.flat_topk_candidates: per-tile
top-n_easy packed keys + per-tile remaining-max bound keys).  W is
stored bf16 ROUNDED TOWARD +inf, so the bf16 image itself still upper
bounds the f32 impacts; the kernel's own bf16/f32 arithmetic error is
absorbed by the explicit eps term below, exactly as in the dense
residual proof.

Stage 2 (exact rescore).  The top-k_scan candidates by upper bound are
gathered from the padded ELL and rescored with the exact f32
match-accumulate sum (identical slot values the full scan streams), then
top-k with the scan's lower-id-first tie order.

Residual proof.  Every non-candidate document is either unextracted in
its corpus tile (its packed key <= that tile's bound key) or cut by the
k_scan truncation (key <= the k_scan-th key).  Hence for every
non-candidate d:

    true(q, d) <= q . W16[d]                        [round-up image]
               <= bump(value(bound_key)) + eps      [kernel arithmetic]
    eps = eps_bf16(H) * ||q_hash|| * max_row ||W16[row]||

If the k-th rescored candidate score strictly clears that bound (with a
2^-16 relative slack covering the full-scan kernel's own f32 rounding,
so "exact" means exact in the fallback kernel's arithmetic too), the
top-k is proven identical to the full scan's; otherwise ONE lax.cond
falls back to the full ELL scan inside the same dispatch.  This is the
dense path's two-stage-with-proof architecture applied to lexical
scoring (see ops.flat_topk.flat_topk_exact2_stream).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from persian_rag_tpu.ops._merge import NEG_INF
from persian_rag_tpu.ops.flat_topk import (
    _COL_MASK,
    _INT_MIN,
    _bf16_matmul_eps,
    _ikey_to_score,
    flat_topk_candidates,
    two_stage_tiles,
)
from persian_rag_tpu.ops.sparse_scores import sparse_topk

# Knuth multiplicative hash constant (golden-ratio based); the vocab ids
# are dense 0..V-1 so a plain modulo would alias systematically.
_HASH_MULT = 2654435761


def assign_buckets(
    df: np.ndarray, n_buckets: int, dedicated_frac: float = 0.5
) -> np.ndarray:
    """(V,) int32 term -> bucket map.

    The top-df terms (the ones most likely shared between a query and
    many documents, i.e. the ones whose collision noise would hurt the
    proof most) get dedicated buckets; the tail is hashed into the rest.
    """
    v = int(df.shape[0])
    n_ded = min(v, int(n_buckets * dedicated_frac))
    out = np.empty(v, np.int32)
    if n_ded:
        top = np.argsort(-df.astype(np.int64), kind="stable")[:n_ded]
        out[:] = -1
        out[top] = np.arange(n_ded, dtype=np.int32)
        rest = out < 0
    else:
        rest = np.ones(v, bool)
    n_hash = max(1, n_buckets - n_ded)
    tids = np.nonzero(rest)[0].astype(np.uint64)
    out[rest] = (
        ((tids * _HASH_MULT) & 0xFFFFFFFF) % n_hash + n_ded
    ).astype(np.int32)
    return out


def _bf16_round_up(x: np.ndarray) -> np.ndarray:
    """Round non-negative f32 values to the next bf16-representable
    value toward +inf (exponent carry in the uint32 pattern is
    monotone for positive floats)."""
    u = x.astype(np.float32).view(np.uint32)
    inc = ((u & 0xFFFF) != 0).astype(np.uint32)
    return ((u & np.uint32(0xFFFF0000)) + (inc << 16)).view(np.float32)


def build_ub_image(
    ell_ids: np.ndarray,
    ell_vals: np.ndarray,
    term_map: np.ndarray,
    n_buckets: int,
    chunk_rows: int = 65536,
) -> Tuple[np.ndarray, float]:
    """Build the (N, H) bf16 round-up impact image from a padded ELL.

    Returns (W16 as f32-valued array holding exact bf16 values, max
    row l2 norm). Chunked bincount keeps the f64 scratch bounded.
    """
    n, _ = ell_ids.shape
    h = n_buckets
    w = np.zeros((n, h), np.float32)
    for lo in range(0, n, chunk_rows):
        hi = min(lo + chunk_rows, n)
        ids = ell_ids[lo:hi]
        vals = ell_vals[lo:hi]
        mask = ids >= 0
        rows = np.nonzero(mask)[0]
        buckets = term_map[ids[mask]]
        flat = rows.astype(np.int64) * h + buckets
        w[lo:hi] = np.bincount(
            flat, weights=vals[mask].astype(np.float64),
            minlength=(hi - lo) * h,
        ).reshape(hi - lo, h)
    w16 = _bf16_round_up(w)
    row_norm_max = float(
        np.sqrt(np.max(np.sum(w16.astype(np.float64) ** 2, axis=1)))
    )
    return w16, row_norm_max


def hash_queries(
    qids: np.ndarray, qvals: np.ndarray, term_map: np.ndarray, n_buckets: int
) -> np.ndarray:
    """(B, H) f32 bucket-summed query weights (host-side; B*T is tiny)."""
    b = qids.shape[0]
    out = np.zeros((b, n_buckets), np.float32)
    mask = qids >= 0
    rows = np.nonzero(mask)[0]
    buckets = term_map[qids[mask]]
    np.add.at(out, (rows, buckets), qvals[mask])
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "k_scan", "n_easy", "interpret", "use_pallas", "return_ok",
        "tile_n", "tile_q", "fallback",
    ),
)
def prefilter_topk(
    q_hash: jnp.ndarray,
    w16: jnp.ndarray,
    row_norm_max: jnp.ndarray,
    ell_ids: jnp.ndarray,
    ell_vals: jnp.ndarray,
    q_ids: jnp.ndarray,
    q_vals: jnp.ndarray,
    k: int,
    k_scan: int = 256,
    n_easy: int = 4,
    interpret: bool = False,
    use_pallas: Optional[bool] = None,
    return_ok: bool = False,
    tile_n: Optional[int] = None,
    tile_q: Optional[int] = None,
    fallback: bool = True,
):
    """Lexical top-k through the hashed-UB prefilter.

    One dispatch: Pallas UB candidate pass -> XLA top_k over packed keys
    -> ELL gather + exact f32 rescore -> residual proof -> lax.cond
    full-scan fallback when any query's proof fails. Returns
    (scores (B, k) f32, ids (B, k) int32[, ok (B,) bool]).

    fallback=False skips the full-scan cond and returns the rescored
    candidates directly — every returned score is the exact BM25/TF-IDF
    value, but candidate-set recall is unguarded. MEASURED VERDICT
    (N=200k chip bench, DESIGN.md "Hashed upper-bound lexical
    prefilter"): the residual proof passes only 0-10% of queries and
    the no-fallback recall@10 is 0.02-0.35 — a single hashed tail-term
    collision injects a full idf-sized spurious weight, BM25 weights
    are nearly constant per term (tf mostly 1), and collision-doc
    count scales with (tail entries) * T / H. This module is therefore
    a documented opt-in mechanism and a measured dead end for serving
    at scale: exact lexical serving stays on the ELL scan. It remains
    sound (verified mode is result-exact via the fallback) and useful
    on corpora whose vocabulary fits the dedicated buckets.
    """
    n = ell_ids.shape[0]
    b = q_hash.shape[0]
    auto_tq, auto_tn = two_stage_tiles(n, b)
    tile_q = tile_q or auto_tq
    tile_n = tile_n or auto_tn
    cand_keys, bound_keys, tn = flat_topk_candidates(
        q_hash.astype(jnp.float32),
        w16,
        metric="dot",
        tile_n=tile_n,
        tile_q=tile_q,
        compute_dtype=jnp.bfloat16,
        n_easy=n_easy,
        interpret=interpret,
    )
    if cand_keys.shape[1] < k:
        # degenerate tiny grid (J*n_easy < k): no candidate pool to
        # filter — serve the full scan directly (trace-time branch)
        out = sparse_topk(
            ell_ids, ell_vals, q_ids, q_vals, k, use_pallas=use_pallas
        )
        if return_ok:
            return out + (jnp.zeros((b,), bool),)
        return out
    k_scan = max(min(k_scan, cand_keys.shape[1]), k)
    top_keys, pos = jax.lax.top_k(cand_keys, k_scan)
    ids = (pos // n_easy) * tn + (tn - 1 - (top_keys & _COL_MASK))
    ids = jnp.where(top_keys == _INT_MIN, -1, ids)

    # Upper bound on every non-candidate's UB score (maximize space).
    bound_key = jnp.maximum(
        jnp.max(bound_keys, axis=1), top_keys[:, k_scan - 1]
    )
    bound_val = _ikey_to_score(bound_key & ~_COL_MASK)
    bound_val = bound_val + jnp.abs(bound_val) * 2.0 ** -11
    qn = jnp.sqrt(jnp.sum(q_hash.astype(jnp.float32) ** 2, axis=-1))
    eps = _bf16_matmul_eps(w16.shape[1]) * qn * row_norm_max

    # Exact rescore of the gathered candidate rows. Candidates sorted
    # ascending (-1 pads first) so lax.top_k's stability reproduces the
    # full scan's lower-id-first tie order.
    cand = jnp.sort(ids, axis=1)
    safe = jnp.maximum(cand, 0)
    rows_i = jnp.take(ell_ids, safe, axis=0)  # (B, C, L)
    rows_v = jnp.take(ell_vals, safe, axis=0)

    def per_term(carry, qt):
        qid, qval = qt  # (B,)
        m = rows_i == qid[:, None, None]
        contrib = jnp.sum(jnp.where(m, rows_v, 0.0), axis=-1)  # (B, C)
        return carry + qval[:, None] * contrib, None

    init = jnp.zeros((b, cand.shape[1]), jnp.float32)
    scores, _ = jax.lax.scan(per_term, init, (q_ids.T, q_vals.T))
    scores = jnp.where(cand >= 0, scores, NEG_INF)
    top_s, pos2 = jax.lax.top_k(scores, k)
    top_i = jnp.take_along_axis(cand, pos2, axis=1).astype(jnp.int32)

    # Strict clearance with a 2^-16 relative slack absorbing the f32
    # rounding differences between this rescore and the fallback
    # kernel's own accumulation order.
    outside = (bound_val + eps) * (1.0 + 2.0 ** -16)
    ok = top_s[:, k - 1] > outside

    if not fallback:
        if return_ok:
            return top_s, top_i, ok
        return top_s, top_i

    def _keep(_):
        return top_s, top_i

    def _full(_):
        return sparse_topk(
            ell_ids, ell_vals, q_ids, q_vals, k, use_pallas=use_pallas
        )

    s_out, i_out = jax.lax.cond(jnp.all(ok), _keep, _full, None)
    if return_ok:
        return s_out, i_out, ok
    return s_out, i_out
