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
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from persian_rag_tpu.ops._merge import NEG_INF, merge_topk


def _cand_compiler_params() -> dict:
    """Mosaic grid-dimension semantics for the CANDIDATES kernels only.

    Both grid dims of the candidate-extraction kernels are genuinely
    parallel (each (i, j) tile writes a private output block; nothing is
    revisited), so Mosaic may be told so. Env-gated experiment knob:
    PRT_DIMSEM="parallel,parallel" (or any comma-joined pair). The
    running-max/merge kernels revisit their output block across j and
    MUST keep the default "arbitrary" semantics — do not reuse this
    there.
    """
    sem = os.environ.get("PRT_DIMSEM", "")
    if not sem:
        return {}
    from jax.experimental.pallas import tpu as pltpu

    return {
        "compiler_params": pltpu.CompilerParams(
            dimension_semantics=tuple(sem.split(","))
        )
    }


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
# Two-stage exact path: bf16 prefilter -> f32 refine -> rigorous proof.
# ---------------------------------------------------------------------------


def _bf16_matmul_eps(d: int) -> float:
    """Rigorous relative bound on |bf16-matmul - exact| for a length-d
    dot product, in units of ||q||*||c||.

    bf16 round-to-nearest unit roundoff is 2^-9, so each input carries
    relative error <= 2^-9 and each product <= 2^-8 + 2^-18 (products of
    two bf16 significands are exact in f32). f32 accumulation adds at
    most (d-1)*2^-24 relative to sum(|p_i|) <= ||q||*||c||
    (Cauchy-Schwarz), for any summation order. A 25% slack absorbs the
    reference path's own f32-HIGHEST-vs-exact deviation (~2^-21)."""
    return (2.0 ** -8 + 2.0 ** -18 + (d - 1) * 2.0 ** -24) * 1.25


def _exact_refine(q32, corpus, cand, csq, metric, k):
    """f32-HIGHEST re-score of candidate rows and top-k, shared by both
    two-stage variants. cand is (Q, m) ids, id-ascending per row so
    lax.top_k's stability gives FAISS lower-id tie order; -1 = pad.
    Returns scores in MAXIMIZE space (dot, or 2 q.c - ||c||^2 for l2)."""
    safe = jnp.maximum(cand, 0)
    rows = jnp.take(corpus, safe, axis=0).astype(jnp.float32)
    s_ref = jnp.einsum(
        "qd,qmd->qm",
        q32,
        rows,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    s_refm = 2.0 * s_ref - jnp.take(csq, safe) if metric == "l2" else s_ref
    s_refm = jnp.where(cand >= 0, s_refm, NEG_INF)
    top_s, pos = jax.lax.top_k(s_refm, k)
    return top_s, jnp.take_along_axis(cand, pos, axis=1).astype(jnp.int32)


def _proof_eps(q32, csq, metric, max_cnorm_sq=None, eps_mm=None):
    """Per-query rigorous bound on |bf16 stage-1 score - true score|.

    max_cnorm_sq: max squared norm of the rows the bf16 matmul actually
    SAW (the centered rows when a centered stage-1 image is in use —
    their norms are a small fraction of the raw rows' on real embedding
    geometry, which is precisely why centering rescues the proof
    margins there). Defaults to max(csq) (uncentered image).
    eps_mm: relative matmul bound (defaults to the plain-bf16 bound;
    the bf16x2 stage passes `_bf16x2_matmul_eps`)."""
    err_factor = 2.0 if metric == "l2" else 1.0
    q_norm = jnp.sqrt(jnp.sum(q32 * q32, axis=-1))
    if max_cnorm_sq is None:
        max_cnorm_sq = jnp.max(csq)
    if eps_mm is None:
        eps_mm = _bf16_matmul_eps(q32.shape[1])
    return err_factor * eps_mm * q_norm * jnp.sqrt(max_cnorm_sq)


@functools.partial(jax.jit, static_argnames=("k", "metric", "m"))
def flat_topk_exact2(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    metric: str = "dot",
    m: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bit-exact top-k at near-bf16-matmul speed.

    Stage 1 ranks all N corpus rows with ONE native-MXU bf16 matmul
    (f32 accumulation) and keeps each query's top-m candidate ids.
    Stage 2 re-scores only those m rows per query at f32 HIGHEST
    precision (the reference arithmetic) and takes the final top-k;
    candidates are sorted by ascending id first so lax.top_k's
    stability reproduces FAISS lower-index tie-breaking.

    The result is EXACT, not approximate, by a per-query residual
    proof: every non-candidate's true score is bounded by its bf16
    score plus the rigorous rounding bound `_bf16_matmul_eps`, and
    every non-candidate's bf16 score is <= the (m+1)-th best. If each
    query's refined kth score strictly exceeds that bound, no
    non-candidate can belong to the true top-k; otherwise the whole
    batch falls back to the full f32-HIGHEST scan inside lax.cond, so
    outputs always match flat_topk_ref. On random normalized data the
    kth-to-(m+1)th score gap dwarfs the ~4e-3 bound, so the fallback
    is cold.

    Replaces the f32-HIGHEST full matmul (3x bf16 MXU passes over all
    N rows) with one bf16 pass plus O(Q*m*d) refine work.
    """
    n = corpus.shape[0]
    assert k <= m < n, (k, m, n)
    q32 = queries.astype(jnp.float32)

    # Stage 1: one bf16 MXU pass over the corpus. The astype fuses into
    # the dot as an operand conversion (no corpus-sized copy).
    s16 = jax.lax.dot_general(
        q32.astype(jnp.bfloat16),
        corpus.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    csq = jnp.sum(
        corpus.astype(jnp.float32) * corpus.astype(jnp.float32), axis=-1
    )
    if metric == "l2":
        # maximize s = 2 q.c - ||c||^2; only the matmul term is inexact
        s16m = 2.0 * s16 - csq[None, :]
    elif metric == "dot":
        s16m = s16
    else:
        raise ValueError(f"unknown metric: {metric}")

    cand_s16, cand_idx = jax.lax.top_k(s16m, m + 1)
    bound16 = cand_s16[:, m]  # best possible bf16 score outside the set
    cand = jnp.sort(cand_idx[:, :m], axis=1)

    # Stage 2: exact re-score of the m candidate rows per query.
    top_s, top_i = _exact_refine(q32, corpus, cand, csq, metric, k)

    # Residual proof (per query, then all-reduce over the batch).
    eps = _proof_eps(q32, csq, metric)
    ok = jnp.all(top_s[:, k - 1] > bound16 + eps)

    def _refined(_):
        return top_s, top_i

    def _full_scan(_):
        s = jnp.dot(
            q32,
            corpus.astype(jnp.float32).T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        sm = 2.0 * s - csq[None, :] if metric == "l2" else s
        fs, fi = jax.lax.top_k(sm, k)
        return fs, fi.astype(jnp.int32)

    out_s, out_i = jax.lax.cond(ok, _refined, _full_scan, None)
    if metric == "l2":
        q_sq = jnp.sum(q32 * q32, axis=-1, keepdims=True)
        out_s = q_sq - out_s
    return out_s, out_i


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "k_scan", "tile_n", "tile_q", "n_easy", "interpret",
        "bf16_transposed", "return_ok", "group", "lane_slots",
        "lane_depth",
    ),
)
def flat_topk_exact2_stream(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    metric: str = "dot",
    k_scan: int = 32,
    tile_n: int = 2048,
    tile_q: int = 256,
    n_easy: int = 4,
    corpus_sqnorm: Optional[jnp.ndarray] = None,
    corpus_bf16: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    bf16_transposed: bool = False,
    return_ok: bool = False,
    group: int = 0,
    lane_slots: int = 0,
    lane_depth: int = 2,
    corpus_center: Optional[jnp.ndarray] = None,
    center_sqmax: Optional[jnp.ndarray] = None,
    corpus_bf16_lo: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming bit-exact top-k: merge-free bf16 Pallas candidate
    extraction -> one small XLA top_k -> f32 refine -> residual proof.

    corpus_bf16_lo: bf16 rounding residues of the (centered) stage-1
    rows. When given, stage 1 runs the bf16x2 kernel (3 MXU passes,
    ~2^-17-relative scores) whose ~100x tighter proof bound survives
    real-geometry margins that defeat plain bf16 (see
    `_extract_candidates_x2_kernel`). corpus_bf16 must then hold the
    bf16 HI parts (centered when corpus_center is set).

    corpus_center: (d,) row mean for a MEAN-CENTERED stage-1 image.
    When given, the bf16 image streamed by the candidate kernel holds
    (c - mu) rows (pass the precomputed image via corpus_bf16, or let
    this function derive it); candidate RANKING is unchanged (the shift
    <q, mu> is constant per query), the refine stage re-scores against
    the ORIGINAL rows so returned scores are exact, and the residual
    proof translates its bound by <q, mu> (2<q, mu> for l2) and uses
    the centered row norms (center_sqmax = max ||c - mu||^2, cached by
    callers) for the bf16 rounding term. On real embedding geometry —
    rows concentrated in a tight cone — the uncentered proof FAILS ON
    EVERY BATCH (measured 0/20 at 500k real-geometry rows: scores
    cluster within the bf16 rounding bound of each other), silently
    degrading every search to the full-scan fallback; centering
    restores the margins because both the score spread and the error
    bound live in the centered space.

    Stage 1 streams the corpus once through `flat_topk_candidates`
    (per-tile top-n_easy packed keys + a per-tile remaining-max bound;
    no cross-tile merging — the running-merge kernels pay an O(k_scan)
    per-tile op storm that costs more than the matmul at k_scan~32).
    Nothing Q*N-sized ever materializes, so this regime has no memory
    budget cap (works at N=1M+). One XLA top_k over the (Q, J*n_easy)
    candidate keys picks k_scan finalists, which stage 2 re-scores at
    f32 HIGHEST (the reference arithmetic); candidates are sorted by
    ascending id so lax.top_k's stability reproduces FAISS lower-index
    tie-breaking.

    return_ok=True additionally returns the PER-QUERY residual-proof
    verdict, a (Q,) bool vector (True = that query's refined result was
    proven exact without needing its slice's full-scan fallback) — the
    fallback-rate signal consumed by DenseIndex's runtime stage-1
    demotion and by geometry diagnostics. Note a False entry does NOT
    mean an inexact result: the failing query's slice is rescanned at
    f32, it means the dispatch PAID for that rescan.

    Exactness proof, per query: every corpus element is either a
    finalist (exactly re-scored), a non-finalist candidate (its key <=
    the k_scan-th finalist key), or unextracted in some tile (its key <=
    that tile's bound key). So every non-finalist's true f32 score is
    bounded by

        bump(value(max(bound_keys, k_scan-th key)))   [key truncation]
      + err_factor * eps_bf16 * ||q|| * max||c||      [bf16 matmul]

    with bump(v) = v + |v|*2^-11. If each query's refined kth score
    strictly exceeds that bound, no non-finalist can belong to the true
    top-k. The rare failing batch recomputes with the f32 exact path
    inside lax.cond, so the returned SET always matches flat_topk_ref /
    FAISS. Ordering caveat: finalists are ranked by the f32-HIGHEST
    refine contraction; if XLA lowers that einsum with a different
    accumulation order than the reference's full (Q, N) matmul, two
    finalists whose true scores agree to ~1 ulp could swap ranks
    relative to the ref scan — exact ties are unaffected (both paths
    tie-break by lower id via stable top_k). Every parity test to date
    observes identical rounding; treat sub-ulp rank agreement as
    empirical rather than proven.
    """
    n_q, d = queries.shape
    n = corpus.shape[0]
    q32 = queries.astype(jnp.float32)

    # Stage 1 computes in bf16 regardless, so stream a bf16 corpus image
    # through the kernel (halves per-tile VMEM residency and HBM
    # traffic). l2's exact ||c||^2 comes from the f32 rows, not this
    # image. A bare dispatch recomputes the image and the csq reduction
    # from the full corpus every call (~3x the kernel's own HBM traffic
    # at 1M x 384) — serving callers should pass the precomputed
    # corpus_bf16 / corpus_sqnorm that DenseIndex caches at commit();
    # loop-style callers (bench's fori) get them hoisted by XLA anyway.
    # bf16_transposed: corpus_bf16 is stored (d, N) so the candidate
    # kernel's MXU contraction needs no per-tile corpus transpose.
    # With corpus_center set, a caller-supplied corpus_bf16 MUST already
    # hold the centered rows (DenseIndex builds it that way at commit).
    if corpus_bf16 is not None:
        c16 = corpus_bf16
    else:
        src = corpus
        if corpus_center is not None:
            src = corpus.astype(jnp.float32) - corpus_center[None, :]
        if src.dtype == jnp.bfloat16:
            c16 = src.T if bf16_transposed else src
        else:
            c16 = (
                src.astype(jnp.bfloat16).T
                if bf16_transposed
                else src.astype(jnp.bfloat16)
            )
    if corpus_sqnorm is not None:
        csq = corpus_sqnorm.astype(jnp.float32)
    else:
        csq = jnp.sum(
            corpus.astype(jnp.float32) * corpus.astype(jnp.float32), axis=-1
        )
    q_lo = None
    if corpus_bf16_lo is not None:
        q_lo = q32 - q32.astype(jnp.bfloat16).astype(jnp.float32)
    cand_keys, bound_keys, tn = flat_topk_candidates(
        q32,
        c16,
        metric=metric,
        corpus_sqnorm=csq if metric == "l2" else None,
        tile_n=tile_n,
        tile_q=tile_q,
        compute_dtype=jnp.bfloat16,
        n_easy=n_easy,
        interpret=interpret,
        corpus_transposed=bf16_transposed,
        group=group,
        lane_slots=lane_slots,
        lane_depth=lane_depth,
        corpus_lo=corpus_bf16_lo,
        queries_lo=q_lo,
    )
    k_scan = min(k_scan, cand_keys.shape[1])
    assert k <= k_scan, (k, k_scan, cand_keys.shape)

    top_keys, pos = jax.lax.top_k(cand_keys, k_scan)
    ids = (pos // n_easy) * tn + (tn - 1 - (top_keys & _COL_MASK))
    ids = jnp.where(top_keys == _INT_MIN, -1, ids)

    # Residual bound over everything outside the finalist set, in
    # maximize space (dot score, or 2 q.c - ||c||^2 for l2).
    bound_key = jnp.maximum(
        jnp.max(bound_keys, axis=1), top_keys[:, k_scan - 1]
    )
    bound_val = _ikey_to_score(bound_key & ~_COL_MASK)
    bound_val = bound_val + jnp.abs(bound_val) * 2.0 ** -11

    cand = jnp.sort(ids, axis=1)  # -1 sentinels first, then id-ascending
    top_s, top_i = _exact_refine(q32, corpus, cand, csq, metric, k)

    eps_mm = (
        _bf16x2_matmul_eps(q32.shape[1])
        if corpus_bf16_lo is not None
        else None
    )
    if corpus_center is not None:
        # stage-1 keys/bounds live in centered space: translate the
        # bound back to true-score space (<q, mu> per query; the l2
        # maximize space 2 q.c - ||c||^2 shifts by 2<q, mu>), and bound
        # the bf16 rounding term by the CENTERED row norms.
        # The translation itself is a PROOF INPUT, so it must not
        # introduce unaccounted error: at the TPU default matmul
        # precision this matvec truncates to bf16 (~2^-9 relative on
        # <q, mu>, with ||mu|| ~ 1 on real geometry) — orders of
        # magnitude beyond eps on tight-cone corpora, silently voiding
        # the exactness proof. Pin HIGHEST and fold its remaining f32
        # accumulation bound into eps below.
        mu32 = corpus_center.astype(jnp.float32)
        qc = jnp.einsum(
            "qd,d->q", q32, mu32,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        err_f = 2.0 if metric == "l2" else 1.0
        bound_val = bound_val + err_f * qc
        mu_norm = jnp.sqrt(jnp.sum(mu32 * mu32))
        if center_sqmax is None:
            # rigorous fallback: ||c - mu|| <= ||c|| + ||mu||
            max_cn = (jnp.sqrt(jnp.max(csq)) + mu_norm) ** 2
        else:
            max_cn = center_sqmax
        eps = _proof_eps(q32, csq, metric, max_cnorm_sq=max_cn,
                         eps_mm=eps_mm)
        # f32-HIGHEST accumulation error of the qc matvec, any
        # summation order (Cauchy-Schwarz): (d-1) * 2^-24 * ||q||*||mu||
        q_norm = jnp.sqrt(jnp.sum(q32 * q32, axis=-1))
        eps = eps + err_f * (d - 1) * 2.0 ** -24 * q_norm * mu_norm
    else:
        eps = _proof_eps(q32, csq, metric, eps_mm=eps_mm)
    ok_q = top_s[:, k - 1] > bound_val + eps  # per-query proof verdict

    # refined results in FINAL score space (l2 distances ascending)
    if metric == "l2":
        q_sq = jnp.sum(q32 * q32, axis=-1, keepdims=True)
        top_s_final = q_sq - top_s
    else:
        top_s_final = top_s

    # SLICED fallback: the proof is an ALL-quantifier, and its failure
    # probability grows with batch size — at batch 2048 essentially
    # every batch contains >= 1 near-tie query, so a whole-batch
    # lax.cond pays the full f32 scan every dispatch (measured: stage-1
    # + refine 3.1 ms, +cond 20.8 ms at 2048 x 100k). Scanning over
    # PROOF_SLICE-query slices confines the f32 scan to the slices that
    # actually fail.
    PROOF_SLICE = 256
    if n_q <= PROOF_SLICE:
        def _refined(_):
            return top_s_final, top_i

        def _full_scan(_):
            if n_q * n * 4 <= 256 * 1024 * 1024:
                return flat_topk_ref(q32, corpus, k, metric=metric)
            return flat_topk_scan(
                q32, corpus, k, metric=metric, chunk=16_384
            )

        out = jax.lax.cond(jnp.all(ok_q), _refined, _full_scan, None)
        if return_ok:
            return out + (ok_q,)
        return out

    n_slices = -(-n_q // PROOF_SLICE)
    q_pad2 = n_slices * PROOF_SLICE
    pad2 = q_pad2 - n_q

    def _pad_q(x, value=0):
        if pad2 == 0:
            return x
        widths = [(0, pad2)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=value)

    # The slice machinery itself is not free: measured ~5 ms per
    # dispatch at batch 2048 x 1M even when EVERY slice passes (the
    # 8-step scan of conds serializes against the pipeline), vs ~0.5 ms
    # for a whole-batch cond. Nest it: the common all-pass case takes
    # the cheap branch; only a dispatch that actually contains a
    # failing slice pays the sliced scan (which in turn confines the
    # f32 rescan to the failing slices — see the round-3 sliced-proof
    # note in DESIGN.md).
    def _all_keep(_):
        return top_s_final, top_i

    def _sliced(_):
        # pad queries' proofs as True so pads never force a fallback
        ok_s = _pad_q(ok_q, value=True).reshape(n_slices, PROOF_SLICE)
        q_s = _pad_q(q32).reshape(n_slices, PROOF_SLICE, -1)
        ts_s = _pad_q(top_s_final).reshape(n_slices, PROOF_SLICE, k)
        ti_s = _pad_q(top_i).reshape(n_slices, PROOF_SLICE, k)

        def per_slice(carry, xs):
            ok_i, q_i, s_i, i_i = xs

            def _keep(_):
                return s_i, i_i

            def _rescan(_):
                # bit-parity with flat_topk_ref when the slice's (Q, N)
                # score block fits the materialization budget (the
                # chunked scan's different reduction structure can swap
                # sub-ulp near-tie ranks); stream beyond it.
                if PROOF_SLICE * n * 4 <= 256 * 1024 * 1024:
                    return flat_topk_ref(q_i, corpus, k, metric=metric)
                return flat_topk_scan(
                    q_i, corpus, k, metric=metric, chunk=16_384
                )

            out_i = jax.lax.cond(jnp.all(ok_i), _keep, _rescan, None)
            return carry, out_i

        _, (s_out, i_out) = jax.lax.scan(
            per_slice, None, (ok_s, q_s, ts_s, ti_s)
        )
        return (
            s_out.reshape(q_pad2, k)[:n_q],
            i_out.reshape(q_pad2, k)[:n_q],
        )

    out = jax.lax.cond(jnp.all(ok_q), _all_keep, _sliced, None)
    if return_ok:
        return out + (ok_q,)
    return out


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

# Smallest corpus the dispatching two-stage regime engages for.
# Measured (v5e, batch 512 x 384, k=10): two-stage beats the
# materialized XLA exact path 1.21 vs 2.19 ms at 50k and 1.36 vs
# 1.82 ms at 32,768 (ids exact both). Candidate health at the gate:
# J = 32768/1024 = 32 tiles x n_easy 4 = 128 keys >= 2*k_scan for
# every k <= 32. DenseIndex's commit-time margin probe keys off the
# same constant (index/dense.py) — keep them in sync.
TWO_STAGE_MIN_N = 32_768


def two_stage_tiles(
    n_docs: int, batch: int, tile_q: int = 128, tile_n: int = 1024
) -> Tuple[int, int]:
    """Effective (tile_q, tile_n) the dispatching two-stage regime uses.

    Caller hints are honored only in the VMEM-safe direction (smaller
    tile_n, larger tile_q). Measured optima (v5e): tile_n 1024 below
    N=150k / 2048 above (crossover table in DESIGN.md); tile_q 512 at
    batches >= 2048, else 256. bench.py uses this for its corpus-stream
    accounting — keep it the single source of the policy.
    """
    tn_cap = 1024 if n_docs < 150_000 else 2048
    tq = max(tile_q, 512 if batch >= 2048 else 256)
    return tq, min(tile_n * 2, tn_cap)


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
                # k more rank extractions, merged by sorted insertion
                # inside a fori_loop: an unrolled extract-then-merge here
                # accumulates one VMEM stack copy of the (QT, TN) key
                # array per rank and overflows the 16MB scoped limit at
                # k_scan-sized k (the two-stage exact path). The carried
                # single buffer keeps the stack flat; insertion ties
                # prefer the existing entry = earlier tile / lower id,
                # matching merge_topk's first-occurrence semantics.
                def body(_, carry):
                    ks, rs, ri = carry
                    m = jnp.max(ks, axis=1, keepdims=True)
                    ks = jnp.where(ks == m, _INT_MIN, ks)
                    b_s = _ikey_to_score(m & ~_COL_MASK)
                    b_i = j * tile_n + (tile_n - 1 - (m & _COL_MASK))
                    rs, ri = _insert_sorted(rs, ri, b_s, b_i)
                    return ks, rs, ri

                _, rs, ri = jax.lax.fori_loop(
                    0, k, body, (keys, out_s_ref[:], out_i_ref[:])
                )
                out_s_ref[:] = rs
                out_i_ref[:] = ri

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


def _extract_candidates_x2_kernel(
    q_ref,
    qlo_ref,
    c_ref,
    clo_ref,
    cn_ref,
    out_ref,
    *,
    n_actual: int,
    tile_n: int,
    metric: str,
    n_easy: int,
    out_w: int,
):
    """bf16x2 candidate extraction: stage-1 scores from the hi/lo split
    s = q_hi.c_hi + q_hi.c_lo + q_lo.c_hi (f32 accumulation; the
    dropped q_lo.c_lo term is <= 2^-18 ||q|| ||c||). Three MXU passes
    instead of one buy a ~2^-17-relative stage-1, whose rigorous proof
    bound (`_bf16x2_matmul_eps`) is ~100x tighter than plain bf16's —
    the difference between the residual proof holding and failing on
    real embedding geometry (margins there are ~3e-5, vs bf16 eps
    ~1e-3)."""
    j = pl.program_id(1)

    def dot16(a_ref, b_ref):
        return jax.lax.dot_general(
            a_ref[:].astype(jnp.bfloat16),
            b_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    s = dot16(q_ref, c_ref) + dot16(q_ref, clo_ref) + dot16(qlo_ref, c_ref)
    if metric == "l2":
        s = 2.0 * s - cn_ref[:]

    qt = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (qt, tile_n), 1)
    ikey = _score_to_ikey(s)
    key = (ikey & ~_COL_MASK) | (tile_n - 1 - col)
    if n_actual % tile_n != 0:
        valid = (col + j * tile_n) < n_actual
        key = jnp.where(valid, key, _INT_MIN)

    keys = key
    ranks = []
    for _ in range(n_easy):
        m = jnp.max(keys, axis=1, keepdims=True)
        keys = jnp.where(keys == m, _INT_MIN, keys)
        ranks.append(m.reshape(1, qt))
    ranks.append(jnp.max(keys, axis=1, keepdims=True).reshape(1, qt))
    block = jnp.concatenate(ranks, axis=0)
    out_ref[:] = _pad_to(block, out_w, 0, value=_INT_MIN)


def _bf16x2_matmul_eps(d: int) -> float:
    """Rigorous relative bound for the 3-term bf16x2 contraction, in
    units of ||q||*||c||: the dropped q_lo.c_lo term (<= 2^-18), the
    second-level rounding of each lo part (2 x 2^-18(1+2^-9)), and f32
    accumulation over three d-term matmuls (3(d-1) 2^-24), with the
    same 25% slack as the bf16 bound."""
    return (3.0 * 2.0 ** -18 * (1 + 2.0 ** -9)
            + 3.0 * (d - 1) * 2.0 ** -24) * 1.25


def _extract_candidates_kernel(
    q_ref,
    c_ref,
    cn_ref,
    out_ref,
    *,
    n_actual: int,
    tile_n: int,
    metric: str,
    compute_dtype,
    n_easy: int,
    out_w: int,
    row_scaled: bool = False,
    transposed: bool = False,
    lane_slots: int = 0,
    lane_depth: int = 2,
):
    """Merge-free candidate extraction: each tile writes its own top-n_easy
    packed keys plus a remaining-max bound to a PRIVATE output block.

    The running-merge kernels pay an O(k) small-array op storm per tile
    (ruinous at k_scan~32: measured 10 ms vs 2.8 ms at k=10 for
    512x100k). Here the kernel does only 2*n_easy+1 full-tile VPU
    passes and NO cross-tile merging; the global top-k_scan selection
    happens outside in one cheap XLA top_k over the (Q, J*n_easy)
    candidate keys. Slot layout per (query tile i, corpus tile j):
    out[:, :n_easy] = extracted keys (descending), out[:, n_easy] = max
    remaining key — a rigorous per-tile bound on every element NOT
    extracted, which the two-stage exact path's residual proof consumes.
    Without revisited state the pipeline streams at full depth.
    """
    j = pl.program_id(1)

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

    if lane_slots:
        # LANE-SLICED two-level extraction: reduce the (qt, tile_n) key
        # tile to per-offset best/second-best over G contiguous lane
        # chunks using STATIC 128-aligned slices + elementwise maximum —
        # the round-3 grouped kernel computed the same reduction via a
        # (qt, G, C) reshape, whose Mosaic relayout cost MORE than the
        # extraction passes it saved (DESIGN.md dead-ends). Rank
        # extraction then walks the (qt, 2C) reduced array instead of
        # the full tile: ~(2*n_easy+1) passes shrink by tile_n/(2C).
        # Packed keys are globally unique (column bits), so the
        # mask-one-winner step removes exactly one element per rank.
        # The per-tile bound weakens to max(remaining, max r2) — an
        # element hidden behind its chunk-offset's top-2 is only
        # bounded by that offset's r2 — which the two-stage residual
        # proof absorbs (or pays fallbacks for: measured per-regime,
        # see DESIGN.md round-5).
        C = tile_n // lane_slots
        parts = [key[:, g * C:(g + 1) * C] for g in range(lane_slots)]
        levels = []
        cur = parts
        for depth in range(lane_depth):
            if depth > 0:
                cur = [
                    jnp.where(p == levels[-1], _INT_MIN, p) for p in cur
                ]
            r = cur[0]
            for p in cur[1:]:
                r = jnp.maximum(r, p)
            levels.append(r)
        keys = jnp.concatenate(levels, axis=1)
        ranks = []
        for _ in range(n_easy):
            m = jnp.max(keys, axis=1, keepdims=True)
            keys = jnp.where(keys == m, _INT_MIN, keys)
            ranks.append(m.reshape(1, qt))
        # elements invisible to the reduced array (rank > lane_depth in
        # their offset-slot) are bounded by the DEEPEST level's max
        bound = jnp.maximum(
            jnp.max(keys, axis=1, keepdims=True),
            jnp.max(levels[-1], axis=1, keepdims=True),
        )
        ranks.append(bound.reshape(1, qt))
        block = jnp.concatenate(ranks, axis=0)
        out_ref[:] = _pad_to(block, out_w, 0, value=_INT_MIN)
        return

    keys = key
    ranks = []
    for _ in range(n_easy):
        m = jnp.max(keys, axis=1, keepdims=True)
        keys = jnp.where(keys == m, _INT_MIN, keys)
        ranks.append(m.reshape(1, qt))
    ranks.append(jnp.max(keys, axis=1, keepdims=True).reshape(1, qt))
    # Output block is (slots, queries): TPU blocks need (8, 128)-aligned
    # trailing dims, which a (tile_q, n_easy+1) layout can't satisfy —
    # slots ride the sublane axis instead (out_w = 8).
    block = jnp.concatenate(ranks, axis=0)
    out_ref[:] = _pad_to(block, out_w, 0, value=_INT_MIN)


def _extract_candidates_grouped_kernel(
    q_ref,
    c_ref,
    cn_ref,
    out_ref,
    *,
    n_actual: int,
    tile_n: int,
    metric: str,
    compute_dtype,
    n_easy: int,
    out_w: int,
    group: int,
    row_scaled: bool = False,
    transposed: bool = False,
):
    """Group-reduced merge-free candidate extraction.

    The plain candidates kernel pays 2*n_easy+1 full-(QT, TILE_N) VPU
    passes per tile (max + mask per rank, plus the bound). Here the tile
    first reduces to per-slot best/second-best — reshape keys to
    (QT, GROUP, TILE_N/GROUP), 3 full passes — and the n_easy ranks are
    extracted from the 2*TILE_N/GROUP-wide reduced array (GROUP/2 x
    cheaper per rank). The per-tile bound stays rigorous: every
    non-extracted element is either still in the reduced array
    (<= max(remaining)) or was hidden behind its slot's top-2
    (<= that slot's r2 <= max(r2)), so bound = max(remaining, max r2).
    The price is a weaker bound than the exact kernel's (n_easy+1)-th
    best — max(r2) can reach the tile's 2nd-best when two strong rows
    share a slot — which the two-stage proof absorbs via its fallback.
    """
    j = pl.program_id(1)

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

    c_slots = tile_n // group
    keys3 = key.reshape(qt, group, c_slots)
    r1 = jnp.max(keys3, axis=1)                       # (qt, C)
    masked3 = jnp.where(keys3 == r1[:, None, :], _INT_MIN, keys3)
    r2 = jnp.max(masked3, axis=1)                     # (qt, C)
    reduced = jnp.concatenate([r1, r2], axis=1)       # (qt, 2C)

    keys = reduced
    ranks = []
    for _ in range(n_easy):
        m = jnp.max(keys, axis=1, keepdims=True)
        keys = jnp.where(keys == m, _INT_MIN, keys)
        ranks.append(m.reshape(1, qt))
    bound = jnp.maximum(
        jnp.max(keys, axis=1, keepdims=True),
        jnp.max(r2, axis=1, keepdims=True),
    )
    ranks.append(bound.reshape(1, qt))
    block = jnp.concatenate(ranks, axis=0)
    out_ref[:] = _pad_to(block, out_w, 0, value=_INT_MIN)


def flat_topk_candidates(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    metric: str = "dot",
    corpus_sqnorm: Optional[jnp.ndarray] = None,
    corpus_scale: Optional[jnp.ndarray] = None,
    tile_n: int = 2048,
    tile_q: int = 256,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    n_easy: int = 3,
    interpret: bool = False,
    corpus_transposed: bool = False,
    group: int = 0,
    corpus_lo: Optional[jnp.ndarray] = None,
    queries_lo: Optional[jnp.ndarray] = None,
    lane_slots: int = 0,
    lane_depth: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Run the candidate-extraction kernel over the full grid.

    Returns (cand_keys (Q, J*n_easy), bound_keys (Q, J), tile_n) in
    MAXIMIZE space (dot scores, or 2 q.c - ||c||^2 for l2): packed int32
    keys whose high 21 bits are the quantized bf16-matmul score and low
    bits the within-tile column. Global row id of a candidate =
    tile * tile_n + (tile_n - 1 - (key & mask)); see `_unpack_ids`.
    Every corpus element NOT among a tile's candidates has key <= that
    tile's bound key.

    corpus_transposed: corpus is stored (d, N), feeding each tile to the
    MXU as a plain (QT, d) x (d, TN) matmul — the (N, d) layout
    contracts dim 1 of both operands, inserting a corpus-tile transpose
    on the critical path.

    group > 0 selects the group-reduced kernel (3 full-tile VPU passes
    instead of 2*n_easy+1; slightly weaker per-tile bound — see
    `_extract_candidates_grouped_kernel`).

    corpus_lo/queries_lo select the bf16x2 kernel (hi/lo split scores,
    `_extract_candidates_x2_kernel`); corpus must then hold the bf16
    hi parts and queries the f32 originals (queries_lo = the rounding
    residues). Untransposed, ungrouped layout only.
    """
    n_q, d = queries.shape
    n = corpus.shape[1] if corpus_transposed else corpus.shape[0]
    tile_n = min(tile_n, _round_up(n, 128))
    tile_q = min(tile_q, _round_up(n_q, 8))
    assert tile_n <= 1 << _COL_BITS

    d_pad = _round_up(d, 128)
    q_pad = _round_up(n_q, tile_q)
    n_pad = _round_up(n, tile_n)
    q = _pad_to(_pad_to(queries, d_pad, 1), q_pad, 0)
    if corpus_transposed:
        c = _pad_to(_pad_to(corpus, d_pad, 0), n_pad, 1)
    else:
        c = _pad_to(_pad_to(corpus, d_pad, 1), n_pad, 0)

    if metric == "l2":
        if corpus_sqnorm is None:
            corpus_sqnorm = jnp.sum(
                corpus.astype(jnp.float32) * corpus.astype(jnp.float32),
                axis=0 if corpus_transposed else -1,
            )
        cn = _pad_to(corpus_sqnorm.astype(jnp.float32)[None, :], n_pad, 1)
    elif corpus_scale is not None:
        # int8 storage: fold per-row dequant scales into the tile scores
        assert metric == "dot", metric
        cn = _pad_to(corpus_scale.astype(jnp.float32)[None, :], n_pad, 1)
    else:
        cn = jnp.zeros((1, n_pad), jnp.float32)

    n_tiles = n_pad // tile_n
    assert n_easy < 8
    out_w = 8
    grid = (q_pad // tile_q, n_tiles)
    if corpus_lo is not None:
        assert not corpus_transposed and not group and corpus_scale is None
        q_lo = _pad_to(_pad_to(queries_lo, d_pad, 1), q_pad, 0)
        c_lo = _pad_to(_pad_to(corpus_lo, d_pad, 1), n_pad, 0)
        kernel = functools.partial(
            _extract_candidates_x2_kernel,
            n_actual=n,
            tile_n=tile_n,
            metric=metric,
            n_easy=n_easy,
            out_w=out_w,
        )
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_q, d_pad), lambda i, j: (i, 0)),
                pl.BlockSpec((tile_q, d_pad), lambda i, j: (i, 0)),
                pl.BlockSpec((tile_n, d_pad), lambda i, j: (j, 0)),
                pl.BlockSpec((tile_n, d_pad), lambda i, j: (j, 0)),
                pl.BlockSpec((1, tile_n), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((out_w, tile_q), lambda i, j: (j, i)),
            out_shape=jax.ShapeDtypeStruct(
                (n_tiles * out_w, q_pad), jnp.int32
            ),
            cost_estimate=pl.CostEstimate(
                flops=6 * q_pad * n_pad * d_pad,
                bytes_accessed=q_pad * d_pad * 8 + n_pad * d_pad * 4
                + q_pad * n_tiles * out_w * 4,
                transcendentals=0,
            ),
            interpret=interpret,
            **({} if interpret else _cand_compiler_params()),
        )(q, q_lo, c, c_lo, cn)
        out3 = out[:, :n_q].reshape(n_tiles, out_w, n_q)
        cand_keys = jnp.transpose(out3[:, :n_easy], (2, 0, 1)).reshape(
            n_q, n_tiles * n_easy
        )
        bound_keys = out3[:, n_easy].T
        return cand_keys, bound_keys, tile_n
    if group:
        assert tile_n % group == 0, (tile_n, group)
        kernel = functools.partial(
            _extract_candidates_grouped_kernel,
            n_actual=n,
            tile_n=tile_n,
            metric=metric,
            compute_dtype=compute_dtype,
            n_easy=n_easy,
            out_w=out_w,
            group=group,
            row_scaled=corpus_scale is not None,
            transposed=corpus_transposed,
        )
    else:
        if lane_slots:
            assert tile_n % lane_slots == 0 and (
                tile_n // lane_slots
            ) % 128 == 0, (tile_n, lane_slots)
        kernel = functools.partial(
            _extract_candidates_kernel,
            n_actual=n,
            tile_n=tile_n,
            metric=metric,
            compute_dtype=compute_dtype,
            n_easy=n_easy,
            out_w=out_w,
            row_scaled=corpus_scale is not None,
            transposed=corpus_transposed,
            lane_slots=lane_slots,
            lane_depth=lane_depth,
        )
    c_spec = (
        pl.BlockSpec((d_pad, tile_n), lambda i, j: (0, j))
        if corpus_transposed
        else pl.BlockSpec((tile_n, d_pad), lambda i, j: (j, 0))
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, d_pad), lambda i, j: (i, 0)),
            c_spec,
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((out_w, tile_q), lambda i, j: (j, i)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * out_w, q_pad), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * n_pad * d_pad,
            bytes_accessed=q_pad * d_pad * 4
            + n_pad * d_pad * corpus.dtype.itemsize
            + q_pad * n_tiles * out_w * 4,
            transcendentals=0,
        ),
        interpret=interpret,
        **({} if interpret else _cand_compiler_params()),
    )(q, c, cn)

    out3 = out[:, :n_q].reshape(n_tiles, out_w, n_q)
    cand_keys = jnp.transpose(out3[:, :n_easy], (2, 0, 1)).reshape(
        n_q, n_tiles * n_easy
    )
    bound_keys = out3[:, n_easy].T
    return cand_keys, bound_keys, tile_n


@functools.partial(
    jax.jit,
    static_argnames=("k_scan", "tile_n", "tile_q", "n_easy", "interpret"),
)
def flat_topk_scaled_candidates(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    corpus_scale: jnp.ndarray,
    k_scan: int,
    tile_n: int = 2048,
    tile_q: int = 256,
    n_easy: int = 7,
    interpret: bool = False,
) -> jnp.ndarray:
    """Candidate-id selection over a row-scaled (int8) corpus: ONE
    merge-free streamed pass + one small XLA top_k. Returns (Q, k_scan)
    ids (-1 padded).

    This is the int8 tier's stage-1: the running-merge kernel at its
    k_scan~100 over-retrieve pays an O(k_scan) per-tile op storm (and
    needed the slow fori merge to even fit VMEM). Selection here is
    capped at n_easy candidates per (query, corpus tile); a true
    candidate is lost only when >= n_easy rows of the SAME tile beat it
    on int8 score — negligible for k<<k_scan on non-adversarial data,
    and the exact refine step re-orders whatever is selected. Callers
    needing the exact int8-score ordering (refine disabled) must use the
    running-merge kernel instead.
    """
    q32 = queries.astype(jnp.float32)
    cand_keys, _, tn = flat_topk_candidates(
        q32,
        corpus,
        metric="dot",
        corpus_scale=corpus_scale,
        tile_n=tile_n,
        tile_q=tile_q,
        n_easy=n_easy,
        interpret=interpret,
    )
    k_scan = min(k_scan, cand_keys.shape[1])
    top_keys, pos = jax.lax.top_k(cand_keys, k_scan)
    ids = (pos // n_easy) * tn + (tn - 1 - (top_keys & _COL_MASK))
    return jnp.where(top_keys == _INT_MIN, -1, ids)


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
    corpus_bf16: Optional[jnp.ndarray] = None,
    use_pallas: Optional[bool] = None,
    tile_n: int = 1024,
    tile_q: int = 128,
    compute_dtype: jnp.dtype = jnp.float32,
    mode: str = "exact",
    exact_materialize_budget: int = 256 * 1024 * 1024,
    corpus_center: Optional[jnp.ndarray] = None,
    center_sqmax: Optional[jnp.ndarray] = None,
    corpus_bf16_lo: Optional[jnp.ndarray] = None,
    return_ok: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatching entry point: Pallas on TPU, pure-JAX elsewhere.

    return_ok=True appends a third element to the result: the two-stage
    regime's per-query residual-proof verdict ((Q,) bool — see
    `flat_topk_exact2_stream`), or None when any other regime served the
    call (no proof exists there; callers use None to mean "no signal").

    mode="scan" bypasses the two-stage machinery entirely and runs the
    chunked f32-HIGHEST scan — the right exact path for margin-free
    corpora where the residual proof cannot hold (DenseIndex selects it
    via its commit-time margin probe). corpus_bf16_lo upgrades the
    two-stage regime's stage 1 to the bf16x2 split.

    mode="exact" reproduces FAISS bit-exactly; mode="fast" uses the
    packed-key kernel (scores quantized to 21 bits, ~1e-6 relative).

    Exact-mode regime choice (measured on v5e, batch 512 x 100k x 384):
    XLA's materialized matmul+top_k runs the f32 HIGHEST contraction
    ~25% faster than the Pallas exact kernel, but needs Q*N*4 bytes of
    HBM for the score matrix. The dispatcher materializes when that
    fits `exact_materialize_budget` and streams through the Pallas
    kernel otherwise (large N or large batches), so callers always get
    the faster exact path without an HBM blowup.

    corpus_sqnorm / corpus_bf16 are optional serving caches consumed by
    the two-stage regime only (corpus_sqnorm also by the Pallas l2
    kernels); other regimes derive what they need from `corpus` and
    silently ignore corpus_bf16.
    """
    k = min(k, corpus.shape[0])

    def _no_ok(out):
        # regimes without a residual proof report "no signal"
        return out + (None,) if return_ok else out

    if mode == "scan":
        return _no_ok(flat_topk_scan(queries, corpus, k, metric=metric))
    on_tpu = _backend() == "tpu"
    if use_pallas is None:
        use_pallas = on_tpu
    if k > 128:
        # the fused kernels unroll k extraction steps; for large k the
        # materialized reference path is both faster and safer on VMEM
        use_pallas = False
    if (
        on_tpu
        and use_pallas
        and corpus_scale is None
        and metric in ("dot", "l2")
        and (mode == "fast" or jnp.dtype(compute_dtype) == jnp.float32)
        and mode in ("exact", "fast")
        and k <= 32
        and corpus.shape[0] >= TWO_STAGE_MIN_N
    ):
        # Two-stage regime: merge-free bf16 Pallas candidate extraction
        # -> f32 refine -> residual proof with full-scan fallback.
        # Returns results identical to the f32-HIGHEST scan over the
        # given corpus at a fraction of its cost, never materializes
        # anything Q*N-sized, and at this size the J = ceil(N/tile_n)
        # corpus tiles yield J*n_easy >= 2*k_scan candidates (healthy
        # proof margins). It also dominates the running-merge fast
        # kernel (measured: 9.4 vs 13.2 ms at 1M), so "fast" requests
        # land here too — they simply get exact results early.
        #
        # tile_n cap is SCALE-DEPENDENT (v5e, batch 512, ms/512q):
        # N=100k tn1024 1.18 vs tn2048 1.55; N=200k tn2048 2.26 vs
        # tn1024 2.74; tn2048 keeps winning at 400k/1M. Small N pipelines
        # better on the finer grid; large N pays candidate-glue growth
        # (J*n_easy keys through XLA top_k) — cross over ~150k.
        # tile_q/tile_n are HINTS here: the two-stage regime picks its
        # own measured optima by scale and batch (two_stage_tiles;
        # tile_q 512 only pays at big batches — 1M x b2048: 25.5 vs
        # 26.4 ms; neutral at 100k b2048; slower at batch 512).
        tq, tn = two_stage_tiles(
            corpus.shape[0], queries.shape[0], tile_q, tile_n
        )
        # Lane-sliced extraction (slots=16, depth=3) serves ONLY the
        # compute-bound big-batch regime (tn=2048 with the tq=512
        # batch>=2048 policy): chip A/B round 5 measured e2s 24.02 ->
        # 22.48 ms at 1M b2048 (+6.8%) with the proof holding (depth 2
        # stormed it: ~0.8%/query failures -> every 256-query slice
        # rescanned), while b512/tq256 is HBM-stream-bound and measured
        # a wash (8.21 vs 8.25 ms), as did tn=1024 at 100k b2048 (3.68
        # vs 3.62). The bf16x2 stage-1 ignores lane_slots (separate
        # kernel). See DESIGN.md round-5.
        ls, ld = (16, 3) if (tn == 2048 and tq == 512) else (0, 2)
        return flat_topk_exact2_stream(
            queries,
            corpus,
            k,
            metric=metric,
            k_scan=max(32, 2 * k),
            tile_n=tn,
            tile_q=tq,
            corpus_sqnorm=corpus_sqnorm,
            corpus_bf16=corpus_bf16,
            n_easy=4,
            interpret=not on_tpu,
            lane_slots=ls,
            lane_depth=ld,
            corpus_center=corpus_center,
            center_sqmax=center_sqmax,
            corpus_bf16_lo=corpus_bf16_lo,
            return_ok=return_ok,
        )
    if (
        mode == "exact"
        and on_tpu
        and use_pallas
        and corpus_scale is None
        and metric in ("dot", "l2")
        and jnp.dtype(compute_dtype) == jnp.float32
        and queries.shape[0] * corpus.shape[0] * 4
        <= exact_materialize_budget
    ):
        # Materialized exact regime for corpora under the two-stage
        # size gate: XLA's matmul+top_k beats the Pallas exact kernel
        # when the (Q, N) score matrix fits the budget.
        return _no_ok(flat_topk_ref(
            queries, corpus, k, metric=metric, compute_dtype=compute_dtype
        ))
    if use_pallas:
        if k > 32:
            # Large-k merges hold more live (tile_q, tile_n)/(tile_q, k)
            # copies on the kernel VMEM stack; measured: the int8 tier's
            # k_scan=100 over-retrieve at tile_n=1024 exceeds the 16MB
            # scoped limit by ~3MB at 1M rows. Halving the tiles keeps
            # every current regime comfortably under it.
            tile_n = min(tile_n, 512)
            tile_q = min(tile_q, 128)
        return _no_ok(_flat_topk_pallas_jit(
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
        ))
    return _no_ok(flat_topk_ref(
        queries, corpus, k, metric=metric, corpus_scale=corpus_scale
    ))
