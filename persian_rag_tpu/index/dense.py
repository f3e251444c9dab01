"""HBM-resident dense flat index.

Replaces the reference's FAISS ``IndexFlatL2`` usage (reference:
src/create_embeddings.py:125-136 build; src/retrieval.py:52-59 load,
:92-115 search) with a device-resident matrix searched by the fused
Pallas matmul+top-k kernel. Corpora larger than one chip shard row-wise
across the mesh's ``corpus`` axis with an ICI-merged per-shard top-k.

Semantics preserved for parity:
* metric="l2" returns squared L2 distances ascending (FAISS convention);
* tie-breaking prefers the lower row id;
* ids are insertion order (0..ntotal-1).

Additional metrics: "ip" (inner product, FAISS IndexFlatIP) and "cosine"
(vectors L2-normalized once at commit; search is then a dot product).
"""
from __future__ import annotations

import json
import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import functools

from persian_rag_tpu.index import faiss_io
from persian_rag_tpu.ops._merge import NEG_INF
from persian_rag_tpu.ops.flat_topk import (
    flat_topk,
    flat_topk_scaled_candidates,
)
from persian_rag_tpu.parallel.sharded_search import shard_corpus, sharded_flat_topk

_METRICS = ("l2", "ip", "cosine")

logger = logging.getLogger(__name__)


@functools.partial(jax.jit, static_argnames=("k",))
def _refine_topk(queries, refine_corpus, cand_ids, k):
    """Exact re-scoring of int8-scan candidates against the full-precision
    corpus rows: gather (Q, R, d) rows, one einsum, top-k. The gather
    touches only Q*R rows — the 4x-cheaper int8 stream does the N-scan."""
    rows = jnp.take(refine_corpus, jnp.maximum(cand_ids, 0), axis=0)
    scores = jnp.einsum(
        "qd,qrd->qr",
        queries.astype(jnp.float32),
        rows.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    scores = jnp.where(cand_ids >= 0, scores, NEG_INF)
    top_s, pos = jax.lax.top_k(scores, k)
    return top_s, jnp.take_along_axis(cand_ids, pos, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "k_scan", "metric", "compute_dtype", "mode", "use_pallas",
        "want_ok", "refine", "int8_cand", "add_center",
    ),
)
def _packed_search(
    q,
    corpus,
    sqnorms,
    scales,
    bf16img,
    stage1_center,
    center_sqmax,
    bf16lo,
    refine_corpus,
    center,
    *,
    k: int,
    k_scan: int,
    metric: str,
    compute_dtype,
    mode: str,
    use_pallas,
    want_ok: bool,
    refine: bool,
    int8_cand: bool,
    add_center: bool,
):
    """Single-dispatch serving tail: search + refine/center-shift + pack.

    On the relay each host<->device array transfer is a fixed ~15-35 ms
    round trip, so the old flow (query upload + separate np.asarray's
    for scores, ids, AND the proof verdict in _note_proof_verdict) paid
    ~3 readbacks around a 1-5 ms kernel. This wrapper runs the whole
    single-chip tail in one jit and packs (scores, ids[, ok]) into ONE
    int32 array: [bitcast(scores) | ids | ok?]. The container must be
    INT32 — int32 ids bitcast to f32 are denormals (< 2^23 -> zero
    exponent) and the TPU f32 path flushes them to 0 (measured on chip);
    integer transport preserves float bits exactly. The host detects
    whether the proof verdict column exists from the packed width
    (flat_topk legitimately reports ok=None from non-two-stage regimes).
    """
    if int8_cand:
        cand = flat_topk_scaled_candidates(q, corpus, scales, k_scan)
        scores, ids = _refine_topk(q, refine_corpus, cand, k)
        ok = None
    else:
        out = flat_topk(
            q,
            corpus,
            k_scan,
            metric=metric,
            corpus_sqnorm=sqnorms,
            corpus_scale=scales,
            corpus_bf16=bf16img,
            use_pallas=use_pallas,
            compute_dtype=compute_dtype,
            mode=mode,
            corpus_center=stage1_center,
            center_sqmax=center_sqmax,
            corpus_bf16_lo=bf16lo,
            return_ok=want_ok,
        )
        if want_ok:
            scores, ids, ok = out
        else:
            scores, ids = out
            ok = None
        if refine:
            scores, ids = _refine_topk(q, refine_corpus, ids, k)
        elif add_center:
            # centered storage serves <q, c - mu>; restore true values
            scores = scores + (q @ center)[:, None]
    cols = [
        jax.lax.bitcast_convert_type(
            scores.astype(jnp.float32), jnp.int32
        ),
        ids.astype(jnp.int32),
    ]
    if ok is not None:
        cols.append(ok.astype(jnp.int32)[:, None])
    return jnp.concatenate(cols, axis=1)


def _l2_normalize(x: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(norms, 1e-12)


def _round_bf16(x: np.ndarray) -> np.ndarray:
    """Host image of bf16 storage (ml_dtypes round-to-nearest-even —
    the same rounding jnp .astype(bfloat16) applies on device)."""
    import ml_dtypes

    return x.astype(ml_dtypes.bfloat16).astype(np.float32)


def _host_topk_ids(
    q: np.ndarray,
    mat: np.ndarray,
    metric: str,
    k: int,
    block: int = 131072,
) -> np.ndarray:
    """(qn, k) top-k ids over `mat` rows (score desc, lower id on
    ties), blocked over N so the probe never materializes a (qn, N)
    score matrix at 1M rows. metric 'l2' ranks by the serving path's
    maximize-space 2 q.c - ||c||^2 with sqnorms from `mat` itself
    (bf16 l2 serving derives its sqnorm cache from the STORED values,
    so the probe must too)."""
    n = mat.shape[0]
    k = min(k, n)
    cand_s = []
    cand_i = []
    for start in range(0, n, block):
        m = mat[start : start + block]
        s = q @ m.T
        if metric == "l2":
            s = 2.0 * s - np.einsum("nd,nd->n", m, m)[None, :]
        kk = min(k, s.shape[1])
        part = np.argpartition(-s, kth=kk - 1, axis=1)[:, :kk]
        cand_i.append(part + start)
        cand_s.append(np.take_along_axis(s, part, axis=1))
    cs = np.concatenate(cand_s, axis=1)
    ci = np.concatenate(cand_i, axis=1)
    out = np.empty((q.shape[0], k), np.int64)
    for qi in range(q.shape[0]):
        order = np.lexsort((ci[qi], -cs[qi]))[:k]
        out[qi] = ci[qi][order]
    return out


class DenseIndex:
    """Flat exact-search index over an (N, d) embedding matrix."""

    def __init__(
        self,
        dim: int,
        metric: str = "l2",
        mesh: Optional[Mesh] = None,
        compute_dtype: jnp.dtype = jnp.float32,
        use_pallas: Optional[bool] = None,
        storage_dtype: jnp.dtype = jnp.float32,
        search_mode: str = "exact",
        refine_dtype: Optional[str] = "float32",
        quality_floor: Optional[float] = 0.95,
        quality_fallback: str = "exact",
    ):
        """storage_dtype=bfloat16 halves HBM residency and bandwidth
        (Recall@10 ~0.99 isotropic; on real embedding geometry ~0.97
        for l2 and ~0.93 for dot/cosine, whose rows are stored
        mean-centered like the int8 tier — uncentered cosine-bf16
        measured 0.09 on the tight cone real embeddings occupy);
        storage_dtype=int8 quarters it (per-row absmax scales folded in
        post-matmul; dot/cosine only, single-chip) — int8 is a
        CANDIDATE-GENERATION tier: `search(refine_k=...)` over-retrieves
        on the int8 stream and re-ranks the candidates exactly against a
        `refine_dtype` copy (default float32; set refine_dtype=None to
        store the int8 tier alone and skip refinement). int8 rows are
        stored MEAN-CENTERED: real sentence embeddings share a dominant
        mean direction (the reference's shipped vectors have
        ||mean|| ~ 0.999 of the row norm after normalization), which
        compresses raw scores into a band narrower than int8 resolution
        — measured Recall@10 0.18 uncentered vs 0.995+ centered at 20k
        real-geometry rows. Centering is ranking-invariant
        (<q, c-mu> = <q, c> - <q, mu>, constant per query); the refine
        step restores exact scores, and no-refine searches add <q, mu>
        back. The hot N-row scan streams 4x less HBM; the refine gather
        touches only Q*R rows. search_mode="fast" uses the packed-key
        kernel (scores quantized to 21 bits, ordering may permute
        inside ~2^-12-relative ties). Defaults are bit-exact
        FAISS-parity behavior.

        quality_floor gates the APPROXIMATE tiers (bf16 storage; raw
        int8 with refine_dtype=None) on measured quality: commit()
        runs a sampled self-recall probe (held-out rows as queries,
        host-quantized storage image vs the exact f32 ranking) and,
        when the estimated Recall@10 falls below the floor, warns and
        falls back per quality_fallback — "exact" (f32 storage, the
        reference's always-exact FAISS behavior:
        /root/reference/src/retrieval.py:102), "int8_refine" (int8
        candidates + exact refine, which holds ~0.99 on real
        geometry), or "keep" (warn only). Motivation: bf16 storage
        measured R@10 0.9124 on clone-heavy real embedding geometry vs
        0.9953 isotropic — without the probe a user silently serves
        0.91 where the reference serves 1.0. quality_floor=None
        disables the probe (tier choice is then unconditionally
        yours). The probe verdict is recorded in `self.tier_probe`."""
        if metric not in _METRICS:
            raise ValueError(f"metric must be one of {_METRICS}, got {metric}")
        if jnp.dtype(storage_dtype) == jnp.int8:
            if metric == "l2":
                raise ValueError("int8 storage supports ip/cosine only")
            if mesh is not None and refine_dtype is None:
                raise ValueError(
                    "int8 storage on a mesh requires a refine copy "
                    "(the sharded tier re-scores per-shard candidates "
                    "exactly; raw int8-score serving is single-chip)"
                )
        self.dim = dim
        self.metric = metric
        self.mesh = mesh
        self.compute_dtype = compute_dtype
        self.use_pallas = use_pallas
        self.storage_dtype = jnp.dtype(storage_dtype)
        self.search_mode = search_mode
        self.refine_dtype = refine_dtype
        if quality_fallback not in ("exact", "int8_refine", "keep"):
            raise ValueError(
                "quality_fallback must be exact|int8_refine|keep"
            )
        self.quality_floor = quality_floor
        self.quality_fallback = quality_fallback
        # the tier the caller asked for: each commit re-probes it
        # against the (possibly grown) corpus rather than inheriting a
        # previous commit's demotion
        self._requested_storage = self.storage_dtype
        self._requested_refine = refine_dtype
        # commit-time tier-quality probe verdict (None until an
        # approximate tier is committed with quality_floor set):
        # {"estimated_recall", "floor", "tier", "demoted_to"}
        self.tier_probe: Optional[dict] = None
        self._pending: list[np.ndarray] = []
        self._device_corpus: Optional[jnp.ndarray] = None
        self._row_scales: Optional[jnp.ndarray] = None
        self._center: Optional[jnp.ndarray] = None  # int8: (d,) row mean
        self._refine_corpus: Optional[jnp.ndarray] = None
        # serving caches for the two-stage exact path: per-row ||c||^2
        # and (f32 storage only) the bf16 stage-1 corpus image. Without
        # them every bare search dispatch re-derives both from the full
        # corpus — several times the search kernel's own HBM traffic.
        self._sqnorms: Optional[jnp.ndarray] = None
        self._stage1_bf16: Optional[jnp.ndarray] = None
        # stage-1 centering (f32 storage): the bf16 image holds c - mu
        self._stage1_center: Optional[jnp.ndarray] = None
        self._center_sqmax: Optional[jnp.ndarray] = None
        # commit-time margin probe outcome: "bf16" (one-pass stage 1),
        # "bf16x2" (hi/lo split, 3 MXU passes, ~100x tighter proof
        # bound), or "scan" (margin-free corpus: the residual proof
        # cannot hold at any stage-1 precision, so exact serving goes
        # straight to the chunked f32 scan instead of paying a doomed
        # candidate pass per dispatch)
        self._stage1_mode: str = "bf16"
        self._stage1_lo: Optional[jnp.ndarray] = None
        # runtime stage-1 demotion: the commit-time probe sees 64
        # synthetic queries, not the live stream — on borderline
        # geometries real queries can proof-fail where the probe passed
        # (measured at 1M clustered: a wrong optimistic pick costs ~30%
        # vs going straight to the scan). search() counts consecutive
        # majority-fail dispatches and flips _stage1_mode to "scan".
        self._fail_streak = 0
        self._ntotal = 0

    # -- construction -------------------------------------------------------

    @property
    def ntotal(self) -> int:
        return self._ntotal + sum(v.shape[0] for v in self._pending)

    @property
    def d(self) -> int:  # FAISS-compatible alias
        return self.dim

    def add(self, vectors: np.ndarray) -> None:
        """Stage vectors host-side; `commit()` moves them to HBM."""
        vectors = np.asarray(vectors, dtype=np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.dim:
            raise ValueError(f"expected (n, {self.dim}), got {vectors.shape}")
        self._pending.append(vectors)

    def commit(self) -> None:
        """Materialize the index in device HBM (sharded if a mesh is set)."""
        if not self._pending and self._device_corpus is not None:
            return
        parts = []
        if self._device_corpus is not None:
            # dequantize bf16/int8 storage back to f32 (inline — calling
            # vectors() here would recurse through commit()); prefer the
            # full-precision refine copy when one is kept
            if self._refine_corpus is not None:
                existing = np.asarray(self._refine_corpus.astype(jnp.float32))
            else:
                existing = np.asarray(self._device_corpus.astype(jnp.float32))
                if self._row_scales is not None:
                    existing = existing * np.asarray(self._row_scales)[:, None]
                if self._center is not None:
                    existing = existing + np.asarray(self._center)[None, :]
            parts.append(existing[: self._ntotal])
        parts.extend(self._pending)
        if not parts:
            raise ValueError("index is empty")
        corpus = np.concatenate(parts, axis=0)
        if self.metric == "cosine":
            corpus = _l2_normalize(corpus)
        self._pending.clear()
        self._ntotal = corpus.shape[0]
        self._sqnorms = None
        self._stage1_bf16 = None
        self._stage1_center = None
        self._center_sqmax = None
        self._stage1_mode = "bf16"
        self._stage1_lo = None
        self._fail_streak = 0
        self._center = None
        self.tier_probe = None
        if self.quality_floor is not None:
            self.storage_dtype = self._requested_storage
            self.refine_dtype = self._requested_refine
            self._apply_quality_gate(corpus)
        if self.storage_dtype == jnp.int8:
            # quantize mean-CENTERED rows: ranking-invariant, and on real
            # (anisotropic) embedding geometry it is the difference
            # between Recall@10 ~0.18 and ~0.995 (see class docstring)
            center = corpus.mean(axis=0).astype(np.float32)
            centered = corpus - center[None, :]
            absmax = np.abs(centered).max(axis=1)
            scales = np.maximum(absmax / 127.0, 1e-12).astype(np.float32)
            values = np.clip(
                np.rint(centered / scales[:, None]), -127, 127
            ).astype(np.int8)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                from persian_rag_tpu.core.mesh import (
                    CORPUS_AXIS,
                    replicated_sharding,
                )

                self._device_corpus, _ = shard_corpus(
                    jnp.asarray(values), self.mesh
                )
                n_pad = self._device_corpus.shape[0]
                scales_p = np.zeros(n_pad, np.float32)
                scales_p[: scales.shape[0]] = scales
                self._row_scales = jax.device_put(
                    jnp.asarray(scales_p),
                    NamedSharding(self.mesh, P(CORPUS_AXIS)),
                )
                self._refine_corpus, _ = shard_corpus(
                    jnp.asarray(corpus).astype(self.refine_dtype),
                    self.mesh,
                )
                self._center = jax.device_put(
                    jnp.asarray(center), replicated_sharding(self.mesh)
                )
                return
            self._center = jax.device_put(jnp.asarray(center))
            self._row_scales = jax.device_put(jnp.asarray(scales))
            self._device_corpus = jax.device_put(jnp.asarray(values))
            if self.refine_dtype is not None:
                self._refine_corpus = jax.device_put(
                    jnp.asarray(corpus).astype(self.refine_dtype)
                )
            return
        # bf16 storage for dot/cosine stores MEAN-CENTERED rows, exactly
        # like the int8 tier: real embeddings concentrate in a tight
        # cone, and the discriminative part of a raw dot is smaller than
        # bf16's 8-bit mantissa step (measured Recall@10 0.09 uncentered
        # vs ~0.93 centered on real-geometry cosine — the residual
        # misses are near-ties inside bf16's own mantissa step; the
        # int8+refine tier is the high-recall compact option). The shift
        # <q, mu> is restored after search; ranking is unchanged. l2
        # keeps uncentered storage (its ranking information rides the
        # exact f32 ||c||^2 cache, measured unaffected).
        store_src = corpus
        if self.storage_dtype == jnp.bfloat16 and self.metric != "l2":
            center = corpus.mean(axis=0).astype(np.float32)
            store_src = corpus - center[None, :]
            if self.mesh is not None:
                from persian_rag_tpu.core.mesh import replicated_sharding

                self._center = jax.device_put(
                    jnp.asarray(center), replicated_sharding(self.mesh)
                )
            else:
                self._center = jax.device_put(jnp.asarray(center))
        arr = jnp.asarray(store_src).astype(self.storage_dtype)
        if self.mesh is not None:
            arr, _ = shard_corpus(arr, self.mesh)
        else:
            arr = jax.device_put(arr)
        # two-stage serving caches, derived on device from the STORED
        # values with the SAME expression the search path would
        # otherwise evaluate per call (bit-identical csq keeps the l2
        # refine equal to the reference scan). On a mesh these follow
        # the corpus row sharding (GSPMD propagates it), so each shard's
        # local search consumes its own slice.
        a32 = arr.astype(jnp.float32)
        self._sqnorms = jnp.sum(a32 * a32, axis=-1)
        if arr.dtype != jnp.bfloat16:
            # stage-1 image is MEAN-CENTERED: the uncentered bf16 proof
            # fails on every batch of real embedding geometry (rows in
            # a tight cone -> score spread below the bf16 rounding
            # bound), silently degrading the exact path to its
            # full-scan fallback. Centering is ranking-invariant; the
            # two-stage path translates its bound by <q, mu> and uses
            # the centered norms for eps (flat_topk_exact2_stream).
            mu = jnp.mean(a32, axis=0)
            centered = a32 - mu[None, :]
            if self.mesh is not None:
                from persian_rag_tpu.core.mesh import replicated_sharding

                rep = replicated_sharding(self.mesh)
                self._stage1_center = jax.device_put(mu, rep)
                self._center_sqmax = jax.device_put(
                    jnp.max(jnp.sum(centered * centered, axis=-1)), rep
                )
            else:
                self._stage1_center = mu
                self._center_sqmax = jnp.max(
                    jnp.sum(centered * centered, axis=-1)
                )
            hi = centered.astype(jnp.bfloat16)
            self._stage1_bf16 = hi
            self._stage1_mode = self._probe_stage1_mode(a32, centered)
            if self._stage1_mode == "bf16x2":
                self._stage1_lo = (
                    centered - hi.astype(jnp.float32)
                ).astype(jnp.bfloat16)
        self._device_corpus = arr

    def _apply_quality_gate(self, corpus: np.ndarray) -> None:
        """Commit-time recall probe over the APPROXIMATE storage tiers.

        The exact path is already guarded per dispatch (residual proof
        + runtime demotion), but nothing used to gate the approximate
        tiers themselves: bf16 storage measured Recall@10 0.9124 on
        clone-heavy real embedding geometry (vs 0.9953 isotropic), so
        a user picking storage_dtype=bfloat16 there silently served
        0.91 where the reference's always-exact FAISS serves 1.0
        (/root/reference/src/retrieval.py:102). Held-out corpus rows
        query a host-quantized image of the would-be storage; if the
        estimated R@10 vs the exact f32 ranking falls below
        quality_floor, the tier is demoted per quality_fallback
        BEFORE any device materialization."""
        approx_tier = self.storage_dtype == jnp.bfloat16 or (
            self.storage_dtype == jnp.int8 and self.refine_dtype is None
        )
        n = corpus.shape[0]
        if not approx_tier or n < 128:
            return
        est = self._estimate_tier_recall(corpus)
        tier = (
            "bfloat16" if self.storage_dtype == jnp.bfloat16 else "int8"
        )
        self.tier_probe = {
            "tier": tier,
            "estimated_recall": est,
            "floor": self.quality_floor,
            "demoted_to": None,
        }
        if est >= self.quality_floor:
            return
        if self.quality_fallback == "keep":
            logger.warning(
                "%s storage tier probe estimates Recall@10=%.4f < "
                "floor %.2f on this corpus geometry (quality_fallback="
                "'keep': serving the approximate tier anyway)",
                tier, est, self.quality_floor,
            )
            return
        if self.quality_fallback == "int8_refine" and self.metric != "l2":
            # int8 candidates + exact refine holds ~0.99 on real
            # geometry (mean-centered quantization, over-retrieve 10x)
            self.storage_dtype = jnp.dtype(jnp.int8)
            self.refine_dtype = self.refine_dtype or "float32"
            demoted = "int8_refine"
        else:
            self.storage_dtype = jnp.dtype(jnp.float32)
            demoted = "exact"
        self.tier_probe["demoted_to"] = demoted
        logger.warning(
            "%s storage tier probe estimates Recall@10=%.4f < floor "
            "%.2f on this corpus geometry: demoting to %s "
            "(set quality_floor=None to keep the tier unconditionally)",
            tier, est, self.quality_floor, demoted,
        )

    def _estimate_tier_recall(
        self, corpus: np.ndarray, qn: int = 64, k: int = 10
    ) -> float:
        """Sampled self-recall of the approximate tier vs the exact f32
        ranking, both computed host-side in f32 (this isolates the
        QUANTIZATION loss — matmul precision on device is separately
        covered by the exact path's residual proof)."""
        n, d = corpus.shape
        rng = np.random.default_rng(n ^ (d << 20))
        idx = rng.choice(n, size=min(qn, n), replace=False)
        q = np.ascontiguousarray(corpus[idx], dtype=np.float32)
        # The centered tiers serve <q, c - mu> with the ORIGINAL query
        # (the <q, mu> shift is constant per query, so ranking is
        # unchanged); the probe scores the same way.
        if self.storage_dtype == jnp.bfloat16:
            if self.metric != "l2":
                mu = corpus.mean(axis=0, dtype=np.float64).astype(
                    np.float32
                )
                store = _round_bf16(corpus - mu[None, :])
            else:
                store = _round_bf16(corpus)
        else:  # raw int8 (mirrors the centered per-row-absmax commit)
            mu = corpus.mean(axis=0).astype(np.float32)
            centered = corpus - mu[None, :]
            absmax = np.abs(centered).max(axis=1)
            scales = np.maximum(absmax / 127.0, 1e-12).astype(np.float32)
            store = (
                np.clip(np.rint(centered / scales[:, None]), -127, 127)
                * scales[:, None]
            ).astype(np.float32)
        want = _host_topk_ids(q, corpus, self.metric, k)
        got = _host_topk_ids(q, store, self.metric, k)
        hits = sum(
            len(set(got[i]) & set(want[i])) for i in range(want.shape[0])
        )
        return hits / float(want.size)

    def _probe_stage1_mode(self, a32, centered) -> str:
        """Commit-time margin probe: can the two-stage residual proof be
        expected to HOLD on this corpus's geometry?

        The proof needs (kth refined score) - (candidate bound) > eps.
        Real embedding corpora are near-tie continuums around the top-k
        boundary — measured 0/20 batches passing at 500k real-geometry
        rows with the plain bf16 stage — so probing 64 synthetic queries
        (perturbed corpus rows) against the centered corpus picks the
        cheapest stage-1 whose eps clears the observed gaps with 2x
        slack. A wrong pick costs speed only (the per-dispatch proof
        still guards exactness)."""
        import jax.random as jrandom

        from persian_rag_tpu.ops.flat_topk import (
            TWO_STAGE_MIN_N,
            _bf16_matmul_eps,
            _bf16x2_matmul_eps,
        )

        n, d = a32.shape
        if n < TWO_STAGE_MIN_N:
            return "bf16"  # two-stage regime not engaged below this
        pn = 64
        key = jrandom.PRNGKey(n)
        k1, k2 = jrandom.split(key)
        idx = jrandom.randint(k1, (pn,), 0, n)
        probe = a32[idx] + 0.05 * jnp.std(a32) * jrandom.normal(
            k2, (pn, d), jnp.float32
        )
        # the ~1e-5-scale gaps this probe must resolve sit far below
        # the TPU default matmul precision (bf16 truncation, ~1e-3
        # noise on unit-norm scores) — unpinned, the pick would be
        # noise-driven, not geometry-driven. HIGHEST costs 3 passes of
        # a (64, N) matmul, once, at commit.
        s = jnp.einsum(
            "qd,nd->qn", probe, centered,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if self.metric == "l2":
            # measure gaps in the l2 MAXIMIZE space 2 q.c - ||c||^2
            # (per-query gaps are invariant to the centering shift, so
            # the centered dot + the stored-row sqnorms reproduce the
            # true-space gaps exactly)
            s = 2.0 * s - jnp.sum(a32 * a32, axis=-1)[None, :]
        top = jax.lax.top_k(s, 33)[0]
        gap = np.asarray(top[:, 9] - top[:, 32])
        qn = np.asarray(jnp.linalg.norm(probe, axis=1))
        err_f = 2.0 if self.metric == "l2" else 1.0
        cn = float(np.sqrt(np.asarray(self._center_sqmax)))
        eps16 = err_f * _bf16_matmul_eps(d) * qn * cn
        eps_x2 = err_f * _bf16x2_matmul_eps(d) * qn * cn
        if (gap > 2.0 * eps16).all():
            return "bf16"
        if (gap > 2.0 * eps_x2).all():
            return "bf16x2"
        return "scan"

    DEMOTE_STREAK = 3  # consecutive majority-fail dispatches before demotion

    def _note_proof_verdict(self, ok) -> None:
        """Runtime stage-1 demotion from the live proof-verdict stream.

        The commit-time margin probe judges 64 synthetic queries; real
        serving queries can sit deeper inside near-clone clusters and
        proof-fail where the probe passed (measured at 1M clustered
        geometry: bf16x2 two-stage 74.8 ms vs 58.4 ms for the plain
        chunked scan once the fallback storm sets in — a wrong
        optimistic pick costs ~30%, never exactness). Each exact
        dispatch through the two-stage regime reports its per-query
        verdict; a dispatch where the MAJORITY of queries failed counts
        toward a streak, and DEMOTE_STREAK consecutive such dispatches
        flip `_stage1_mode` to "scan" (sticky until the next commit).
        `ok` is None when a non-two-stage regime served the call —
        no evidence either way, the streak is left untouched.
        """
        if ok is None:
            return
        ok = np.asarray(ok)
        if ok.size == 0:
            return
        if float(ok.mean()) < 0.5:
            self._fail_streak += 1
            if (
                self._fail_streak >= self.DEMOTE_STREAK
                and self._stage1_mode != "scan"
            ):
                logger.warning(
                    "two-stage residual proof majority-failed %d "
                    "consecutive dispatches (stage1=%s): demoting exact "
                    "serving to the chunked f32 scan for this corpus",
                    self._fail_streak,
                    self._stage1_mode,
                )
                self._stage1_mode = "scan"
                self._stage1_lo = None
        else:
            self._fail_streak = 0

    # -- search -------------------------------------------------------------

    def search(
        self, queries: np.ndarray, k: int, refine_k: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batch exact search.

        Returns (scores, ids), each (Q, k):
        * l2      -> squared distances, ascending (FAISS IndexFlatL2)
        * ip      -> inner products, descending  (FAISS IndexFlatIP)
        * cosine  -> cosine similarities, descending

        refine_k (int8 storage with a refine copy only): over-retrieve
        refine_k candidates on the int8 stream, then re-score them
        exactly against the refine-dtype rows. Defaults to
        max(10*k, 100) when a refine copy exists; pass refine_k=0 to
        force the raw int8 scores.
        """
        if self._pending:
            self.commit()
        if self._device_corpus is None:
            raise ValueError("index is empty; add() + commit() first")
        queries = np.asarray(queries, dtype=np.float32)
        squeeze = False
        if queries.ndim == 1:
            queries = queries[None, :]
            squeeze = True
        if self.metric == "cosine":
            queries = _l2_normalize(queries)
        q = jnp.asarray(queries)
        metric = "l2" if self.metric == "l2" else "dot"
        k = min(k, self._ntotal)
        if self.mesh is not None and self.storage_dtype == jnp.int8:
            from persian_rag_tpu.parallel.sharded_search import (
                sharded_int8_topk,
            )

            k_scan = min(
                max(refine_k or max(10 * k, 100), k), self._ntotal
            )
            scores, ids = sharded_int8_topk(
                q,
                self._device_corpus,
                self._row_scales,
                self._refine_corpus,
                k,
                self._ntotal,
                self.mesh,
                k_scan=k_scan,
                use_pallas=self.use_pallas,
            )
        elif self.mesh is not None:
            from persian_rag_tpu.core.mesh import DATA_AXIS
            from persian_rag_tpu.parallel.sharded_search import (
                sharded_flat_topk_2d,
            )

            # With a data axis in the mesh, queries shard over it (each
            # device scans its corpus rows for its query slice) instead
            # of every corpus shard redundantly scanning the full batch.
            if (
                self.mesh.shape.get(DATA_AXIS, 1) > 1
                and queries.shape[0] >= self.mesh.shape[DATA_AXIS]
            ):
                search_fn = sharded_flat_topk_2d
            else:
                search_fn = sharded_flat_topk
            mode_eff = (
                "scan"
                if self._stage1_mode == "scan"
                and self.search_mode == "exact"
                else self.search_mode
            )
            scores, ids = search_fn(
                q,
                self._device_corpus,
                k,
                self._ntotal,
                self.mesh,
                metric=metric,
                use_pallas=self.use_pallas,
                compute_dtype=self.compute_dtype,
                mode=mode_eff,
                corpus_sqnorm_sharded=self._sqnorms,
                corpus_bf16_sharded=self._stage1_bf16,
                corpus_center=self._stage1_center,
                center_sqmax=self._center_sqmax,
                corpus_bf16_lo_sharded=self._stage1_lo,
            )
            if self._center is not None:
                # centered bf16 storage: restore the <q, mu> shift
                scores = scores + (q @ self._center)[:, None]
        else:
            compute = self.compute_dtype
            refine = (
                self.storage_dtype == jnp.int8
                and self._refine_corpus is not None
                and refine_k != 0
            )
            if self.storage_dtype == jnp.int8:
                # int8 values are exact in bf16; bf16 matmul is lossless
                # on the quantized corpus and uses the fast MXU path
                compute = jnp.bfloat16
            k_scan = k
            if refine:
                k_scan = min(
                    max(refine_k or max(10 * k, 100), k), self._ntotal
                )
            # int8 fast path: merge-free candidate selection + exact
            # refine (the running-merge kernel's k_scan~100
            # over-retrieve is an order of magnitude slower)
            int8_cand = self._int8_candidates_ok(refine, metric, k_scan)
            mode_eff = (
                "scan"
                if self._stage1_mode == "scan"
                and self.search_mode == "exact"
                else self.search_mode
            )
            # exact serving reads back the two-stage proof verdict so a
            # wrong commit-probe pick self-corrects under the live query
            # stream (see _note_proof_verdict); the verdict rides the
            # same packed readback as scores/ids instead of its own
            # synchronous transfer
            want_ok = (
                not int8_cand
                and self.search_mode == "exact"
                and mode_eff != "scan"
            )
            packed = _packed_search(
                q,
                self._device_corpus,
                self._sqnorms,
                self._row_scales,
                self._stage1_bf16,
                self._stage1_center,
                self._center_sqmax,
                self._stage1_lo,
                self._refine_corpus,
                self._center,
                k=k,
                k_scan=k_scan,
                metric=metric,
                compute_dtype=compute,
                mode=mode_eff,
                use_pallas=self.use_pallas,
                want_ok=want_ok,
                refine=refine,
                int8_cand=int8_cand,
                add_center=(self._center is not None and not refine),
            )
            arr = np.asarray(packed)
            scores = np.ascontiguousarray(arr[:, :k]).view(np.float32)
            ids = np.ascontiguousarray(arr[:, k : 2 * k])
            if arr.shape[1] > 2 * k:
                self._note_proof_verdict(arr[:, 2 * k] != 0)
            elif want_ok:
                # a non-two-stage regime served the call: no proof
                # verdict exists; keep the counter hook's None contract
                self._note_proof_verdict(None)
            if squeeze:
                return scores[0], ids[0]
            return scores, ids
        scores = np.asarray(scores)
        ids = np.asarray(ids)
        if squeeze:
            return scores[0], ids[0]
        return scores, ids

    def _int8_candidates_ok(
        self, refine: bool, metric: str, k_scan: int
    ) -> bool:
        """Whether the int8 tier's stage-1 can use merge-free candidate
        selection: refine must re-rank (it fixes selection's per-tile
        cap), and the candidate POOL must dominate the over-retrieve —
        flat_topk_scaled_candidates extracts n_easy=7 keys per 2048-row
        tile, so require ceil(n/2048)*7 >= 2*k_scan (at k_scan=100 that
        is n >= ~58.5k; smaller corpora keep the running-merge kernel,
        whose per-tile depth is k_scan itself)."""
        pool = -(-self._ntotal // 2048) * 7
        return (
            refine
            and metric == "dot"
            and pool >= 2 * k_scan
            and jax.default_backend() == "tpu"
        )

    def search_device(
        self,
        queries: jnp.ndarray,
        k: int,
        corpus: Optional[jnp.ndarray] = None,
        row_scales: Optional[jnp.ndarray] = None,
        refine_corpus: Optional[jnp.ndarray] = None,
        sqnorms: Optional[jnp.ndarray] = None,
        stage1_bf16: Optional[jnp.ndarray] = None,
        center: Optional[jnp.ndarray] = None,
        stage1_center: Optional[jnp.ndarray] = None,
        center_sqmax: Optional[jnp.ndarray] = None,
        stage1_lo: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Jittable single-chip search: no host transfers, traced queries OK.

        When called inside an outer jit, pass the corpus (and int8 row
        scales / refine copy / two-stage caches) explicitly as traced
        ARGUMENTS — closing over multi-hundred-MB device constants inside
        a jit breaks remote compilation paths and defeats donation.
        `fused_args()` supplies them.
        """
        if self.mesh is not None:
            raise ValueError("search_device is single-chip; use search()")
        if corpus is None:
            corpus = self._device_corpus
        if row_scales is None:
            row_scales = self._row_scales
        if refine_corpus is None:
            refine_corpus = self._refine_corpus
        if sqnorms is None:
            sqnorms = self._sqnorms
        if stage1_bf16 is None:
            stage1_bf16 = self._stage1_bf16
        if center is None:
            center = self._center
        if stage1_center is None:
            stage1_center = self._stage1_center
        if center_sqmax is None:
            center_sqmax = self._center_sqmax
        if stage1_lo is None:
            stage1_lo = self._stage1_lo
        if corpus is None:
            raise ValueError("index is empty; add() + commit() first")
        if self.metric == "cosine":
            norms = jnp.linalg.norm(queries, axis=1, keepdims=True)
            queries = queries / jnp.maximum(norms, 1e-12)
        metric = "l2" if self.metric == "l2" else "dot"
        compute = self.compute_dtype
        refine = self.storage_dtype == jnp.int8 and refine_corpus is not None
        if self.storage_dtype == jnp.int8:
            compute = jnp.bfloat16
        k = min(k, self._ntotal)
        k_scan = min(max(10 * k, 100), self._ntotal) if refine else k
        queries = queries.astype(jnp.float32)
        if self._int8_candidates_ok(refine, metric, k_scan):
            cand = flat_topk_scaled_candidates(
                queries, corpus, row_scales, k_scan
            )
            return _refine_topk(queries, refine_corpus, cand, k)
        mode_eff = (
            "scan"
            if self._stage1_mode == "scan" and self.search_mode == "exact"
            else self.search_mode
        )
        scores, ids = flat_topk(
            queries,
            corpus,
            k_scan,
            metric=metric,
            corpus_sqnorm=sqnorms,
            corpus_scale=row_scales,
            corpus_bf16=stage1_bf16,
            use_pallas=self.use_pallas,
            compute_dtype=compute,
            mode=mode_eff,
            corpus_center=stage1_center,
            center_sqmax=center_sqmax,
            corpus_bf16_lo=stage1_lo,
        )
        if refine:
            scores, ids = _refine_topk(queries, refine_corpus, ids, k)
        elif center is not None:
            scores = scores + (queries @ center)[:, None]
        return scores, ids

    def fused_args(self) -> Tuple[Optional[jnp.ndarray], ...]:
        """(corpus, row_scales, refine_corpus, sqnorms, stage1_bf16,
        center, stage1_center, center_sqmax, stage1_lo) device arrays to
        pass into a jitted function that calls `search_device` with
        them."""
        if self._pending:
            self.commit()
        return (
            self._device_corpus,
            self._row_scales,
            self._refine_corpus,
            self._sqnorms,
            self._stage1_bf16,
            self._center,
            self._stage1_center,
            self._center_sqmax,
            self._stage1_lo,
        )

    # -- persistence --------------------------------------------------------

    def rows(self, row_ids: np.ndarray) -> np.ndarray:
        """Dequantized f32 copies of the given rows via ONE device gather
        (vectors() downloads the whole corpus — ruinous for a rerank that
        needs a few hundred rows out of a million)."""
        if self._pending:
            self.commit()
        idx = jnp.asarray(np.asarray(row_ids, np.int32))
        if self._refine_corpus is not None:
            out = jnp.take(self._refine_corpus, idx, axis=0).astype(
                jnp.float32
            )
        else:
            out = jnp.take(self._device_corpus, idx, axis=0).astype(
                jnp.float32
            )
            if self._row_scales is not None:
                out = out * jnp.take(self._row_scales, idx)[:, None]
            if self._center is not None:
                out = out + self._center[None, :]
        return np.asarray(out)

    def vectors(self) -> np.ndarray:
        """Host copy of the committed corpus as float32 (cosine:
        normalized form; bf16/int8 storage: the dequantized values)."""
        if self._pending:
            self.commit()
        if self._refine_corpus is not None:
            out = np.asarray(self._refine_corpus.astype(jnp.float32))
        else:
            out = np.asarray(self._device_corpus.astype(jnp.float32))
            if self._row_scales is not None:
                out = out * np.asarray(self._row_scales)[:, None]
            if self._center is not None:
                out = out + np.asarray(self._center)[None, :]
        return out[: self._ntotal]

    def save(self, path: str) -> None:
        """Native format: .npz payload + .json sidecar metadata."""
        if self._pending:
            self.commit()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path if path.endswith(".npz") else path + ".npz",
                 vectors=self.vectors())
        meta = {"dim": self.dim, "metric": self.metric, "ntotal": self._ntotal}
        with open(_meta_path(path), "w", encoding="utf-8") as f:
            json.dump(meta, f)

    @classmethod
    def load(
        cls,
        path: str,
        mesh: Optional[Mesh] = None,
        **kwargs,
    ) -> "DenseIndex":
        npz = path if path.endswith(".npz") else path + ".npz"
        with open(_meta_path(path), "r", encoding="utf-8") as f:
            meta = json.load(f)
        vectors = np.load(npz)["vectors"]
        index = cls(meta["dim"], metric=meta["metric"], mesh=mesh, **kwargs)
        index.add(vectors)
        index.commit()
        return index

    def export_faiss(self, path: str) -> None:
        """Write a faiss-loadable flat index file."""
        metric = "l2" if self.metric == "l2" else "ip"
        faiss_io.write_faiss_flat(path, self.vectors(), metric=metric)

    @classmethod
    def from_faiss(
        cls, path: str, mesh: Optional[Mesh] = None, **kwargs
    ) -> "DenseIndex":
        """Import a FAISS IndexFlatL2/IndexFlatIP file (e.g. the
        reference's shipped results/faiss/*.index artifacts)."""
        vectors, metric = faiss_io.read_faiss_flat(path)
        index = cls(vectors.shape[1], metric=metric, mesh=mesh, **kwargs)
        index.add(vectors)
        index.commit()
        return index


def _meta_path(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".meta.json"
