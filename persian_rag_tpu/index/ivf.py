"""IVF (inverted-file) coarse-quantized index.

The reference builds a FAISS IVF index for corpora over 1000 vectors
(reference: scripts/phase3_pdf_chunking.py:39-71 — nlist =
clip(n/20, 10, 100), trained on <=10k samples). TPU-native rebuild:

* training is on-device Lloyd k-means (assignment via the flat-search
  kernel, centroid update via segment_sum);
* cells are padded to a fixed capacity so search is entirely static
  shapes: queries -> top-nprobe centroids -> gather those cells'
  (cap, d) blocks -> masked matmul + top-k;
* rows that overflow a cell's capacity spill to an always-searched
  overflow block, so results lose no vectors (exactness degrades only
  through the coarse quantization itself, never through truncation).

Use this for single-query/low-latency serving over very large corpora:
a probe touches nprobe*cap rows instead of N. For large query batches
the flat index is usually faster on TPU (the corpus is streamed once
for the whole batch).
"""
from __future__ import annotations

import functools
import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from persian_rag_tpu.ops.flat_topk import flat_topk_ref


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "metric", "has_overflow")
)
def _ivf_search_step(
    q,
    centroids,
    cells,
    cell_ids,
    overflow,
    overflow_ids,
    *,
    k: int,
    nprobe: int,
    metric: str,
    has_overflow: bool,
):
    """Pure jitted probe-and-scan: coarse top-nprobe centroids, gather
    those cells' capacity-padded blocks, masked matmul + top-k, plus the
    always-scanned overflow block. All large arrays are ARGUMENTS (never
    closed over — large jit constants break remote compile paths).

    Returns (scores maximized, ids); for l2 the scores are negated
    squared distances (callers flip sign).
    """
    descending = metric != "l2"
    _, probe_cells = flat_topk_ref(q, centroids, nprobe, metric="l2")
    gathered = jnp.take(cells, probe_cells, axis=0)  # (Q, P, cap, d)
    gathered_ids = jnp.take(cell_ids, probe_cells, axis=0)  # (Q, P, cap)
    qn, p, cap, d = gathered.shape
    flat = gathered.reshape(qn, p * cap, d)
    ids = gathered_ids.reshape(qn, p * cap)
    # precision pinned: TPU's default f32 matmul path truncates to
    # bf16, which cannot rank real embedding geometry (tight-cone dots
    # differ below bf16 resolution) — measured R@10 0.58-0.90 varying
    # by SHAPE at 100k real-geometry rows vs 0.97 with exact scores.
    # The probe touches only nprobe*cap rows, so HIGHEST is ~free.
    scores = jnp.einsum(
        "qd,qnd->qn", q, flat, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric == "l2":
        d2 = (
            jnp.sum(q * q, axis=1, keepdims=True)
            - 2.0 * scores
            + jnp.sum(flat * flat, axis=2)
        )
        scores = -d2
    if has_overflow:
        o_scores = jnp.einsum(
            "qd,nd->qn", q, overflow, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if metric == "l2":
            o_d2 = (
                jnp.sum(q * q, axis=1, keepdims=True)
                - 2.0 * o_scores
                + jnp.sum(overflow * overflow, axis=1)[None]
            )
            o_scores = -o_d2
        scores = jnp.concatenate([scores, o_scores], axis=1)
        ids = jnp.concatenate(
            [
                ids,
                jnp.broadcast_to(
                    overflow_ids[None], (qn, overflow_ids.shape[0])
                ),
            ],
            axis=1,
        )
    scores = jnp.where(ids >= 0, scores, -3.0e38)
    k_eff = min(k, scores.shape[1])
    top_s, pos = jax.lax.top_k(scores, k_eff)
    top_i = jnp.take_along_axis(ids, pos, axis=1)
    if k_eff < k:
        top_s = jnp.pad(
            top_s, ((0, 0), (0, k - k_eff)), constant_values=-3.0e38
        )
        top_i = jnp.pad(top_i, ((0, 0), (0, k - k_eff)), constant_values=-1)
    del descending
    return top_s, top_i.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "nprobe", "metric", "has_overflow", "query_chunk", "flip"
    ),
)
def _ivf_search_packed(
    qs,
    centroids,
    cells,
    cell_ids,
    overflow,
    overflow_ids,
    *,
    k: int,
    nprobe: int,
    metric: str,
    has_overflow: bool,
    query_chunk: int,
    flip: bool,
):
    """Whole-batch serving dispatch: lax.map over query chunks + packed
    (scores | ids) readback.

    The host chunk loop paid (1 upload + 2 readbacks) PER 16-query
    chunk — each relay transfer is a fixed ~15-35 ms round trip, so a
    256-query batch cost 48 round trips around ~1 ms probe kernels.
    lax.map keeps the (chunk, nprobe, cap, d) gather intermediate
    bounded exactly like the host loop did, in ONE dispatch; the result
    packs into a single int32 array [bitcast(scores) | ids] (int32
    container — ids bitcast to f32 are denormals, which the TPU f32
    path flushes to zero)."""
    qn = qs.shape[0]
    pad = (-qn) % query_chunk
    qp = jnp.pad(qs, ((0, pad), (0, 0)))
    chunks = qp.reshape(-1, query_chunk, qp.shape[1])

    def body(q):
        return _ivf_search_step(
            q, centroids, cells, cell_ids, overflow, overflow_ids,
            k=k, nprobe=nprobe, metric=metric, has_overflow=has_overflow,
        )

    s, i = jax.lax.map(body, chunks)
    s = s.reshape(-1, s.shape[-1])[:qn]
    i = i.reshape(-1, i.shape[-1])[:qn]
    if flip:
        s = -s  # back to squared distances ascending
    return jnp.concatenate(
        [jax.lax.bitcast_convert_type(s, jnp.int32), i], axis=1
    )


@functools.partial(jax.jit, static_argnames=("n_cells", "iters"))
def _kmeans_assign(
    vectors: jnp.ndarray, n_cells: int, iters: int, seed: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd k-means + final assignment as ONE compiled computation.

    A per-iteration jitted step plus a separate assignment call costs two
    remote compiles and iters+1 dispatches on relay-attached devices
    (compiles are 30s-5min each here and dominated the measured 154s
    IVF build at 100k rows). Returns ((n_cells, d) centroids, (n,)
    int32 cell assignment)."""
    n, d = vectors.shape
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, (n_cells,), replace=False)

    def assign_to(centroids):
        _, a = flat_topk_ref(vectors, centroids, 1, metric="l2")
        return a[:, 0]

    def step(_, centroids):
        assign = assign_to(centroids)
        sums = jax.ops.segment_sum(vectors, assign, num_segments=n_cells)
        counts = jax.ops.segment_sum(
            jnp.ones((n,), jnp.float32), assign, num_segments=n_cells
        )
        new = sums / jnp.maximum(counts[:, None], 1.0)
        # keep old centroid for empty cells
        return jnp.where(counts[:, None] > 0, new, centroids)

    centroids = jax.lax.fori_loop(0, iters, step, vectors[init_idx])
    return centroids, assign_to(centroids)


def kmeans(
    vectors: jnp.ndarray,
    n_cells: int,
    iters: int = 10,
    seed: int = 0,
) -> jnp.ndarray:
    """Lloyd k-means on device. Returns (n_cells, d) float32 centroids."""
    return _kmeans_assign(vectors, n_cells, iters, seed)[0]


class IVFIndex:
    def __init__(
        self,
        dim: int,
        n_cells: int = 100,
        nprobe: int = 8,
        metric: str = "l2",
        cell_cap: Optional[int] = None,
        seed: int = 0,
        target_recall: Optional[float] = None,
        mesh=None,
    ):
        """target_recall: instead of treating nprobe as a raw knob,
        build() calibrates the smallest nprobe whose measured Recall@10
        (sampled held-out queries vs the exact flat ranking) clears this
        target on THIS corpus's geometry; the verdict is recorded in
        `self.calibration`. mesh: shard cells/centroids/overflow over
        the mesh's corpus axis (parallel/sharded_ivf.py) — sharded
        recall is >= the single-chip probe at equal nprobe."""
        if metric not in ("l2", "ip", "cosine"):
            raise ValueError(metric)
        self.dim = dim
        self.n_cells = n_cells
        self.nprobe = min(nprobe, n_cells)
        self.metric = metric
        self.cell_cap = cell_cap
        self.seed = seed
        self.target_recall = target_recall
        self.mesh = mesh
        self.calibration: Optional[dict] = None
        self.centroids: Optional[jnp.ndarray] = None
        self._cells: Optional[jnp.ndarray] = None      # (C, cap, d)
        self._cell_ids: Optional[jnp.ndarray] = None   # (C, cap) int32, -1 pad
        self._overflow: Optional[jnp.ndarray] = None   # (O, d)
        self._overflow_ids: Optional[jnp.ndarray] = None
        # mesh-sharded placements (parallel/sharded_ivf.shard_ivf)
        self._sharded = None
        self._row_loc: Optional[np.ndarray] = None     # row -> storage slot
        self._ntotal = 0

    @property
    def ntotal(self) -> int:
        return self._ntotal

    def _prep(self, vectors: np.ndarray) -> np.ndarray:
        vectors = np.asarray(vectors, np.float32)
        if self.metric == "cosine":
            vectors = vectors / np.maximum(
                np.linalg.norm(vectors, axis=1, keepdims=True), 1e-12
            )
        return vectors

    def build(self, vectors: np.ndarray, train_iters: int = 10) -> "IVFIndex":
        """Train centroids and populate cells in one pass."""
        vectors = self._prep(vectors)
        n = vectors.shape[0]
        dev = jnp.asarray(vectors)
        n_cells = min(self.n_cells, n)
        self.n_cells = n_cells
        self.nprobe = min(self.nprobe, n_cells)
        self.centroids, assign = _kmeans_assign(
            dev, n_cells, train_iters, self.seed
        )
        self._populate(vectors, np.asarray(assign))
        if self.target_recall is not None:
            self.calibrate_nprobe(self.target_recall, vectors)
        return self

    def calibrate_nprobe(
        self,
        target_recall: float,
        vectors: np.ndarray,
        k: int = 10,
        n_sample: int = 256,
        query_chunk: int = 16,
    ) -> dict:
        """Pick the smallest nprobe whose sampled Recall@k clears
        `target_recall` on this corpus (VERDICT r3 #6: nprobe was a raw
        knob — FAISS semantics leave quality tuning to the user, ref
        scripts/phase3_pdf_chunking.py:39-71 hardcodes nlist only).

        Sample queries are perturbed held-out corpus rows (isotropic
        random queries land far from every cluster and say nothing
        about serving quality on clustered geometry); ground truth is
        the exact flat ranking of the same rows. Sets self.nprobe and
        records {target, achieved, nprobe, curve} in self.calibration.
        """
        rng = np.random.default_rng(self.seed + 1)
        vectors = self._prep(vectors)
        n = vectors.shape[0]
        q = vectors[rng.integers(0, n, min(n_sample, n))]
        q = q + 0.1 * q.std() * rng.standard_normal(q.shape).astype(
            np.float32
        )
        if self.metric == "cosine":
            q = q / np.maximum(
                np.linalg.norm(q, axis=1, keepdims=True), 1e-12
            )
        metric = "l2" if self.metric == "l2" else "dot"
        _, want = flat_topk_ref(
            jnp.asarray(q), jnp.asarray(vectors), k, metric=metric
        )
        want = np.asarray(want)
        kk = want.shape[1]
        def measure(p_eff):
            _, got = self.search(
                q, kk, nprobe=p_eff, query_chunk=query_chunk
            )
            return float(np.mean([
                len(set(got[i]) & set(want[i])) / kk
                for i in range(len(q))
            ]))

        curve = []
        p = 1
        while True:
            p_eff = min(p, self.n_cells)
            r = measure(p_eff)
            curve.append((p_eff, round(r, 4)))
            if r >= target_recall or p_eff == self.n_cells:
                nprobe, achieved = p_eff, r
                break
            p *= 2
        # midpoint refinement between the last failing power of two and
        # the passing one: each doubling can overshoot by up to 2x probe
        # cost (e.g. 8 -> 16 when 12 already clears the target). Two
        # extra measurements bound the overshoot to ~25%. (Each distinct
        # nprobe is a separate compiled probe shape — keep this shallow.)
        # Skipped entirely when the target was never achieved (nprobe
        # capped at n_cells): recall is monotone in nprobe, so every
        # midpoint below the cap is guaranteed to fail too — each would
        # buy a 30s-5min relay compile for nothing.
        lo = curve[-2][0] if len(curve) >= 2 else 0
        if achieved < target_recall:
            lo = nprobe
        for _ in range(2):
            if nprobe - lo <= max(1, nprobe // 8):
                break
            mid = (lo + nprobe) // 2
            r_mid = measure(mid)
            curve.append((mid, round(r_mid, 4)))
            if r_mid >= target_recall:
                nprobe, achieved = mid, r_mid
            else:
                lo = mid
        self.nprobe = nprobe
        self.calibration = {
            "target": target_recall,
            "achieved": round(achieved, 4),
            "nprobe": nprobe,
            "k": kk,
            "curve": curve,
        }
        return self.calibration

    def _auto_cap(self, counts: np.ndarray) -> int:
        """Cost-optimal cell capacity. A probe scans nprobe*cap padded
        rows plus the always-scanned overflow block, so padding cells to
        the MAX occupancy is ruinous on clustered data (k-means cells
        are imbalanced there: measured cap=812 vs mean 316 at 100k real
        geometry -> every probe scans 2.5x the useful rows). Choose cap
        minimizing nprobe*cap + sum(max(0, count - cap)) over the
        observed occupancies — on balanced (isotropic) corpora this
        degenerates to ~max occupancy (zero overflow), so nothing
        regresses there."""
        cands = np.unique(counts[counts > 0])
        if cands.size == 0:
            return 1
        overflow = np.maximum(
            0, counts[None, :] - cands[:, None]
        ).sum(axis=1)
        cost = self.nprobe * cands + overflow
        return max(1, int(cands[int(np.argmin(cost))]))

    def _populate(self, vectors: np.ndarray, assign: np.ndarray) -> None:
        """Fill capacity-padded cells (+ overflow block) from a per-row
        cell assignment. Requires self.centroids/n_cells already set."""
        n = vectors.shape[0]
        self._ntotal = n
        n_cells = self.n_cells
        counts = np.bincount(assign, minlength=n_cells)
        cap = self.cell_cap or self._auto_cap(counts)
        cells = np.zeros((n_cells, cap, self.dim), np.float32)
        cell_ids = np.full((n_cells, cap), -1, np.int32)
        # Vectorized fill (a per-row Python loop costs seconds at 100k+
        # rows): stable sort by cell keeps rows ascending within each
        # cell — identical slot order to sequential insertion.
        order = np.argsort(assign, kind="stable").astype(np.int64)
        sorted_cell = assign[order]
        starts = np.searchsorted(sorted_cell, np.arange(n_cells))
        slot = np.arange(n, dtype=np.int64) - starts[sorted_cell]
        in_cap = slot < cap
        cells[sorted_cell[in_cap], slot[in_cap]] = vectors[order[in_cap]]
        cell_ids[sorted_cell[in_cap], slot[in_cap]] = order[in_cap]
        # On a mesh the SHARDED placements serve every search; keep the
        # unsharded copies HOST-side numpy (rows()/save()/export read
        # them rarely) instead of doubling the device residency — the
        # padded cells block is the multi-GB payload at 1M rows.
        put = (lambda a: a) if self.mesh is not None else jnp.asarray
        self._cells = put(cells)
        self._cell_ids = put(cell_ids)
        ovf = np.sort(order[~in_cap])  # row order, as sequential append
        if ovf.size:
            self._overflow = put(vectors[ovf])
            self._overflow_ids = put(ovf.astype(np.int32))
        else:
            self._overflow = None
            self._overflow_ids = None
        self._row_loc = None  # rebuilt lazily by rows()
        if self.mesh is not None:
            from persian_rag_tpu.parallel.sharded_ivf import shard_ivf

            self._sharded = shard_ivf(
                np.asarray(self.centroids),
                cells,
                cell_ids,
                vectors[ovf] if ovf.size else None,
                ovf.astype(np.int32) if ovf.size else None,
                self.mesh,
                self.dim,
            )

    def _build_row_loc(self) -> None:
        """Host-side map: global row id -> flat storage slot, where slots
        [0, C*cap) index cells.reshape(C*cap, d) and slots >= C*cap index
        the overflow block. Derived from cell_ids so it works for built,
        loaded, and FAISS-imported indexes alike."""
        cell_ids = np.asarray(self._cell_ids)
        flat_ids = cell_ids.reshape(-1)
        loc = np.full(self._ntotal, -1, np.int64)
        valid = flat_ids >= 0
        loc[flat_ids[valid]] = np.nonzero(valid)[0]
        if self._overflow_ids is not None:
            o_ids = np.asarray(self._overflow_ids)
            loc[o_ids] = cell_ids.size + np.arange(o_ids.shape[0])
        self._row_loc = loc

    def rows(self, row_ids: np.ndarray) -> np.ndarray:
        """Float32 copies of the given rows via at most two device
        gathers (cells block + overflow block) — the IVF counterpart of
        DenseIndex.rows, used by the rerank stored-vector fast path
        (cosine metric: the stored, i.e. normalized, form is returned,
        matching DenseIndex semantics)."""
        if self._cells is None:
            raise ValueError("index not built")
        if self._row_loc is None:
            self._build_row_loc()
        idx = np.asarray(row_ids, np.int64)
        loc = self._row_loc[idx]
        n_cell_slots = int(np.asarray(self._cell_ids).size)
        out = np.zeros((idx.shape[0], self.dim), np.float32)
        in_cells = (loc >= 0) & (loc < n_cell_slots)
        if in_cells.any():
            flat = self._cells.reshape(-1, self.dim)
            out[in_cells] = np.asarray(
                jnp.take(flat, jnp.asarray(loc[in_cells]), axis=0)
            )
        in_ovf = loc >= n_cell_slots
        if in_ovf.any():
            out[in_ovf] = np.asarray(
                jnp.take(
                    self._overflow,
                    jnp.asarray(loc[in_ovf] - n_cell_slots),
                    axis=0,
                )
            )
        return out

    # -- FAISS IVF file interop ------------------------------------------------

    @classmethod
    def from_faiss(cls, path: str, nprobe: Optional[int] = None) -> "IVFIndex":
        """Import a FAISS IndexIVFFlat file (the format phase3 writes for
        corpora over 1000 vectors — reference:
        scripts/phase3_pdf_chunking.py:39-71). Centroids and cell
        assignments are taken from the file; no retraining."""
        from persian_rag_tpu.index import faiss_io

        data = faiss_io.read_faiss_ivf(path)
        index = cls(
            data["vectors"].shape[1],
            n_cells=data["centroids"].shape[0],
            nprobe=nprobe or max(1, data["nprobe"]),
            metric=data["metric"],
        )
        index.centroids = jnp.asarray(data["centroids"])
        index._populate(data["vectors"], data["assign"])
        return index

    def export_faiss(self, path: str, nprobe: Optional[int] = None) -> None:
        """Write a faiss-loadable IndexIVFFlat file. Overflow rows are
        assigned to their nearest centroid (their natural cell)."""
        from persian_rag_tpu.index import faiss_io

        if self._cells is None:
            raise ValueError("index not built")
        vectors = np.zeros((self._ntotal, self.dim), np.float32)
        assign = np.full(self._ntotal, -1, np.int32)
        cells = np.asarray(self._cells)
        cell_ids = np.asarray(self._cell_ids)
        for cell in range(self.n_cells):
            mask = cell_ids[cell] >= 0
            ids = cell_ids[cell][mask]
            vectors[ids] = cells[cell][mask]
            assign[ids] = cell
        if self._overflow is not None:
            o_rows = np.asarray(self._overflow)
            o_ids = np.asarray(self._overflow_ids)
            _, o_assign = flat_topk_ref(
                jnp.asarray(o_rows), self.centroids, 1, metric="l2"
            )
            vectors[o_ids] = o_rows
            assign[o_ids] = np.asarray(o_assign)[:, 0]
        metric = "l2" if self.metric == "l2" else "ip"
        faiss_io.write_faiss_ivf(
            path,
            vectors,
            np.asarray(self.centroids),
            assign,
            metric=metric,
            nprobe=nprobe or self.nprobe,
        )

    def search(
        self,
        queries: np.ndarray,
        k: int,
        nprobe: Optional[int] = None,
        query_chunk: int = 16,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (scores, ids) like DenseIndex.search (l2 ascending)."""
        if self._cells is None:
            raise ValueError("index not built")
        nprobe = min(nprobe or self.nprobe, self.n_cells)
        queries = self._prep(np.atleast_2d(np.asarray(queries, np.float32)))
        k = min(k, self._ntotal)
        descending = self.metric != "l2"

        if self.mesh is not None and self._sharded is not None:
            from persian_rag_tpu.parallel.sharded_ivf import (
                sharded_ivf_topk,
            )

            s, i = sharded_ivf_topk(
                jnp.asarray(queries),
                *self._sharded,
                k=k,
                nprobe=nprobe,
                metric="l2" if self.metric == "l2" else "dot",
                mesh=self.mesh,
            )
            return np.asarray(s), np.asarray(i)

        # one upload + one packed readback for the whole batch (the old
        # host chunk loop paid 3 relay round trips per 16-query chunk)
        metric = "l2" if self.metric == "l2" else "dot"
        has_overflow = self._overflow is not None
        zero = jnp.zeros((0, self.dim), jnp.float32)
        zero_ids = jnp.zeros((0,), jnp.int32)
        out = np.asarray(
            _ivf_search_packed(
                jnp.asarray(queries),
                self.centroids,
                self._cells,
                self._cell_ids,
                self._overflow if has_overflow else zero,
                self._overflow_ids if has_overflow else zero_ids,
                k=k,
                nprobe=nprobe,
                metric=metric,
                has_overflow=has_overflow,
                query_chunk=min(query_chunk, queries.shape[0]),
                flip=not descending,
            )
        )
        return (
            np.ascontiguousarray(out[:, :k]).view(np.float32),
            np.ascontiguousarray(out[:, k:]),
        )

    def _search_chunk(self, q, k, nprobe, descending):
        metric = "l2" if self.metric == "l2" else "dot"
        has_overflow = self._overflow is not None
        zero = jnp.zeros((0, self.dim), jnp.float32)
        zero_ids = jnp.zeros((0,), jnp.int32)
        top_s, top_i = _ivf_search_step(
            q,
            self.centroids,
            self._cells,
            self._cell_ids,
            self._overflow if has_overflow else zero,
            self._overflow_ids if has_overflow else zero_ids,
            k=k,
            nprobe=nprobe,
            metric=metric,
            has_overflow=has_overflow,
        )
        if not descending:
            top_s = -top_s  # back to squared distances ascending
        return top_s, top_i

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        arrays = {
            "centroids": np.asarray(self.centroids),
            "cells": np.asarray(self._cells),
            "cell_ids": np.asarray(self._cell_ids),
        }
        if self._overflow is not None:
            arrays["overflow"] = np.asarray(self._overflow)
            arrays["overflow_ids"] = np.asarray(self._overflow_ids)
        np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
        base = path[:-4] if path.endswith(".npz") else path
        with open(base + ".meta.json", "w", encoding="utf-8") as f:
            json.dump(
                {
                    "dim": self.dim,
                    "n_cells": self.n_cells,
                    "nprobe": self.nprobe,
                    "metric": self.metric,
                    "ntotal": self._ntotal,
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "IVFIndex":
        base = path[:-4] if path.endswith(".npz") else path
        with open(base + ".meta.json", encoding="utf-8") as f:
            meta = json.load(f)
        data = np.load(
            path if path.endswith(".npz") else path + ".npz"
        )
        index = cls(
            meta["dim"],
            n_cells=meta["n_cells"],
            nprobe=meta["nprobe"],
            metric=meta["metric"],
        )
        index.centroids = jnp.asarray(data["centroids"])
        index._cells = jnp.asarray(data["cells"])
        index._cell_ids = jnp.asarray(data["cell_ids"])
        if "overflow" in data:
            index._overflow = jnp.asarray(data["overflow"])
            index._overflow_ids = jnp.asarray(data["overflow_ids"])
        index._ntotal = meta["ntotal"]
        return index
