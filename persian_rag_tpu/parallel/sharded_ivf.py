"""Corpus-sharded IVF search over the mesh's ``corpus`` axis.

The reference's IVF usage is single-process FAISS (reference:
scripts/phase3_pdf_chunking.py:39-71); here the coarse-quantized index
joins the mesh layer like the flat tiers (parallel/sharded_search.py):

  * CELLS shard across devices (contiguous cell-id slices), together
    with their slice of the centroid table; the overflow block shards
    row-wise. Every row lives in exactly one cell (or one overflow
    slice) on exactly one shard, so the merge never sees duplicates.
  * each shard probes the top-nprobe centroids of its LOCAL centroid
    slice and scans those local cells (+ its overflow slice). The
    global top-nprobe cells are distributed among the shards, and each
    shard's local top-nprobe includes every globally-top-nprobe cell it
    owns — so the union of probed cells is a SUPERSET of the
    single-chip probe set and sharded recall is >= the single-chip
    IVF's at equal nprobe (same superset argument as
    sharded_int8_topk). A 1-device mesh probes exactly the single-chip
    cell set.
  * per-shard top-k candidates ride ICI via all_gather; the merge picks
    the global top-k with the deterministic (score desc, lower id)
    order used across the framework.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from persian_rag_tpu.core.mesh import CORPUS_AXIS
from persian_rag_tpu.index.ivf import _ivf_search_step

# Padded centroids sit at +BIG so an l2 probe can never prefer them
# over a real centroid (their cells are empty / id -1 anyway; this just
# keeps probe slots pointed at real cells).
_FAR = 1.0e18


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def shard_ivf(
    centroids: np.ndarray,
    cells: np.ndarray,
    cell_ids: np.ndarray,
    overflow: Optional[np.ndarray],
    overflow_ids: Optional[np.ndarray],
    mesh: Mesh,
    dim: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           jnp.ndarray]:
    """Place IVF storage mesh-sharded. Returns (centroids_sh, cells_sh,
    cell_ids_sh, overflow_sh, overflow_ids_sh) — overflow arrays are
    zero-row shards when the index has no overflow."""
    n_shards = mesh.shape[CORPUS_AXIS]
    c = centroids.shape[0]
    c_pad = _round_up(max(c, n_shards), n_shards)
    if c_pad != c:
        centroids = np.concatenate([
            centroids,
            np.full((c_pad - c, centroids.shape[1]), _FAR, np.float32),
        ])
        cells = np.concatenate([
            cells,
            np.zeros((c_pad - c,) + cells.shape[1:], np.float32),
        ])
        cell_ids = np.concatenate([
            cell_ids,
            np.full((c_pad - c, cell_ids.shape[1]), -1, np.int32),
        ])
    if overflow is None:
        overflow = np.zeros((0, dim), np.float32)
        overflow_ids = np.zeros((0,), np.int32)
    o = overflow.shape[0]
    o_pad = _round_up(max(o, n_shards), n_shards)
    if o_pad != o:
        overflow = np.concatenate([
            overflow, np.zeros((o_pad - o, dim), np.float32)
        ])
        overflow_ids = np.concatenate([
            overflow_ids, np.full(o_pad - o, -1, np.int32)
        ])
    row = NamedSharding(mesh, P(CORPUS_AXIS))
    row2 = NamedSharding(mesh, P(CORPUS_AXIS, None))
    row3 = NamedSharding(mesh, P(CORPUS_AXIS, None, None))
    return (
        jax.device_put(jnp.asarray(centroids), row2),
        jax.device_put(jnp.asarray(cells), row3),
        jax.device_put(jnp.asarray(cell_ids), row2),
        jax.device_put(jnp.asarray(overflow), row2),
        jax.device_put(jnp.asarray(overflow_ids), row),
    )


def sharded_ivf_topk(
    queries: jnp.ndarray,
    centroids_sh: jnp.ndarray,
    cells_sh: jnp.ndarray,
    cell_ids_sh: jnp.ndarray,
    overflow_sh: jnp.ndarray,
    overflow_ids_sh: jnp.ndarray,
    k: int,
    nprobe: int,
    metric: str,
    mesh: Mesh,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Probe-and-scan a cell-sharded IVF index. Returns ((Q, k) scores,
    (Q, k) global ids), replicated; l2 scores are squared distances
    ascending. Recall >= the single-chip probe at equal nprobe (see
    module docstring)."""
    n_shards = mesh.shape[CORPUS_AXIS]
    c_local = centroids_sh.shape[0] // n_shards
    nprobe_local = min(nprobe, c_local)
    descending = metric != "l2"
    s, i = _sharded_ivf_jit(mesh, k, nprobe_local, metric)(
        queries, centroids_sh, cells_sh, cell_ids_sh, overflow_sh,
        overflow_ids_sh,
    )
    if not descending:
        s = -s  # _ivf_search_step maximizes; back to distances ascending
    return s, i


@functools.lru_cache(maxsize=64)
def _sharded_ivf_jit(mesh: Mesh, k: int, nprobe_local: int, metric: str):
    """One jitted shard_map per (mesh, k, nprobe, metric) — building a
    fresh closure per call would re-trace and remote-recompile every
    dispatch (30s-5min each on the relay; calibrate_nprobe alone makes
    ~5-10 calls). Shape variation re-traces under the SAME jit's own
    cache."""

    def local_search(q, cent, cells, cids, ovf, ovf_ids):
        # lax.map over query chunks bounds the (chunk, nprobe, cap, d)
        # probe gather, mirroring _ivf_search_packed's query_chunk=16
        # (the full-batch gather at serving sizes — 512 q x nprobe 8 x
        # cap ~1k x d 384 — is a multi-GB intermediate per shard).
        chunk = 16
        qn = q.shape[0]
        pad = (-qn) % chunk
        qp = jnp.pad(q, ((0, pad), (0, 0)))

        def body(qc):
            return _ivf_search_step(
                qc, cent, cells, cids, ovf, ovf_ids,
                k=k, nprobe=nprobe_local, metric=metric,
                has_overflow=ovf.shape[0] > 0,
            )

        s_c, i_c = jax.lax.map(body, qp.reshape(-1, chunk, qp.shape[1]))
        s = s_c.reshape(-1, k)[:qn]
        i = i_c.reshape(-1, k)[:qn]
        all_s = jax.lax.all_gather(s, CORPUS_AXIS)
        all_i = jax.lax.all_gather(i, CORPUS_AXIS)
        qn = q.shape[0]
        cand_s = jnp.moveaxis(all_s, 0, 1).reshape(qn, -1)
        cand_i = jnp.moveaxis(all_i, 0, 1).reshape(qn, -1)
        # deterministic merge: score desc, lower global id on ties
        # (invalid slots carry id -1 at -3e38 and sort last)
        _, gid_sorted, s_sorted = jax.lax.sort(
            (-cand_s, cand_i, cand_s), dimension=1, num_keys=2
        )
        return s_sorted[:, :k], gid_sorted[:, :k]

    return jax.jit(shard_map(
        local_search,
        mesh=mesh,
        in_specs=(
            P(),
            P(CORPUS_AXIS, None),
            P(CORPUS_AXIS, None, None),
            P(CORPUS_AXIS, None),
            P(CORPUS_AXIS, None),
            P(CORPUS_AXIS),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    ))
