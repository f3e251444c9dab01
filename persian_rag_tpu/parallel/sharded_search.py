"""Multi-chip sharded flat search.

The reference has no distributed layer at all (its one cross-process link is
HTTP to llama.cpp — reference: src/llama_client.py:108-175). Here, corpora
beyond one chip's HBM shard row-wise over the ``corpus`` mesh axis:

  1. each shard runs the fused flat_topk kernel over its local rows,
  2. local indices are offset to global ids,
  3. the k candidates per shard ride ICI via ``all_gather`` (k*n_shards
     values per query — tiny payload), and
  4. every shard redundantly computes the global top-k merge, leaving the
     result replicated.

Exactness: the global top-k of a union of per-shard top-k sets equals the
global top-k of all rows, so sharded search returns identical ids to a
single-chip scan (asserted by tests on a 1- vs 8-device mesh).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from persian_rag_tpu.core.mesh import CORPUS_AXIS, corpus_sharding
from persian_rag_tpu.ops._merge import NEG_INF
from persian_rag_tpu.ops.flat_topk import flat_topk


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _mesh_on_tpu(mesh: Mesh) -> bool:
    """Whether the mesh's devices are TPUs (the process default backend
    may differ — e.g. a CPU validation mesh while the default is TPU)."""
    return next(iter(mesh.devices.flat)).platform not in ("cpu",)


def shard_corpus(corpus: jnp.ndarray, mesh: Mesh) -> Tuple[jnp.ndarray, int]:
    """Pad an (N, d) corpus to a shard multiple and place it row-sharded.

    Returns (sharded array, original N). Padded rows are masked out of
    search results by `sharded_flat_topk`.
    """
    n = corpus.shape[0]
    n_shards = mesh.shape[CORPUS_AXIS]
    n_pad = _round_up(max(n, n_shards), n_shards)
    if n_pad != n:
        corpus = jnp.pad(corpus, ((0, n_pad - n), (0, 0)))
    return jax.device_put(corpus, corpus_sharding(mesh)), n


def sharded_flat_topk(
    queries: jnp.ndarray,
    corpus_sharded: jnp.ndarray,
    k: int,
    n_actual: int,
    mesh: Mesh,
    metric: str = "dot",
    use_pallas: Optional[bool] = None,
    compute_dtype: jnp.dtype = jnp.float32,
    mode: str = "exact",
    corpus_sqnorm_sharded: Optional[jnp.ndarray] = None,
    corpus_bf16_sharded: Optional[jnp.ndarray] = None,
    corpus_center: Optional[jnp.ndarray] = None,
    center_sqmax: Optional[jnp.ndarray] = None,
    corpus_bf16_lo_sharded: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Search a row-sharded corpus; results identical to a single-chip scan.

    Returns ((Q, k) scores, (Q, k) global ids), replicated on every device.
    For metric="l2" scores are squared distances ascending.
    corpus_sqnorm_sharded / corpus_bf16_sharded are the two-stage
    serving caches in the SAME row sharding as the corpus (DenseIndex
    builds them at commit); each shard's local flat_topk consumes them
    instead of re-deriving from its corpus rows every dispatch.
    """
    n_shards = mesh.shape[CORPUS_AXIS]
    k = min(k, n_actual)
    descending = metric != "l2"
    if use_pallas is None:
        use_pallas = _mesh_on_tpu(mesh)
    # Zero pad rows added by shard_corpus compete inside each shard's LOCAL
    # top-k before the gid >= n_actual mask applies (for l2 a zero row
    # scores ||q||^2, for dot it scores 0 — either can beat real rows).
    # Over-retrieve locally by the total pad count (a static int): at most
    # `pad_total` pad rows can occupy local slots, so every shard still
    # surfaces >= k valid candidates and the global merge stays exact.
    local_n_static = corpus_sharded.shape[0] // n_shards
    pad_total = local_n_static * n_shards - n_actual
    k_local = min(k + pad_total, local_n_static)

    def local_search(q, c_local, *extras):
        shard = jax.lax.axis_index(CORPUS_AXIS)
        local_n = c_local.shape[0]
        it = iter(extras)
        csq_local = next(it) if corpus_sqnorm_sharded is not None else None
        c16_local = next(it) if corpus_bf16_sharded is not None else None
        ctr = next(it) if corpus_center is not None else None
        sqm = next(it) if center_sqmax is not None else None
        c16lo = next(it) if corpus_bf16_lo_sharded is not None else None
        s, i = flat_topk(
            q,
            c_local,
            k_local,
            metric=metric,
            corpus_sqnorm=csq_local,
            corpus_bf16=c16_local,
            use_pallas=use_pallas,
            compute_dtype=compute_dtype,
            mode=mode,
            corpus_center=ctr,
            center_sqmax=sqm,
            corpus_bf16_lo=c16lo,
        )
        kl = s.shape[1]
        gid = i + shard * local_n
        # Mask padded rows so they never win the global merge.
        invalid = gid >= n_actual
        if descending:
            s = jnp.where(invalid, NEG_INF, s)
        else:
            s = jnp.where(invalid, -NEG_INF, s)
        gid = jnp.where(invalid, -1, gid)

        # (n_shards, Q, kl) candidates over ICI; merge redundantly per shard.
        all_s = jax.lax.all_gather(s, CORPUS_AXIS)
        all_i = jax.lax.all_gather(gid, CORPUS_AXIS)
        q_n = q.shape[0]
        cand_s = jnp.moveaxis(all_s, 0, 1).reshape(q_n, n_shards * kl)
        cand_i = jnp.moveaxis(all_i, 0, 1).reshape(q_n, n_shards * kl)
        if descending:
            top_s, pos = jax.lax.top_k(cand_s, k)
        else:
            neg_s, pos = jax.lax.top_k(-cand_s, k)
            top_s = -neg_s
        top_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return top_s, top_i.astype(jnp.int32)

    args = [queries, corpus_sharded]
    specs = [P(), P(CORPUS_AXIS, None)]
    if corpus_sqnorm_sharded is not None:
        args.append(corpus_sqnorm_sharded)
        specs.append(P(CORPUS_AXIS))
    if corpus_bf16_sharded is not None:
        args.append(corpus_bf16_sharded)
        specs.append(P(CORPUS_AXIS, None))
    if corpus_center is not None:
        args.append(corpus_center)
        specs.append(P(None))
    if center_sqmax is not None:
        args.append(center_sqmax)
        specs.append(P())
    if corpus_bf16_lo_sharded is not None:
        args.append(corpus_bf16_lo_sharded)
        specs.append(P(CORPUS_AXIS, None))
    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=tuple(specs),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(*args)


def sharded_int8_topk(
    queries: jnp.ndarray,
    values_sharded: jnp.ndarray,
    scales_sharded: jnp.ndarray,
    refine_sharded: jnp.ndarray,
    k: int,
    n_actual: int,
    mesh: Mesh,
    k_scan: int = 100,
    use_pallas: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-sharded int8 candidate-generation tier with per-shard exact
    refine and an ICI-merged global top-k.

    Each shard scans its LOCAL int8 rows for k_scan candidates (packed-
    key merge-free kernel on TPU, exact int8-score selection elsewhere),
    re-scores them exactly against its local full-precision refine rows,
    and contributes its refined local top-k to the all_gather merge.
    The union of per-shard candidate sets is a superset of the global
    int8 top-k_scan, so recall is >= the single-chip two-stage tier's.
    dot/cosine metrics only (matches the single-chip int8 tier).
    """
    from persian_rag_tpu.index.dense import _refine_topk
    from persian_rag_tpu.ops.flat_topk import flat_topk_scaled_candidates

    n_shards = mesh.shape[CORPUS_AXIS]
    k = min(k, n_actual)
    if use_pallas is None:
        use_pallas = _mesh_on_tpu(mesh)
    local_n_static = values_sharded.shape[0] // n_shards
    pad_total = local_n_static * n_shards - n_actual
    k_local = min(k + pad_total, local_n_static)
    k_scan_local = min(max(k_scan, k_local), local_n_static)

    def local_search(q, v_local, s_local, r_local):
        shard = jax.lax.axis_index(CORPUS_AXIS)
        local_n = v_local.shape[0]
        if use_pallas and local_n >= 4096:
            cand = flat_topk_scaled_candidates(
                q, v_local, s_local, k_scan_local
            )
        else:
            _, cand = flat_topk(
                q, v_local, k_scan_local, metric="dot",
                corpus_scale=s_local, use_pallas=False,
            )
        s, i = _refine_topk(q, r_local, cand, k_local)
        gid = jnp.where(i >= 0, i + shard * local_n, -1)
        invalid = (gid >= n_actual) | (gid < 0)
        s = jnp.where(invalid, NEG_INF, s)
        gid = jnp.where(invalid, -1, gid)

        all_s = jax.lax.all_gather(s, CORPUS_AXIS)
        all_i = jax.lax.all_gather(gid, CORPUS_AXIS)
        q_n = q.shape[0]
        cand_s = jnp.moveaxis(all_s, 0, 1).reshape(q_n, n_shards * k_local)
        cand_i = jnp.moveaxis(all_i, 0, 1).reshape(q_n, n_shards * k_local)
        top_s, pos = jax.lax.top_k(cand_s, k)
        top_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return top_s, top_i.astype(jnp.int32)

    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=(
            P(),
            P(CORPUS_AXIS, None),
            P(CORPUS_AXIS),
            P(CORPUS_AXIS, None),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(
        queries, values_sharded, scales_sharded, refine_sharded
    )


def sharded_flat_topk_2d(
    queries: jnp.ndarray,
    corpus_sharded: jnp.ndarray,
    k: int,
    n_actual: int,
    mesh: Mesh,
    metric: str = "dot",
    use_pallas: Optional[bool] = None,
    compute_dtype: jnp.dtype = jnp.float32,
    mode: str = "exact",
    corpus_sqnorm_sharded: Optional[jnp.ndarray] = None,
    corpus_bf16_sharded: Optional[jnp.ndarray] = None,
    corpus_center: Optional[jnp.ndarray] = None,
    center_sqmax: Optional[jnp.ndarray] = None,
    corpus_bf16_lo_sharded: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2-D parallel search: queries shard over the ``data`` axis while the
    corpus shards over ``corpus`` — each device scans its corpus rows for
    its query slice, candidates all_gather over the corpus axis only, and
    results stay data-sharded (no redundant query work, unlike
    `sharded_flat_topk` which replicates queries on every corpus shard).

    Queries are padded to a multiple of the data-axis size. The
    two-stage serving caches (per-row ||c||^2, bf16 stage-1 image) ride
    the SAME corpus-row sharding as the corpus; each device's local
    flat_topk consumes its own slice instead of re-deriving them from
    the corpus rows every dispatch.
    """
    from persian_rag_tpu.core.mesh import DATA_AXIS

    n_q = queries.shape[0]
    if use_pallas is None:
        use_pallas = _mesh_on_tpu(mesh)
    dp = mesh.shape[DATA_AXIS]
    q_pad = _round_up(max(n_q, dp), dp)
    if q_pad != n_q:
        queries = jnp.pad(queries, ((0, q_pad - n_q), (0, 0)))
    k = min(k, n_actual)
    descending = metric != "l2"
    # Same pad-row handling as sharded_flat_topk: over-retrieve locally by
    # the static total pad count so zero pad rows can never evict valid
    # candidates from the global merge.
    n_corpus_shards = mesh.shape[CORPUS_AXIS]
    local_n_static = corpus_sharded.shape[0] // n_corpus_shards
    pad_total = local_n_static * n_corpus_shards - n_actual
    k_local = min(k + pad_total, local_n_static)

    def local_search(q, c_local, *extras):
        shard = jax.lax.axis_index(CORPUS_AXIS)
        local_n = c_local.shape[0]
        it = iter(extras)
        csq_local = next(it) if corpus_sqnorm_sharded is not None else None
        c16_local = next(it) if corpus_bf16_sharded is not None else None
        ctr = next(it) if corpus_center is not None else None
        sqm = next(it) if center_sqmax is not None else None
        c16lo = next(it) if corpus_bf16_lo_sharded is not None else None
        s, i = flat_topk(
            q, c_local, k_local,
            metric=metric,
            corpus_sqnorm=csq_local,
            corpus_bf16=c16_local,
            use_pallas=use_pallas,
            compute_dtype=compute_dtype, mode=mode,
            corpus_center=ctr,
            center_sqmax=sqm,
            corpus_bf16_lo=c16lo,
        )
        kl = s.shape[1]
        gid = i + shard * local_n
        invalid = gid >= n_actual
        s = jnp.where(invalid, NEG_INF if descending else -NEG_INF, s)
        gid = jnp.where(invalid, -1, gid)

        all_s = jax.lax.all_gather(s, CORPUS_AXIS)
        all_i = jax.lax.all_gather(gid, CORPUS_AXIS)
        rows = q.shape[0]
        n_shards = all_s.shape[0]
        cand_s = jnp.moveaxis(all_s, 0, 1).reshape(rows, n_shards * kl)
        cand_i = jnp.moveaxis(all_i, 0, 1).reshape(rows, n_shards * kl)
        if descending:
            top_s, pos = jax.lax.top_k(cand_s, k)
        else:
            neg_s, pos = jax.lax.top_k(-cand_s, k)
            top_s = -neg_s
        top_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return top_s, top_i.astype(jnp.int32)

    args = [queries, corpus_sharded]
    specs = [P(DATA_AXIS, None), P(CORPUS_AXIS, None)]
    if corpus_sqnorm_sharded is not None:
        args.append(corpus_sqnorm_sharded)
        specs.append(P(CORPUS_AXIS))
    if corpus_bf16_sharded is not None:
        args.append(corpus_bf16_sharded)
        specs.append(P(CORPUS_AXIS, None))
    if corpus_center is not None:
        args.append(corpus_center)
        specs.append(P(None))
    if center_sqmax is not None:
        args.append(center_sqmax)
        specs.append(P())
    if corpus_bf16_lo_sharded is not None:
        args.append(corpus_bf16_lo_sharded)
        specs.append(P(CORPUS_AXIS, None))
    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=tuple(specs),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_vma=False,
    )
    scores, ids = jax.jit(fn)(*args)
    return scores[:n_q], ids[:n_q]
