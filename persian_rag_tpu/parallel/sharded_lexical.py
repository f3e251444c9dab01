"""Sharded lexical (BM25 / TF-IDF) search over the corpus axis.

Same shape as the dense sharded search: ELL document rows shard across
chips, each shard runs the fused sparse_topk kernel on its rows, local
ids offset to global, per-shard candidates all_gather over ICI, global
merge replicated. Scoring semantics (idf, normalization) are global —
they were precomputed at build time — so sharded results are identical
to single-chip results.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from persian_rag_tpu.core.mesh import CORPUS_AXIS
from persian_rag_tpu.ops._merge import NEG_INF
from persian_rag_tpu.ops.sparse_scores import sparse_topk, sparse_topk_union


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def shard_ell(
    doc_ids: jnp.ndarray, doc_vals: jnp.ndarray, mesh: Mesh
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Pad ELL arrays to a shard multiple and place them row-sharded."""
    n = doc_ids.shape[0]
    n_shards = mesh.shape[CORPUS_AXIS]
    n_pad = _round_up(max(n, n_shards), n_shards)
    if n_pad != n:
        doc_ids = jnp.pad(doc_ids, ((0, n_pad - n), (0, 0)), constant_values=-1)
        doc_vals = jnp.pad(doc_vals, ((0, n_pad - n), (0, 0)))
    sharding = NamedSharding(mesh, P(CORPUS_AXIS, None))
    return (
        jax.device_put(doc_ids, sharding),
        jax.device_put(doc_vals, sharding),
        n,
    )


def sharded_sparse_topk(
    doc_ids_sharded: jnp.ndarray,
    doc_vals_sharded: jnp.ndarray,
    q_ids: jnp.ndarray,
    q_vals: jnp.ndarray,
    k: int,
    n_actual: int,
    mesh: Mesh,
    use_pallas: Optional[bool] = None,
    use_union: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ((B, k) scores desc, (B, k) global ids), replicated.

    use_union routes each shard's scan through the batch-dedup union
    kernel (the dedup prep replicates per shard — queries are already
    replicated, so the union is identical on every device)."""
    n_shards = mesh.shape[CORPUS_AXIS]
    k = min(k, n_actual)
    if use_pallas is None:
        from persian_rag_tpu.parallel.sharded_search import _mesh_on_tpu

        use_pallas = _mesh_on_tpu(mesh)
    # ELL pad documents score 0.0 in the LOCAL top-k and can displace real
    # documents whose total BM25 contribution is negative. Over-retrieve
    # locally by the static total pad count so >= k valid candidates always
    # survive to the global merge (same fix as sharded_flat_topk).
    local_n_static = doc_ids_sharded.shape[0] // n_shards
    pad_total = local_n_static * n_shards - n_actual
    k_local = min(k + pad_total, local_n_static)
    # the union kernel's merge unrolls k extraction steps; wide local
    # over-retrieves stay on the per-term kernel
    use_union = use_union and k_local <= 32

    def local(qi, qv, ids_local, vals_local):
        shard = jax.lax.axis_index(CORPUS_AXIS)
        local_n = ids_local.shape[0]
        topk_fn = sparse_topk_union if use_union else sparse_topk
        s, i = topk_fn(
            ids_local, vals_local, qi, qv, k_local, use_pallas=use_pallas
        )
        kl = s.shape[1]
        gid = i + shard * local_n
        invalid = gid >= n_actual
        s = jnp.where(invalid, NEG_INF, s)
        gid = jnp.where(invalid, -1, gid)
        all_s = jax.lax.all_gather(s, CORPUS_AXIS)
        all_i = jax.lax.all_gather(gid, CORPUS_AXIS)
        b = qi.shape[0]
        cand_s = jnp.moveaxis(all_s, 0, 1).reshape(b, n_shards * kl)
        cand_i = jnp.moveaxis(all_i, 0, 1).reshape(b, n_shards * kl)
        top_s, pos = jax.lax.top_k(cand_s, k)
        top_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return top_s, top_i.astype(jnp.int32)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(CORPUS_AXIS, None), P(CORPUS_AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(q_ids, q_vals, doc_ids_sharded, doc_vals_sharded)
