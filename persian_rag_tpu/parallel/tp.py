"""Tensor-parallel parameter placement for the Flax encoders.

The reference never needs TP (encoders <=278M params fit one chip —
SURVEY.md §2.3); this provides it anyway so larger encoder families
drop in: Megatron-style column/row sharding expressed purely through
``NamedSharding`` placement — XLA's SPMD partitioner then inserts the
all-reduces after the attention output and FFN down projections
automatically.

Rules (per-layer):
  query/key/value kernels  : shard output dim  (column parallel)
  attention output kernel  : shard input dim   (row parallel)
  intermediate kernel      : shard output dim  (column parallel)
  ffn_output kernel        : shard input dim   (row parallel)
  matching biases          : shard / replicate accordingly
  embeddings, layer norms  : replicated
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN_PARALLEL = ("query", "key", "value", "intermediate")
_ROW_PARALLEL = ("output", "ffn_output")


def _spec_for(path: Tuple[str, ...], leaf_name: str, axis: str):
    parent = path[-1] if path else ""
    if parent in _COLUMN_PARALLEL:
        if leaf_name == "kernel":
            return P(None, axis)
        if leaf_name == "bias":
            return P(axis)
    if parent in _ROW_PARALLEL:
        if leaf_name == "kernel":
            return P(axis, None)
        if leaf_name == "bias":
            return P()  # row-parallel bias added after the all-reduce
    return P()


def place_params(
    params: Dict[str, Any], mesh: Mesh, axis: str, spec_fn
) -> Dict[str, Any]:
    """Walk a params dict-tree and device_put each leaf with the spec
    ``spec_fn(path_without_leaf_name, leaf_name, axis)`` chooses; any
    dimension that doesn't divide the mesh axis falls back to full
    replication. Shared by the encoder and decoder TP placements."""
    n = mesh.shape[axis]

    def place(path: Tuple[str, ...], leaf):
        leaf_name = path[-1]
        spec = spec_fn(path[:-1], leaf_name, axis)
        # verify divisibility; fall back to replication
        for dim, name in zip(leaf.shape, spec):
            if name == axis and dim % n != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    def walk(node, path=()):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return place(path, node)

    return walk(params)


def shard_params_tensor_parallel(
    params: Dict[str, Any], mesh: Mesh, axis: str = "corpus"
) -> Dict[str, Any]:
    """Return the params tree placed with TP shardings over ``axis``.

    Dimensions that don't divide the axis size stay replicated.
    """
    return place_params(params, mesh, axis, _spec_for)
