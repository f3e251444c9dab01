"""Tensor-parallel parameter placement for the Llama decoder.

The reference serves its fine-tuned Llama-3.2-1B through llama.cpp on
one GPU (SURVEY.md §2.2 row 24; src/llama_client.py:10) — a 1B model
needs no TP. This provides the scaling path anyway so larger decoder
families (8B+) serve across a chip mesh: Megatron-style column/row
sharding expressed purely through ``NamedSharding`` placement on the
parameter tree; XLA's SPMD partitioner inserts the all-reduces after
the attention output and MLP down projections, and the KV cache
sharding follows from the k/v projection outputs automatically.

Rules (per decoder layer, kernels are (in, out)):
  q/k/v projections   : shard output dim (column parallel — heads split)
  attention o_proj    : shard input dim  (row parallel -> all-reduce)
  mlp gate/up         : shard output dim (column parallel)
  mlp down_proj       : shard input dim  (row parallel -> all-reduce)
  embed_tokens        : shard vocab dim (the tied lm_head contraction
                        then all-gathers (B, V/n) logit shards)
  lm_head (untied)    : shard output (vocab) dim
  RMSNorm scales      : replicated

Any dimension that does not divide the mesh axis stays replicated
(e.g. Llama-1B's 8 KV heads over a 16-chip axis).
"""
from __future__ import annotations

from typing import Any, Dict

from jax.sharding import Mesh, PartitionSpec as P

_COLUMN_PARALLEL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
                    "lm_head")
_ROW_PARALLEL = ("o_proj", "down_proj")


def _spec_for(path, leaf_name: str, axis: str):
    parent = path[-1] if path else ""
    if parent in _COLUMN_PARALLEL and leaf_name == "kernel":
        return P(None, axis)
    if parent in _ROW_PARALLEL and leaf_name == "kernel":
        return P(axis, None)
    if parent == "embed_tokens" and leaf_name == "embedding":
        return P(axis, None)
    # int8-quantized serving layout ({values, scale} per projection,
    # decoder.quantize_decoder_params). Same Megatron placement: the
    # per-output-channel scale follows the output dim — sharded with a
    # column split, replicated for a row split (the RMSNorm "scale"
    # leaves have norm-layer parents and fall through to P()).
    if parent in _COLUMN_PARALLEL and leaf_name == "values":
        return P(None, axis)
    if parent in _COLUMN_PARALLEL and leaf_name == "scale":
        return P(None, axis)
    if parent in _ROW_PARALLEL and leaf_name == "values":
        return P(axis, None)
    if parent == "embed_tokens" and leaf_name in ("values", "scale"):
        return P(axis, None)
    return P()


def shard_decoder_params_tp(
    params: Dict[str, Any], mesh: Mesh, axis: str = "corpus"
) -> Dict[str, Any]:
    """Return the decoder params tree placed with TP shardings.

    Head-boundary note: q/k/v kernels are (hidden, n_heads*head_dim)
    with heads laid out contiguously, so an even split of the output
    dim over n devices lands on head boundaries whenever
    n_heads % n == 0 (and kv_heads % n == 0 for k/v) — the grouped
    -query attention einsum then contracts locally per device. Uneven
    head counts still compute correctly (GSPMD reshards), just with
    more communication; indivisible dims replicate.
    """
    from persian_rag_tpu.parallel.tp import place_params

    return place_params(params, mesh, axis, _spec_for)
