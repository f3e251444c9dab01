"""Device mesh construction and sharding helpers.

The reference is single-process / single-GPU (reference: src/retrieval.py:23,
scripts/phase3_pdf_chunking.py:25-37); scaling here is first-class instead:
a named ``jax.sharding.Mesh`` with

* a ``corpus`` axis — the index's row dimension (the "long" dimension of a
  retrieval system) shards across chips; per-shard top-k results merge over
  ICI collectives (see persian_rag_tpu.parallel.sharded_search).
* a ``data`` axis — batch data-parallelism for encoding and training.

On a single chip everything degenerates to mesh shape (1, 1) and the same
code paths run unsharded.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CORPUS_AXIS = "corpus"
DATA_AXIS = "data"


@dataclass(frozen=True)
class MeshSpec:
    corpus: int
    data: int


def build_mesh(
    corpus_axis: int = -1,
    data_axis: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ``(corpus, data)`` mesh.

    ``corpus_axis=-1`` takes every device not claimed by ``data_axis``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_axis <= 0:
        data_axis = 1
    if corpus_axis <= 0:
        corpus_axis = max(1, n // data_axis)
    if corpus_axis * data_axis > n:
        raise ValueError(
            f"mesh {corpus_axis}x{data_axis} needs {corpus_axis * data_axis} "
            f"devices, have {n}"
        )
    grid = np.array(devices[: corpus_axis * data_axis]).reshape(
        corpus_axis, data_axis
    )
    return Mesh(grid, (CORPUS_AXIS, DATA_AXIS))


def single_device_mesh() -> Mesh:
    return build_mesh(corpus_axis=1, data_axis=1, devices=jax.devices()[:1])


def corpus_sharding(mesh: Mesh) -> NamedSharding:
    """Row-shard an (N, d) corpus matrix along the corpus axis."""
    return NamedSharding(mesh, P(CORPUS_AXIS, None))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-shard an (B, ...) array along the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple
