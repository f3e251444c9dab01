"""First-party reader/writer for FAISS flat index files.

The reference persists its corpora as FAISS ``IndexFlatL2`` files
(reference: src/create_embeddings.py:136, results/faiss/*.index). This
module parses that binary format directly — no faiss dependency — so the
reference's shipped artifacts import as golden fixtures and exports remain
loadable by faiss users.

Format (faiss impl/index_write.cpp, flat indexes only):
    fourcc   4 bytes  'IxF2' (METRIC_L2) | 'IxFI' (METRIC_INNER_PRODUCT)
    d        int32
    ntotal   int64
    dummy    2 x int64 (1<<20 each)
    trained  1 byte bool
    metric   int32 (0=IP, 1=L2)
    codes    uint64 byte-count-as-element-count, then ntotal*d float32
"""
from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

_FOURCC_L2 = b"IxF2"
_FOURCC_IP = b"IxFI"
_DUMMY = 1 << 20


def read_faiss_flat(path: str) -> Tuple[np.ndarray, str]:
    """Read a flat FAISS index file -> ((ntotal, d) float32, metric).

    metric is "l2" or "ip".
    """
    with open(path, "rb") as f:
        fourcc = f.read(4)
        if fourcc not in (_FOURCC_L2, _FOURCC_IP):
            raise ValueError(
                f"{path}: not a flat FAISS index (fourcc={fourcc!r}); "
                "only IndexFlatL2/IndexFlatIP files are supported"
            )
        d = struct.unpack("<i", f.read(4))[0]
        ntotal = struct.unpack("<q", f.read(8))[0]
        f.read(16)  # two dummy int64 fields
        f.read(1)  # is_trained
        metric_code = struct.unpack("<i", f.read(4))[0]
        n_elems = struct.unpack("<Q", f.read(8))[0]
        # faiss <=1.7.x serialized IndexFlat.xb as vector<float> (element
        # count = ntotal*d); newer IndexFlatCodes serializes vector<uint8>
        # (element count = ntotal*d*4). Accept both.
        if n_elems not in (ntotal * d, ntotal * d * 4):
            raise ValueError(
                f"{path}: codes size {n_elems} inconsistent with "
                f"ntotal={ntotal}, d={d}"
            )
        data = np.frombuffer(f.read(ntotal * d * 4), dtype="<f4").reshape(
            ntotal, d
        )
    metric = "ip" if metric_code == 0 else "l2"
    return np.ascontiguousarray(data), metric


def write_faiss_flat(path: str, vectors: np.ndarray, metric: str = "l2") -> None:
    """Write an (N, d) float32 matrix as a faiss-loadable flat index."""
    vectors = np.ascontiguousarray(vectors, dtype="<f4")
    n, d = vectors.shape
    fourcc = _FOURCC_L2 if metric == "l2" else _FOURCC_IP
    metric_code = 1 if metric == "l2" else 0
    with open(path, "wb") as f:
        f.write(fourcc)
        f.write(struct.pack("<i", d))
        f.write(struct.pack("<q", n))
        f.write(struct.pack("<q", _DUMMY))
        f.write(struct.pack("<q", _DUMMY))
        f.write(struct.pack("<?", True))
        f.write(struct.pack("<i", metric_code))
        # Element count as float count (faiss's canonical xb-vector form,
        # accepted by both legacy and current faiss readers).
        f.write(struct.pack("<Q", n * d))
        f.write(vectors.tobytes())
