from persian_rag_tpu.ops.flat_topk import (
    flat_topk,
    flat_topk_exact2_stream,
    flat_topk_ref,
)
from persian_rag_tpu.ops.sparse_scores import (
    sparse_scores,
    sparse_scores_ref,
    sparse_topk,
    sparse_topk_hashed,
    sparse_topk_union,
    sparse_topk_union_hashed,
)

__all__ = [
    "flat_topk",
    "flat_topk_exact2_stream",
    "flat_topk_ref",
    "sparse_scores",
    "sparse_scores_ref",
    "sparse_topk",
    "sparse_topk_hashed",
    "sparse_topk_union",
    "sparse_topk_union_hashed",
]
