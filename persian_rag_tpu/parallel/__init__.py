from persian_rag_tpu.parallel.sharded_search import (
    shard_corpus,
    sharded_flat_topk,
)

__all__ = ["shard_corpus", "sharded_flat_topk"]
