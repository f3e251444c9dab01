"""persian_rag_tpu — a TPU-native Persian retrieval / RAG framework.

A ground-up JAX / XLA / Pallas rebuild of the capabilities of the
`alirezafarzipour/persian-rag-system` reference (a CUDA/torch research
pipeline): QA data loading, sentence-embedding fine-tuning, PDF chunking,
dense / BM25 / TF-IDF / hybrid retrieval, generation via a llama.cpp-style
HTTP server, a full evaluation-metric suite, and a web UI.

Compute-path design is TPU-first:

* Dense retrieval is an HBM-resident flat index searched by a fused
  Pallas matmul + running-top-k kernel (``persian_rag_tpu.ops.flat_topk``),
  replacing the reference's FAISS dependency
  (reference: src/retrieval.py:92-115, src/create_embeddings.py:130-136).
* BM25 / TF-IDF lexical scoring is a padded sparse match-accumulate kernel
  (``persian_rag_tpu.ops.sparse_scores``), replacing rank_bm25 and
  scikit-learn's TfidfVectorizer (reference: src/retrieval.py:62-87).
* Encoders are Flax transformer ports (MiniLM / DistilUSE / e5 families)
  run batched under ``jit`` (reference: sentence-transformers usage in
  src/embedding_trainer.py, src/create_embeddings.py).
* Corpora beyond one chip shard row-wise over a ``jax.sharding.Mesh``
  with per-shard top-k merged through ICI collectives
  (``persian_rag_tpu.parallel``).

Host-side text plumbing (Persian normalization, chunking, PDF extraction,
metric string math) stays in Python/C++ on the host; the host<->device
boundary is ids + scores.
"""

__version__ = "0.1.0"

from persian_rag_tpu.core.config import Config, load_config  # noqa: F401

__all__ = ["Config", "load_config", "__version__"]
