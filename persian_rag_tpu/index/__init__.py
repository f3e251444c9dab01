from persian_rag_tpu.index.dense import DenseIndex
from persian_rag_tpu.index.lexical import BM25Index, TfidfIndex
from persian_rag_tpu.index.faiss_io import read_faiss_flat, write_faiss_flat

__all__ = [
    "DenseIndex",
    "BM25Index",
    "TfidfIndex",
    "read_faiss_flat",
    "write_faiss_flat",
]
