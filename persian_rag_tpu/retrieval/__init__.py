from persian_rag_tpu.retrieval.system import MultiModelRetrieval, RetrievalSystem

__all__ = ["RetrievalSystem", "MultiModelRetrieval"]
