from persian_rag_tpu.serve.api import RetrievalServer

__all__ = ["RetrievalServer"]
