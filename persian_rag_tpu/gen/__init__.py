from persian_rag_tpu.gen.client import LlamaClient

__all__ = ["LlamaClient"]
