from persian_rag_tpu.data.loader import DataLoader

__all__ = ["DataLoader"]
