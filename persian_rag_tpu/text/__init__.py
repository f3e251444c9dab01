from persian_rag_tpu.text.persian import PersianTextProcessor
from persian_rag_tpu.text.chunking import TextChunker

__all__ = ["PersianTextProcessor", "TextChunker"]
