from persian_rag_tpu.models.encoder import EncoderConfig, TransformerEncoder
from persian_rag_tpu.models.sentence_encoder import SentenceEncoder

__all__ = ["EncoderConfig", "TransformerEncoder", "SentenceEncoder"]
