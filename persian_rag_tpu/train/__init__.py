from persian_rag_tpu.train.trainer import EmbeddingTrainer, InputExample

__all__ = ["EmbeddingTrainer", "InputExample"]
