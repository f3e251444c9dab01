from persian_rag_tpu.eval.metrics import TextMetrics
from persian_rag_tpu.eval.evaluator import RAGEvaluator

__all__ = ["TextMetrics", "RAGEvaluator"]
