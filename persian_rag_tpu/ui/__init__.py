from persian_rag_tpu.ui.app import DrugRAGSystem, launch

__all__ = ["DrugRAGSystem", "launch"]
