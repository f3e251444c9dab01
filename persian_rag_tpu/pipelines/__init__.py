from persian_rag_tpu.pipelines import phase1, phase2, phase3, phase4

__all__ = ["phase1", "phase2", "phase3", "phase4"]
