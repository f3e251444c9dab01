from persian_rag_tpu.utils.timing import Timer, timed, trace

__all__ = ["Timer", "timed", "trace"]
