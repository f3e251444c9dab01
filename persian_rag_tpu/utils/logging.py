"""Logging setup.

The reference prints everywhere, suppresses third-party log noise
globally (reference: src/embedding_trainer.py:15-17), and relies on the
operator tee-ing stdout into logs/*.txt. This module gives the same
outcome structurally: one call configures a namespaced logger writing to
both the console and a logs/<name>.log file, and quiets noisy
third-party loggers.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

_NOISY = ("jax", "transformers", "urllib3", "filelock", "fsspec")


def setup_logging(
    name: str = "persian_rag_tpu",
    log_dir: Optional[str] = "logs",
    level: int = logging.INFO,
    quiet_third_party: bool = True,
) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:  # idempotent
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s %(message)s", "%H:%M:%S"
    )
    console = logging.StreamHandler()
    console.setFormatter(fmt)
    logger.addHandler(console)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        file_handler = logging.FileHandler(
            os.path.join(log_dir, f"{name.split('.')[-1]}.log"),
            encoding="utf-8",
        )
        file_handler.setFormatter(fmt)
        logger.addHandler(file_handler)
    if quiet_third_party:
        for noisy in _NOISY:
            logging.getLogger(noisy).setLevel(logging.ERROR)
    return logger


def get_logger(name: str = "persian_rag_tpu") -> logging.Logger:
    return logging.getLogger(name)
