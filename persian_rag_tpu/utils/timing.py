"""Timing and profiling utilities.

The reference instruments with ad-hoc time.time() deltas persisted under
avg_retrieval_time / avg_generation_time / total_time keys (reference:
src/evaluation.py:282-299, :351-353). This module centralizes that
pattern and adds real device tracing via jax.profiler (absent in the
reference).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class Timer:
    """Accumulates named wall-clock intervals; .summary() mirrors the
    reference's *_time result keys."""

    def __init__(self) -> None:
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        start = time.time()
        try:
            yield
        finally:
            self._totals[name] += time.time() - start
            self._counts[name] += 1

    def add(self, name: str, seconds: float) -> None:
        self._totals[name] += seconds
        self._counts[name] += 1

    def total(self, name: str) -> float:
        return self._totals[name]

    def mean(self, name: str) -> float:
        count = self._counts[name]
        return self._totals[name] / count if count else 0.0

    def summary(self, prefix: str = "") -> Dict[str, float]:
        out: Dict[str, float] = {}
        for name in self._totals:
            out[f"{prefix}avg_{name}_time"] = self.mean(name)
        out[f"{prefix}total_time"] = sum(
            self.mean(name) for name in self._totals
        )
        return out


@contextlib.contextmanager
def timed(label: str, sink=None) -> Iterator[None]:
    """Print (or collect) one wall-clock interval."""
    start = time.time()
    try:
        yield
    finally:
        elapsed = time.time() - start
        if sink is not None:
            sink[label] = elapsed
        else:
            print(f"[{label}] {elapsed:.3f}s")


@contextlib.contextmanager
def trace(log_dir: Optional[str] = "logs/jax_trace") -> Iterator[None]:
    """Capture a jax.profiler device trace (view with TensorBoard or
    Perfetto). No-op if profiling is unavailable."""
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
