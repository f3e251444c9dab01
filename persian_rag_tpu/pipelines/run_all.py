"""Run phases 1-4 in sequence.

The reference's scripts/run_all.py is a broken skeleton (it imports a
nonexistent src.evaluation.Evaluator — scripts/run_all.py:9); this one
actually orchestrates the pipeline end-to-end.
"""
from __future__ import annotations

from typing import Dict, Optional

from persian_rag_tpu.core.config import Config
from persian_rag_tpu.pipelines import phase1, phase2, phase3, phase4


def main(
    config: Optional[Config] = None,
    mesh=None,
    tiny: bool = False,
    **phase4_kwargs,
) -> Dict:
    config = config or Config()
    results: Dict = {}
    results["phase1"] = phase1.main(config, mesh=mesh, tiny=tiny)
    results["phase2"] = phase2.main(config, mesh=mesh, tiny=tiny)
    results["phase3"] = phase3.main(config, mesh=mesh, tiny=tiny)
    results["phase4"] = phase4.main(config, mesh=mesh, tiny=tiny, **phase4_kwargs)
    return results
