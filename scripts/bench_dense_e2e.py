"""Decompose DenseIndex.search END-TO-END serving latency on chip
(host queries in, numpy results out) — the fori-loop bench measures the
kernel only, but real serving pays per-array relay transfers (~15-35 ms
each): one query upload + readbacks for scores, ids, and the two-stage
proof verdict (`_note_proof_verdict` np.asarray's `ok` synchronously).

Usage: python scripts/bench_dense_e2e.py [--n 100000] [--reps 10]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--d", type=int, default=384)
    parser.add_argument("--reps", type=int, default=10)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--k", type=int, default=10)
    args = parser.parse_args()

    import jax

    from persian_rag_tpu.index.dense import DenseIndex

    print(f"backend={jax.default_backend()} N={args.n}", flush=True)
    rng = np.random.default_rng(11)
    corpus = rng.standard_normal((args.n, args.d), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)

    index = DenseIndex(args.d, metric="ip")
    index.add(corpus)
    t0 = time.perf_counter()
    index.commit()
    print(f"commit {time.perf_counter()-t0:.1f}s mode={index._stage1_mode}",
          flush=True)

    def fresh_queries():
        q = rng.standard_normal((args.batch, args.d), dtype=np.float32)
        return q / np.linalg.norm(q, axis=1, keepdims=True)

    # warm the compile
    index.search(fresh_queries(), args.k)
    index.search(fresh_queries(), args.k)

    t_e2e = 0.0
    for _ in range(args.reps):
        q = fresh_queries()
        t0 = time.perf_counter()
        s, i = index.search(q, args.k)
        t_e2e += time.perf_counter() - t0
    r = args.reps
    print(
        f"search e2e: {1e3*t_e2e/r:6.1f} ms / {args.batch} q"
        f" = {args.batch*r/t_e2e:.0f} QPS",
        flush=True,
    )

    # ground truth on the last batch
    ref = np.argsort(-(q @ corpus.T), axis=1, kind="stable")[:, : args.k]
    print("ids == numpy stable argsort:", np.array_equal(i, ref), flush=True)


if __name__ == "__main__":
    main()
