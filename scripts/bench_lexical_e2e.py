"""Decompose BM25Index.search end-to-end latency on chip: host encode,
query upload, fused dispatch, and readback — the kernel-only A/B
(bench_lexical_union.py) measures ~36 ms at 200k while index.search
measures ~103 ms, and the ~65 ms gap is serving overhead, not kernel.

Usage: python scripts/bench_lexical_e2e.py [--n 200000] [--reps 10]
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
    parser.add_argument("--n", type=int, default=200_000)
    parser.add_argument("--reps", type=int, default=10)
    parser.add_argument("--batch", type=int, default=512)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from persian_rag_tpu.index.lexical import BM25Index, _fused_bucket_topk

    print(f"backend={jax.default_backend()} N={args.n}", flush=True)
    rng = np.random.default_rng(3)
    words = rng.zipf(1.3, size=(args.n, 60)) % 50_000
    docs = [" ".join(map(str, row)) for row in words]
    index = BM25Index().build(docs)
    nb = 1 if index._buckets is None else len(index._buckets)
    print(f"buckets={nb}", flush=True)

    def fresh_queries():
        return [" ".join(map(str, rng.zipf(1.3, size=8) % 50_000))
                for _ in range(args.batch)]

    # warm both kernels' compiles
    index.search(fresh_queries(), 10)
    index.batch_kernel = "flat"
    index.search(fresh_queries(), 10)
    index.batch_kernel = None

    for label in ("auto(union)", "flat"):
        index.batch_kernel = None if label.startswith("auto") else "flat"
        t_enc = t_up = t_disp = t_read = t_e2e = 0.0
        for _ in range(args.reps):
            queries = fresh_queries()
            t0 = time.perf_counter()
            terms = [index._query_terms(q) for q in queries]
            qids_np, qvals_np = index._encode_queries(terms)
            t1 = time.perf_counter()
            qids = jnp.asarray(qids_np)
            qvals = jnp.asarray(qvals_np)
            jax.block_until_ready((qids, qvals))
            t2 = time.perf_counter()
            use_union = index._union_gate(qids_np)
            kbs = tuple(min(10, b.n_actual) for b in index._buckets) \
                if index._buckets is not None else ()
            if index._buckets is not None:
                s, i = _fused_bucket_topk(
                    tuple(b.dev_ids for b in index._buckets),
                    tuple(b.dev_vals for b in index._buckets),
                    tuple(b.dev_gids for b in index._buckets),
                    qids, qvals, kbs=kbs, k=10,
                    use_pallas=None, use_union=use_union,
                )
            jax.block_until_ready((s, i))
            t3 = time.perf_counter()
            s_np, i_np = np.asarray(s), np.asarray(i)
            t4 = time.perf_counter()
            t_enc += t1 - t0
            t_up += t2 - t1
            t_disp += t3 - t2
            t_read += t4 - t3
            t_e2e += t4 - t0
        r = args.reps
        print(
            f"{label:12s}: encode {1e3*t_enc/r:6.1f}  upload {1e3*t_up/r:6.1f}"
            f"  dispatch+block {1e3*t_disp/r:6.1f}  readback {1e3*t_read/r:6.1f}"
            f"  | e2e {1e3*t_e2e/r:6.1f} ms / {args.batch} q"
            f" = {args.batch*r/t_e2e:.0f} QPS",
            flush=True,
        )

    # packed single-transfer serving path (index.search): one int32
    # upload (qids | bitcast qvals) and one f32 readback (scores |
    # bitcast ids) instead of 2 uploads + 2 readbacks
    index.batch_kernel = None
    index.search(fresh_queries(), 10)  # warm the packed compile
    t_e2e = 0.0
    for _ in range(args.reps):
        queries = fresh_queries()
        t0 = time.perf_counter()
        s, i = index.search(queries, 10)
        t_e2e += time.perf_counter() - t0
    r = args.reps
    print(
        f"{'packed e2e':12s}: index.search {1e3*t_e2e/r:6.1f} ms /"
        f" {args.batch} q = {args.batch*r/t_e2e:.0f} QPS",
        flush=True,
    )
    print("sanity top-1 of q0:", i[0][:3], s[0][:3], flush=True)


if __name__ == "__main__":
    main()
