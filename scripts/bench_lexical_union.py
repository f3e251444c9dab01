"""Race the union-slot (batch-deduplicated) BM25 kernel vs the flat
b-tiled ELL kernel on chip.

The flat kernel's VPU match work scales with B*T (every corpus slot
compares against every query term slot); the union kernel dedups the
batch's terms into U slots (work ~ U*L*N, batch-independent) and rides
the per-query accumulation on the MXU. Realistic query batches share
vocabulary (Zipf), so U << B*T; a uniform-random arm reports the
worst case (U ~ B*T).

Usage: python scripts/bench_lexical_union.py [--n 200000] [--reps 20]
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
    parser.add_argument("--reps", type=int, default=20)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--pool", type=int, default=8192)
    parser.add_argument("--check", action="store_true",
                        help="id-parity check flat vs union on one batch")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (env var alone is not "
                        "enough under the axon sitecustomize)")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from persian_rag_tpu.index.lexical import BM25Index
    from persian_rag_tpu.ops.sparse_scores import (
        sparse_topk_pallas,
        sparse_topk_union_pallas,
    )

    print(f"backend={jax.default_backend()} N={args.n} batch={args.batch}",
          flush=True)
    rng = np.random.default_rng(3)
    vocab_n = 50_000
    doc_len = 60
    words = rng.zipf(1.3, size=(args.n, doc_len)) % vocab_n
    docs = [" ".join(map(str, row)) for row in words]
    t0 = time.time()
    index = BM25Index().build(docs)
    print(f"build {time.time()-t0:.1f}s vocab={len(index.vocab)}", flush=True)

    if index._buckets is None:
        ids, vals = index.doc_ids, index.doc_vals
    else:
        L = max(b.ids.shape[1] for b in index._buckets)
        ids = np.full((args.n, L), -1, np.int32)
        vals = np.zeros((args.n, L), np.float32)
        for b in index._buckets:
            ids[b.gids, : b.ids.shape[1]] = b.ids
            vals[b.gids, : b.vals.shape[1]] = b.vals
    print(f"flat ELL L={ids.shape[1]}", flush=True)
    dev_ids = jax.device_put(jnp.asarray(ids))
    dev_vals = jax.device_put(jnp.asarray(vals))

    t_slots = 8
    k = 10
    nvoc = len(index.vocab)
    interp = jax.default_backend() != "tpu"

    # Query pools: Zipf-realistic (terms drawn from the corpus's own
    # word distribution, mapped through the same str-token vocab) and
    # uniform (worst case for dedup).
    zipf_words = rng.zipf(1.3, size=(args.pool, t_slots)) % vocab_n
    zipf_pool = np.vectorize(lambda w: index.vocab.get(str(w), 0))(
        zipf_words
    ).astype(np.int32)
    uni_pool = rng.integers(0, nvoc, (args.pool, t_slots)).astype(np.int32)
    for name, pool in (("zipf", zipf_pool), ("uniform", uni_pool)):
        us = [len(np.unique(pool[rng.integers(0, args.pool, args.batch)]))
              for _ in range(5)]
        print(f"{name} pool: batch-{args.batch} n_union ~ "
              f"{int(np.mean(us))} (B*T={args.batch * t_slots})", flush=True)

    dev_pools = {
        "zipf": jax.device_put(jnp.asarray(zipf_pool)),
        "uniform": jax.device_put(jnp.asarray(uni_pool)),
    }

    if args.check:
        qi = jnp.asarray(zipf_pool[: args.batch])
        qv = jnp.ones((args.batch, t_slots), jnp.float32)
        s0, i0 = sparse_topk_pallas(dev_ids, dev_vals, qi, qv, k,
                                    interpret=interp)
        s1, i1 = sparse_topk_union_pallas(dev_ids, dev_vals, qi, qv, k,
                                          interpret=interp)
        same = np.mean(np.asarray(i0) == np.asarray(i1))
        ds = np.max(np.abs(np.asarray(s0) - np.asarray(s1)))
        print(f"parity: ids equal {same:.4f}, max |ds| {ds:.2e}", flush=True)

    def run(kernel_name, pool_name):
        pool = dev_pools[pool_name]

        @jax.jit
        def timed(di, dv, seed):
            def body(i, acc):
                key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
                rows = jax.random.randint(
                    key, (args.batch,), 0, args.pool, jnp.int32
                )
                qi = pool[rows]
                qv = jnp.ones((args.batch, t_slots), jnp.float32)
                if kernel_name == "flat":
                    s, idx = sparse_topk_pallas(di, dv, qi, qv, k,
                                                interpret=interp)
                else:
                    s, idx = sparse_topk_union_pallas(
                        di, dv, qi, qv, k, interpret=interp)
                return acc + jnp.sum(s) + jnp.sum(idx).astype(jnp.float32)
            return jax.lax.fori_loop(0, args.reps, body, 0.0)

        try:
            t0 = time.time()
            np.asarray(timed(dev_ids, dev_vals, 0))
            compile_s = time.time() - t0
            t0 = time.time()
            np.asarray(timed(dev_ids, dev_vals, 40_000))
            dt = (time.time() - t0) / args.reps
            print(
                f"{kernel_name:6s} {pool_name:8s}: {dt*1e3:8.1f} ms / "
                f"{args.batch} q  {args.batch/dt:7.0f} QPS  "
                f"compile={compile_s:.0f}s",
                flush=True,
            )
        except Exception as e:
            print(f"{kernel_name} {pool_name}: FAILED {type(e).__name__} "
                  f"{str(e)[:300]}", flush=True)

    for kernel_name in ("flat", "union"):
        for pool_name in ("zipf", "uniform"):
            run(kernel_name, pool_name)


if __name__ == "__main__":
    main()
