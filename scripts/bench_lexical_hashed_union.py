"""Race the hashed-union BM25 kernel (segment-partitioned batch dedup)
vs the flat union kernel on chip.

The union kernel's match work is U*L*TN per corpus tile; segment-
grouping the union chunks over a hashed-segment corpus cuts it to
~U*Ls*TN (Ls ~ L/S padded) at the price of per-segment chunk padding
and a 2-2.5x corpus stream (noise — the union path is compute-bound at
these scales).

Usage: python scripts/bench_lexical_hashed_union.py [--n 200000]
       [--reps 20] [--segments 8] [--u-chunk 128]
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
    parser.add_argument("--segments", type=int, default=8)
    parser.add_argument("--u-chunk", type=int, default=128)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from persian_rag_tpu.index.lexical import BM25Index
    from persian_rag_tpu.ops.sparse_scores import (
        hash_segments,
        sparse_topk_union_hashed_pallas,
        sparse_topk_union_pallas,
    )

    print(
        f"backend={jax.default_backend()} N={args.n} batch={args.batch} "
        f"S={args.segments} UC={args.u_chunk}",
        flush=True,
    )
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
    t0 = time.time()
    ids3, vals3 = hash_segments(ids, vals, args.segments)
    n, s_n, ls = ids3.shape
    print(
        f"flat L={ids.shape[1]}, hashed S={s_n} Ls={ls} "
        f"(bytes x{s_n*ls/ids.shape[1]:.2f}, repack {time.time()-t0:.1f}s)",
        flush=True,
    )
    dev_ids = jax.device_put(jnp.asarray(ids))
    dev_vals = jax.device_put(jnp.asarray(vals))
    dev_ids3 = jax.device_put(jnp.asarray(ids3))
    dev_vals3 = jax.device_put(jnp.asarray(vals3))

    t_slots = 8
    k = 10
    interp = jax.default_backend() != "tpu"

    zipf_words = rng.zipf(1.3, size=(args.pool, t_slots)) % vocab_n
    zipf_pool = np.vectorize(lambda w: index.vocab.get(str(w), 0))(
        zipf_words
    ).astype(np.int32)
    us = [len(np.unique(zipf_pool[rng.integers(0, args.pool, args.batch)]))
          for _ in range(5)]
    print(f"zipf pool: batch-{args.batch} n_union ~ {int(np.mean(us))} "
          f"(B*T={args.batch * t_slots})", flush=True)
    dev_pool = jax.device_put(jnp.asarray(zipf_pool))

    # parity check on one batch
    qi = jnp.asarray(zipf_pool[: args.batch])
    qv = jnp.ones((args.batch, t_slots), jnp.float32)
    s0, i0 = sparse_topk_union_pallas(dev_ids, dev_vals, qi, qv, k,
                                      interpret=interp)
    s1, i1 = sparse_topk_union_hashed_pallas(
        dev_ids3, dev_vals3, qi, qv, k, u_chunk=args.u_chunk,
        interpret=interp,
    )
    same = np.mean(np.asarray(i0) == np.asarray(i1))
    ds = np.max(np.abs(np.asarray(s0) - np.asarray(s1)))
    print(f"parity vs flat union: ids equal {same:.4f}, max |ds| {ds:.2e}",
          flush=True)

    def run(kernel_name):
        # big arrays must be ARGUMENTS: jit constants over ~300MB hit
        # the relay's remote-compile HTTP body limit (413)
        @jax.jit
        def timed(di, dv, pool, seed):
            def body(i, acc):
                key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
                rows = jax.random.randint(
                    key, (args.batch,), 0, args.pool, jnp.int32
                )
                qi = pool[rows]
                qv = jnp.ones((args.batch, t_slots), jnp.float32)
                if kernel_name == "union":
                    s, idx = sparse_topk_union_pallas(
                        di, dv, qi, qv, k, interpret=interp)
                else:
                    s, idx = sparse_topk_union_hashed_pallas(
                        di, dv, qi, qv, k,
                        u_chunk=args.u_chunk, interpret=interp)
                return acc + jnp.sum(s) + jnp.sum(idx).astype(jnp.float32)
            return jax.lax.fori_loop(0, args.reps, body, 0.0)

        di, dv = (
            (dev_ids, dev_vals) if kernel_name == "union"
            else (dev_ids3, dev_vals3)
        )
        try:
            t0 = time.time()
            np.asarray(timed(di, dv, dev_pool, 0))
            compile_s = time.time() - t0
            t0 = time.time()
            np.asarray(timed(di, dv, dev_pool, 40_000))
            dt = (time.time() - t0) / args.reps
            print(
                f"{kernel_name:12s}: {dt*1e3:8.1f} ms / {args.batch} q  "
                f"{args.batch/dt:7.0f} QPS  compile={compile_s:.0f}s",
                flush=True,
            )
        except Exception as e:
            print(f"{kernel_name}: FAILED {type(e).__name__} "
                  f"{str(e)[:300]}", flush=True)

    for kernel_name in ("union", "hashed-union"):
        run(kernel_name)


if __name__ == "__main__":
    main()
