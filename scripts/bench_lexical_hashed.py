"""Race the hashed-segment BM25 kernel against the flat-ELL kernel.

Usage: python scripts/bench_lexical_hashed.py [--n 200000]
  [--segments 8,16] [--tile-b 8,32] [--reps 50]
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
    parser.add_argument("--reps", type=int, default=50)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--segments", type=str, default="8,16")
    parser.add_argument("--tile-b", type=str, default="8,32")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from persian_rag_tpu.index.lexical import BM25Index
    from persian_rag_tpu.ops.sparse_scores import (
        hash_segments,
        sparse_topk_hashed_pallas,
        sparse_topk_pallas,
    )

    print(f"backend={jax.default_backend()} N={args.n} batch={args.batch}",
          flush=True)
    rng = np.random.default_rng(3)
    vocab_n = 50_000
    words = rng.zipf(1.3, size=(args.n, 60)) % vocab_n
    docs = [" ".join(map(str, row)) for row in words]
    index = BM25Index().build(docs)
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
    t_slots, k = 8, 10
    vocab_sz = len(index.vocab)

    # correctness probe (fixed queries)
    qi_probe = rng.integers(0, vocab_sz, (32, t_slots)).astype(np.int32)
    qv_probe = np.ones((32, t_slots), np.float32)

    dev_ids = jax.device_put(jnp.asarray(ids))
    dev_vals = jax.device_put(jnp.asarray(vals))
    ws, wi = jax.block_until_ready(sparse_topk_pallas(
        dev_ids, dev_vals, jnp.asarray(qi_probe), jnp.asarray(qv_probe), k
    ))

    def timeit(fn, *arrs):
        @jax.jit
        def timed(seed, *a):
            def body(i, acc):
                key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
                qi = jax.random.randint(
                    key, (args.batch, t_slots), 0, vocab_sz, jnp.int32
                )
                qv = jnp.ones((args.batch, t_slots), jnp.float32)
                s, idx = fn(qi, qv, *a)
                return acc + jnp.sum(s) + jnp.sum(idx).astype(jnp.float32)
            return jax.lax.fori_loop(0, args.reps, body, 0.0)

        t0 = time.time()
        np.asarray(timed(0, *arrs))
        compile_s = time.time() - t0
        t0 = time.time()
        np.asarray(timed(40_000, *arrs))
        return (time.time() - t0) / args.reps, compile_s

    dt, cs = timeit(
        lambda qi, qv, di, dv: sparse_topk_pallas(di, dv, qi, qv, k),
        dev_ids, dev_vals,
    )
    print(f"flat ELL kernel:           {dt*1e3:8.1f} ms / {args.batch} q  "
          f"({args.batch/dt:6.0f} QPS)  compile={cs:.0f}s", flush=True)

    for s_seg in (int(x) for x in args.segments.split(",")):
        ids3, vals3 = hash_segments(ids, vals, s_seg)
        print(f"S={s_seg}: Ls={ids3.shape[2]} "
              f"(storage x{s_seg*ids3.shape[2]/ids.shape[1]:.1f})",
              flush=True)
        d3 = jax.device_put(jnp.asarray(ids3))
        v3 = jax.device_put(jnp.asarray(vals3))
        for tb in (int(x) for x in args.tile_b.split(",")):
            gs, gi = jax.block_until_ready(sparse_topk_hashed_pallas(
                d3, v3, jnp.asarray(qi_probe), jnp.asarray(qv_probe), k,
                tile_b=tb,
            ))
            ok = bool(np.array_equal(np.asarray(gi), np.asarray(wi)))
            dt, cs = timeit(
                lambda qi, qv, a, b, tb=tb: sparse_topk_hashed_pallas(
                    a, b, qi, qv, k, tile_b=tb
                ),
                d3, v3,
            )
            print(
                f"hashed S={s_seg:2d} tile_b={tb:3d}: {dt*1e3:8.1f} ms "
                f"({args.batch/dt:6.0f} QPS)  ids==flat:{ok}  "
                f"compile={cs:.0f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
