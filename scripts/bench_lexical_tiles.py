"""BM25 kernel tile sweep on the TPU.

The b-tiled transposed-ELL kernel re-streams the whole ELL corpus once
per tile_b query rows; at tile_b=8, a 512-query batch streams it 64
times. This sweep races (tile_b, tile_n) combinations at BM25 scale to
find whether the kernel is HBM- or VPU-bound and how much a bigger
query tile buys.

Usage: python scripts/bench_lexical_tiles.py [--n 200000] [--reps 20]
  configs: tile_b:tile_n pairs
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
    parser.add_argument(
        "--configs", type=str, default="8:2048,16:1024,32:512,64:256"
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from persian_rag_tpu.index.lexical import BM25Index
    from persian_rag_tpu.ops.sparse_scores import sparse_topk_pallas

    print(f"backend={jax.default_backend()} N={args.n} batch={args.batch}",
          flush=True)
    rng = np.random.default_rng(3)
    vocab_n = 50_000
    doc_len = 60
    words = rng.zipf(1.3, size=(args.n, doc_len)) % vocab_n
    docs = [" ".join(map(str, row)) for row in words]
    t0 = time.time()
    index = BM25Index().build(docs)
    print(f"build {time.time()-t0:.1f}s vocab={len(index.vocab)} "
          f"buckets={1 if index._buckets is None else len(index._buckets)}",
          flush=True)

    # flatten to ONE ELL (merge buckets) for a clean kernel comparison
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

    # fixed query shape (t slots), fresh VALUES per iteration on device:
    # draw random vocab ids (uniform over the hashed vocab is fine for
    # kernel timing; scores are not checked here)
    t_slots = 8
    k = 10

    for spec in args.configs.split(","):
        tile_b, tile_n = (int(x) for x in spec.split(":"))

        def search(qi, qv, tb=tile_b, tn=tile_n):
            return sparse_topk_pallas(
                dev_ids, dev_vals, qi, qv, k, tile_n=tn, tile_b=tb
            )

        @jax.jit
        def timed(di, dv, seed, tb=tile_b, tn=tile_n):
            def body(i, acc):
                key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
                qi = jax.random.randint(
                    key, (args.batch, t_slots), 0, len(index.vocab),
                    jnp.int32,
                )
                qv = jnp.ones((args.batch, t_slots), jnp.float32)
                s, idx = sparse_topk_pallas(
                    di, dv, qi, qv, k, tile_n=tn, tile_b=tb
                )
                return acc + jnp.sum(s) + jnp.sum(idx).astype(jnp.float32)
            return jax.lax.fori_loop(0, args.reps, body, 0.0)

        try:
            t0 = time.time()
            np.asarray(timed(dev_ids, dev_vals, 0))
            compile_s = time.time() - t0
            t0 = time.time()
            np.asarray(timed(dev_ids, dev_vals, 40_000))
            dt = (time.time() - t0) / args.reps
            el_pad = (ids.shape[1] + 7) // 8 * 8
            stream = (
                -(-args.batch // tile_b) * args.n * el_pad * 8 / dt / 1e9
            )
            print(
                f"tile_b={tile_b:3d} tile_n={tile_n:5d}: "
                f"{dt*1e3:8.1f} ms / {args.batch} q  "
                f"{args.batch/dt:7.0f} QPS  stream {stream:6.1f} GB/s  "
                f"compile={compile_s:.0f}s",
                flush=True,
            )
        except Exception as e:
            print(f"tile_b={tile_b} tile_n={tile_n}: FAILED {e}",
                  flush=True)


if __name__ == "__main__":
    main()
