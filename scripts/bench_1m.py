"""Manual large-scale benchmark: 1M+ chunks, single chip or sharded.

BASELINE.json configs[4] calls for a sharded 1M+-chunk index across 8
chips with merged per-shard top-k. Only one physical chip is available
in this environment, so this script:
  * runs the fused flat search over a 1M x 384 bf16 corpus on one chip
    (768 MB HBM resident), and
  * optionally validates the 8-way sharded path on virtual CPU devices
    (--virtual-sharded), which exercises the identical shard_map +
    all_gather merge the 8-chip run would use.

Usage:  python scripts/bench_1m.py [--n 1000000] [--virtual-sharded]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1_000_000)
    parser.add_argument("--d", type=int, default=384)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--reps", type=int, default=10)
    parser.add_argument("--virtual-sharded", action="store_true")
    args = parser.parse_args()

    if args.virtual_sharded:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )

    import jax
    import jax.numpy as jnp

    if args.virtual_sharded:
        jax.config.update("jax_platforms", "cpu")

    from persian_rag_tpu.ops.flat_topk import flat_topk_pallas

    print(f"backend={jax.default_backend()} devices={len(jax.devices())}")
    rng = np.random.default_rng(0)
    # build the corpus in slabs to bound host memory
    slabs = []
    remaining = args.n
    while remaining > 0:
        take = min(remaining, 200_000)
        slab = rng.standard_normal((take, args.d)).astype(np.float32)
        slab /= np.linalg.norm(slab, axis=1, keepdims=True)
        slabs.append(slab)
        remaining -= take
    corpus = np.concatenate(slabs)
    del slabs

    if args.virtual_sharded:
        from persian_rag_tpu.core.mesh import build_mesh
        from persian_rag_tpu.parallel.sharded_search import (
            shard_corpus,
            sharded_flat_topk,
        )

        mesh = build_mesh(corpus_axis=8, data_axis=1)
        sharded, n_actual = shard_corpus(jnp.asarray(corpus), mesh)
        queries = jnp.asarray(
            rng.standard_normal((args.batch, args.d)), jnp.float32
        )
        t0 = time.time()
        s, i = sharded_flat_topk(
            queries, sharded, args.k, n_actual, mesh, metric="dot"
        )
        jax.block_until_ready((s, i))
        print(
            f"8-way virtual sharded search over N={args.n}: "
            f"{time.time() - t0:.1f}s (CPU, correctness-path validation)"
        )
        return

    c16 = jax.device_put(jnp.asarray(corpus).astype(jnp.bfloat16))
    search = functools.partial(
        flat_topk_pallas,
        k=args.k,
        metric="dot",
        tile_q=256,
        tile_n=2048,
        compute_dtype=jnp.bfloat16,
        mode="fast",
    )

    @jax.jit
    def run(c, seed):
        def body(i, acc):
            key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
            q = jax.random.normal(key, (args.batch, args.d), jnp.float32)
            s, idx = search(q, c)
            return acc + jnp.sum(s) + jnp.sum(idx).astype(jnp.float32)

        return jax.lax.fori_loop(0, args.reps, body, 0.0)

    np.asarray(run(c16, 0))
    t0 = time.time()
    np.asarray(run(c16, 10_000))
    dt = (time.time() - t0) / args.reps
    print(
        f"N={args.n} d={args.d} bf16 fast: {dt*1e3:.2f} ms / {args.batch} q "
        f"-> {args.batch/dt:.0f} QPS "
        f"({args.n*args.d*2/dt/1e9:.0f} GB/s effective)"
    )


if __name__ == "__main__":
    sys.exit(main())
