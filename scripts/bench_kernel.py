"""Micro-benchmark for flat_topk kernel variants on the real TPU.

Usage: python scripts/bench_kernel.py [config ...]
  config = name:mode:dtype:tile_q:tile_n:n_easy  (dtype = f32|bf16)

Timing follows the relay-safe methodology (CLAUDE.md): one jitted
lax.fori_loop generating fresh device-side queries per iteration,
scalar readback. Prints per-config ms/batch, QPS, achieved TFLOP/s and
HBM GB/s (corpus stream), plus Recall@10 vs a NumPy exact reference.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 100_000
D = 384
K = 10
BATCH = 512
REPS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from persian_rag_tpu.ops.flat_topk import flat_topk_pallas

    configs = sys.argv[1:] or [
        "exact_base:exact:f32:256:1024:4",
        "fast_base:fast:bf16:256:2048:4",
    ]

    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((N, D)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    probe = rng.standard_normal((64, D)).astype(np.float32)
    probe /= np.linalg.norm(probe, axis=1, keepdims=True)
    ref_scores = probe @ corpus.T
    ref_idx = np.argsort(-ref_scores, axis=1)[:, :K]

    c32 = jax.device_put(jnp.asarray(corpus))
    c16 = jax.device_put(jnp.asarray(corpus).astype(jnp.bfloat16))

    interpret = jax.default_backend() != "tpu"
    print(f"backend={jax.default_backend()} N={N} d={D} batch={BATCH} k={K}",
          flush=True)

    c32t = c16t = None
    for spec in configs:
        parts = spec.split(":")
        name, mode, dtype, tile_q, tile_n, n_easy = parts[:6]
        transposed = len(parts) > 6 and parts[6] == "T"
        tile_q, tile_n, n_easy = int(tile_q), int(tile_n), int(n_easy)
        cdt = jnp.float32 if dtype == "f32" else jnp.bfloat16
        if transposed:
            if c32t is None:
                c32t = jax.device_put(jnp.asarray(corpus.T.copy()))
                c16t = jax.device_put(
                    jnp.asarray(corpus.T.copy()).astype(jnp.bfloat16)
                )
            cdev = c32t if dtype == "f32" else c16t
        else:
            cdev = c32 if dtype == "f32" else c16

        if mode == "scan":  # XLA lax.scan tiled exact path
            from persian_rag_tpu.ops.flat_topk import flat_topk_scan

            def search(q, c=cdev, cdt=cdt, tn=tile_n):
                return flat_topk_scan(q, c, K, "dot", chunk=tn or 16_384)
        elif mode == "ref":  # plain-XLA full materialization + top_k
            from persian_rag_tpu.ops.flat_topk import flat_topk_ref

            def search(q, c=cdev, cdt=cdt):
                return flat_topk_ref(q, c, K, "dot", compute_dtype=cdt)
        elif mode == "xlamax":  # plain-XLA matmul + per-query max
            def search(q, c=cdev, cdt=cdt):
                s = jnp.dot(
                    q.astype(cdt), c.T, preferred_element_type=jnp.float32
                )
                m = jnp.max(s, axis=1, keepdims=True)
                return m, jnp.zeros((q.shape[0], K), jnp.int32)
        else:
            def search(q, c=cdev, mode=mode, tq=tile_q, tn=tile_n,
                       ne=n_easy, cdt=cdt, tr=transposed):
                return flat_topk_pallas(
                    q, c, K, metric="dot", tile_q=tq, tile_n=tn,
                    compute_dtype=cdt, mode=mode, n_easy=ne,
                    interpret=interpret, corpus_transposed=tr,
                )

        # recall check (fresh inputs; relay caches identical dispatches);
        # skipped for the maxonly diagnostic floor (not valid top-k)
        if mode in ("maxonly", "xlamax"):
            recall, compile_s = float("nan"), 0.0
        else:
            t_first = time.time()
            got = np.asarray(
                jax.block_until_ready(search(jnp.asarray(probe)))[1]
            )
            compile_s = time.time() - t_first
            recall = float(np.mean([
                len(set(got[i]) & set(ref_idx[i])) / K
                for i in range(len(probe))
            ]))

        @jax.jit
        def timed(c, seed):
            def body(i, acc):
                key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
                q = jax.random.normal(key, (BATCH, D), jnp.float32)
                s, idx = search(q, c)
                return acc + jnp.sum(s) + jnp.sum(idx).astype(jnp.float32)
            return jax.lax.fori_loop(0, REPS, body, 0.0)

        np.asarray(timed(cdev, 0))  # compile + warm
        t0 = time.time()
        np.asarray(timed(cdev, 50_000))
        dt = (time.time() - t0) / REPS
        qps = BATCH / dt
        flops = 2.0 * BATCH * N * D
        bytes_c = N * D * (4 if dtype == "f32" else 2)
        q_tiles = -(-BATCH // tile_q) if tile_q else 1
        print(
            f"{name:24s} {dt*1e3:7.2f} ms  {qps:9.0f} QPS  "
            f"{flops/dt/1e12:6.2f} TF/s  "
            f"{bytes_c*q_tiles/dt/1e9:6.1f} GB/s(corpus x{q_tiles})  "
            f"R@10={recall:.4f}  compile={compile_s:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
