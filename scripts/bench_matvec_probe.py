"""Mosaic matvec probe for batch-1 int8 decode (VERDICT r3 #9).

b1 int8 decode measures 1.70 ms/step, weight-stream-bound at ~520 GB/s
aggregate while the isolated w8a16 kernels reach 271-673 GB/s by shape.
This probes whether a different kernel SCHEDULE moves the per-shape
ceiling for the decode matvec shapes (Llama-1B: qkv/o 2048x2048-ish,
mlp 2048x8192 + 8192x2048, lm_head 2048x128256):

  arms per shape, batch 1 (padded to the 16-row MXU min):
    w8a16        — shipped kernel, pick_block_n policy (2 MB budget)
    w8a16_4m     — same kernel, 4 MB VMEM budget (bigger N blocks)
    w8a16_2d     — 2-D grid (n x k) with f32 accumulation: small
                   (bk, bn) int8 blocks let N blocks grow without
                   blowing VMEM, trading one extra o_ref read/write
                   per k step
    xla_conv     — XLA convert-in-dot baseline

Interpretation: if no arm beats the shipped kernel materially, the b1
step's ~520 GB/s aggregate is glue (attention/KV/norms/small-op
latency), not matvec schedule — record the dead end. If an arm wins,
adopt its schedule in ops/quant_matmul.py.

Usage: python scripts/bench_matvec_probe.py [--reps 100]
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
    parser.add_argument("--reps", type=int, default=100)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from persian_rag_tpu.ops.quant_matmul import (
        _w8a16_call,
        pick_block_n,
        quantize_weight,
    )

    interpret = jax.default_backend() != "tpu"
    print(f"backend={jax.default_backend()} batch={args.batch}",
          flush=True)

    def _round_up(n, m):
        return ((n + m - 1) // m) * m

    def w8a16_2d_call(x, values, scale, *, block_n, block_k):
        b, k = x.shape
        n = values.shape[1]
        b_pad = max(16, _round_up(b, 16))
        x = jnp.pad(x.astype(jnp.bfloat16), ((0, b_pad - b), (0, 0)))
        grid = (n // block_n, k // block_k)

        def kernel(x_ref, w_ref, s_ref, o_ref):
            kk = pl.program_id(1)
            acc = jnp.dot(
                x_ref[...], w_ref[...].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )

            @pl.when(kk == 0)
            def _init():
                o_ref[...] = acc

            @pl.when(kk > 0)
            def _acc():
                o_ref[...] += acc

            @pl.when(kk == grid[1] - 1)
            def _scale():
                o_ref[...] *= s_ref[...]

        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b_pad, block_k), lambda i, j: (0, j)),
                pl.BlockSpec((block_k, block_n), lambda i, j: (j, i)),
                pl.BlockSpec((1, block_n), lambda i, j: (0, i)),
            ],
            out_specs=pl.BlockSpec((b_pad, block_n), lambda i, j: (0, i)),
            out_shape=jax.ShapeDtypeStruct((b_pad, n), jnp.float32),
            interpret=interpret,
        )(x, values, scale)
        return out[:b]

    shapes = [
        ("qkv_o", 2048, 2048),
        ("mlp_up", 2048, 8192),
        ("mlp_down", 8192, 2048),
        ("lm_head", 2048, 128_256),
    ]
    b = args.batch
    for name, K, N in shapes:
        N_pad = _round_up(N, 128)
        w = np.random.default_rng(0).standard_normal((K, N_pad)).astype(
            np.float32
        )
        values, scale = quantize_weight(jnp.asarray(w))
        values = jax.device_put(values)
        scale = jax.device_put(scale)
        nbytes = K * N_pad  # int8 weight bytes streamed per call

        arms = []
        bn_std = pick_block_n(N_pad, K)
        arms.append(("w8a16", lambda x, bn=bn_std: _w8a16_call(
            x, values, scale, block_n=bn, interpret=interpret)))
        try:
            bn_4m = pick_block_n(N_pad, K, vmem_budget=4 * 1024 * 1024)
            if bn_4m != bn_std:
                arms.append(("w8a16_4m", lambda x, bn=bn_4m: _w8a16_call(
                    x, values, scale, block_n=bn, interpret=interpret)))
        except ValueError:
            pass
        for bn2, bk2 in ((1024, 512), (2048, 256), (4096, 256)):
            if N_pad % bn2 == 0 and K % bk2 == 0 and bn2 * bk2 <= 2**21:
                arms.append((
                    f"2d_bn{bn2}_bk{bk2}",
                    functools.partial(
                        jax.jit(
                            lambda x, bn, bk: w8a16_2d_call(
                                x, values, scale, block_n=bn, block_k=bk
                            ),
                            static_argnums=(1, 2),
                        ),
                        bn=bn2, bk=bk2,
                    ),
                ))
        w16 = jax.jit(lambda v, s: (v.astype(jnp.bfloat16)
                                    * s.astype(jnp.bfloat16)))(values, scale)
        arms.append(("xla_conv", jax.jit(
            lambda x: jnp.dot(
                x.astype(jnp.bfloat16),
                (values.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)),
                preferred_element_type=jnp.float32,
            ))))
        arms.append(("bf16_ref", jax.jit(
            lambda x: jnp.dot(x.astype(jnp.bfloat16), w16,
                              preferred_element_type=jnp.float32))))

        for arm_name, fn in arms:
            @jax.jit
            def timed(seed, fn=fn):
                def body(i, acc):
                    key = jax.random.fold_in(jax.random.PRNGKey(0),
                                             seed + i)
                    x = jax.random.normal(key, (b, K), jnp.float32)
                    return acc + jnp.sum(fn(x))
                return jax.lax.fori_loop(0, args.reps, body, 0.0)

            try:
                np.asarray(timed(0))
                best = 1e30
                for t in range(3):
                    t0 = time.time()
                    np.asarray(timed(1000 * (t + 1)))
                    best = min(best, (time.time() - t0) / args.reps)
                eff = (2 * nbytes if arm_name == "bf16_ref"
                       else nbytes)
                print(
                    f"{name:9s} {arm_name:14s} {best*1e6:8.1f} us  "
                    f"{eff/best/1e9:6.1f} GB/s",
                    flush=True,
                )
            except Exception as e:
                print(f"{name:9s} {arm_name:14s} FAILED: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
