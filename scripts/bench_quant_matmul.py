"""Chip A/B: Pallas quantized weight-streaming matmuls vs XLA.

Decode-step shapes, fresh-input fori timing (CLAUDE.md methodology).
Candidates per shape:
  bf16      — XLA dot on bf16 weights (the shipped decode path)
  int8-xla  — XLA dot with .astype(bf16) convert-in-dot (measured dead
              end: convert halves the stream rate, bench_int8_matvec)
  w8a16     — Pallas: int8 tiles DMA'd to VMEM, dequant on-core,
              bf16 MXU dot, per-channel scale on the f32 accumulator
  w8a8      — Pallas: dynamic per-row activation quant, int8 MXU dot

Usage: python scripts/bench_quant_matmul.py [--reps 100] [--shapes all]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--batches", type=str, default="1,8")
    ap.add_argument("--block-n", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from persian_rag_tpu.ops.quant_matmul import (
        quantize_weight,
        w8a16_matmul,
        w8a16_matmul_nt,
        w8a8_matmul,
        pick_block_n,
    )

    shapes = [
        ("gateup", 2048, 16384, False),
        ("down", 8192, 2048, False),
        ("lm_head_nt", 2048, 128_256, True),
    ]
    reps = args.reps
    overhead = 0.027  # fixed relay dispatch+readback, scripts/bench_overhead.py

    for batch in [int(b) for b in args.batches.split(",")]:
        for name, d_in, d_out, nt in shapes:
            wf = np.asarray(
                np.random.default_rng(0).normal(size=(d_in, d_out)), np.float32
            )
            w16 = jnp.asarray(wf, jnp.bfloat16)
            if nt:
                v_nt, s_nt = quantize_weight(jnp.asarray(wf.T), axis=1)
                v_nt, s_nt = jax.block_until_ready((v_nt, s_nt))
                bn = args.block_n or pick_block_n(d_out, d_in)
            else:
                v, s = quantize_weight(jnp.asarray(wf))
                v, s = jax.block_until_ready((v, s))
                bn = args.block_n or pick_block_n(d_out, d_in)
            w8_plain = jnp.asarray(
                np.clip(np.round(wf * 127.0 / 4.0), -127, 127), jnp.int8
            )

            def timed(fn, *arrs):
                @jax.jit
                def run(seed, *arrs):
                    def body(i, acc):
                        key = jax.random.fold_in(
                            jax.random.PRNGKey(1), seed + i
                        )
                        x = jax.random.normal(
                            key, (batch, d_in), jnp.bfloat16
                        )
                        y = fn(x, *arrs)
                        # sum ALL outputs: a column slice here lets XLA
                        # dead-code-narrow the dot to the sliced columns
                        # (Pallas calls are opaque and can't be narrowed,
                        # so a slice skews the A/B by >10x)
                        return acc + jnp.sum(y.astype(jnp.float32))
                    return jax.lax.fori_loop(0, reps, body, 0.0)
                np.asarray(run(0, *arrs))  # compile + warm
                t0 = time.time()
                np.asarray(run(999, *arrs))
                return (time.time() - t0 - overhead) / reps

            rows = {}
            rows["bf16"] = (
                timed(
                    lambda x, w: jax.lax.dot_general(
                        x, w,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ),
                    w16,
                ),
                d_in * d_out * 2,
            )
            rows["int8-xla"] = (
                timed(
                    lambda x, w: jax.lax.dot_general(
                        x, w.astype(jnp.bfloat16),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ),
                    w8_plain,
                ),
                d_in * d_out,
            )
            if nt:
                rows["w8a16"] = (
                    timed(
                        lambda x, vv, ss: w8a16_matmul_nt(
                            x, vv, ss, block_n=bn
                        ),
                        v_nt, s_nt,
                    ),
                    d_in * d_out,
                )
            else:
                rows["w8a16"] = (
                    timed(
                        lambda x, vv, ss: w8a16_matmul(x, vv, ss, block_n=bn),
                        v, s,
                    ),
                    d_in * d_out,
                )
                rows["w8a8"] = (
                    timed(
                        lambda x, vv, ss: w8a8_matmul(x, vv, ss, block_n=bn),
                        v, s,
                    ),
                    d_in * d_out,
                )
            base = rows["bf16"][0]
            for tag, (dt, wbytes) in rows.items():
                print(
                    f"b={batch} {name} bn={bn} {tag}: {dt*1e6:7.0f} us  "
                    f"{wbytes/dt/1e9:6.0f} GB/s wstream  "
                    f"{base/dt:5.2f}x vs bf16",
                    flush=True,
                )


if __name__ == "__main__":
    main()
