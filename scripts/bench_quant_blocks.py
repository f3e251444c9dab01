"""Sweep block_n (and VMEM budget) for the W8A16 kernels per decode shape.

The default pick_block_n caps the int8 weight block at 2 MB; this sweeps
explicit block_n values to find per-shape winners (the down-proj at
K=8192 defaults to bn=256, suspiciously small).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from persian_rag_tpu.ops.quant_matmul import (
        quantize_weight,
        w8a16_matmul,
        w8a16_matmul_nt,
    )

    reps = 100
    overhead = 0.027
    batch = int(os.environ.get("QB_BATCH", "1"))

    cases = [
        ("gateup", 2048, 16384, False, (512, 1024, 2048, 4096)),
        ("down", 8192, 2048, False, (128, 256, 512, 1024, 2048)),
        ("lm_head_nt", 2048, 128_256, True, (384, 768, 1536)),
    ]
    for name, d_in, d_out, nt, bns in cases:
        wf = np.asarray(
            np.random.default_rng(0).normal(size=(d_in, d_out)), np.float32
        )
        if nt:
            v, s = quantize_weight(jnp.asarray(wf.T), axis=1)
        else:
            v, s = quantize_weight(jnp.asarray(wf))
        v, s = jax.block_until_ready((v, s))
        for bn in bns:
            n = d_out
            if n % bn:
                continue

            @jax.jit
            def run(seed):
                def body(i, acc):
                    key = jax.random.fold_in(jax.random.PRNGKey(1), seed + i)
                    x = jax.random.normal(key, (batch, d_in), jnp.bfloat16)
                    if nt:
                        y = w8a16_matmul_nt(x, v, s, block_n=bn)
                    else:
                        y = w8a16_matmul(x, v, s, block_n=bn)
                    return acc + jnp.sum(y.astype(jnp.float32))
                return jax.lax.fori_loop(0, reps, body, 0.0)

            try:
                np.asarray(run(0))
                t0 = time.time()
                np.asarray(run(999))
                dt = (time.time() - t0 - overhead) / reps
                print(
                    f"b={batch} {name} bn={bn}: {dt*1e6:7.0f} us  "
                    f"{d_in*d_out/dt/1e9:6.0f} GB/s int8 stream",
                    flush=True,
                )
            except Exception as e:  # VMEM overflow etc.
                print(f"b={batch} {name} bn={bn}: FAIL {type(e).__name__}",
                      flush=True)


if __name__ == "__main__":
    main()
