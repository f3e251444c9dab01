"""Does XLA stream int8 weights through a bf16 matvec, or materialize?

Batch-1 decode is weight-stream-bound (~523 GB/s effective on the bf16
path). If XLA fuses convert(s8->bf16) into the dot's operand read, an
int8-stored weight matmul halves HBM bytes with zero Pallas work; if it
materializes the bf16 copy first, traffic goes UP 1.5x and the idea is
dead. Times x @ W for the decode-step shapes at batch 1 and 8,
W stored bf16 vs int8 (.astype(bf16) inside the jitted graph).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    shapes = [
        ("mlp_up", 2048, 8192),
        ("mlp_down", 8192, 2048),
        ("lm_head", 2048, 128_256),
    ]
    for batch in (1, 8):
        for name, d_in, d_out in shapes:
            w = jax.random.normal(
                jax.random.PRNGKey(0), (d_in, d_out), jnp.float32
            )
            w16 = jnp.asarray(w, jnp.bfloat16)
            w8 = jnp.clip(jnp.round(w * 127.0 / 4.0), -127, 127).astype(
                jnp.int8
            )
            reps = 50

            def loop(warr, conv):
                @jax.jit
                def run(warr, seed):
                    def body(i, acc):
                        key = jax.random.fold_in(
                            jax.random.PRNGKey(1), seed + i
                        )
                        x = jax.random.normal(
                            key, (batch, d_in), jnp.bfloat16
                        )
                        wm = conv(warr)
                        y = jax.lax.dot_general(
                            x, wm,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        return acc + jnp.sum(y)
                    return jax.lax.fori_loop(0, reps, body, 0.0)
                return run

            out = {}
            for tag, arr, conv in (
                ("bf16", w16, lambda a: a),
                ("int8", w8, lambda a: a.astype(jnp.bfloat16)),
            ):
                run = loop(arr, conv)
                np.asarray(run(arr, 0))
                t0 = time.time()
                np.asarray(run(arr, 999))
                dt = (time.time() - t0) / reps
                bytes_w = arr.size * arr.dtype.itemsize
                out[tag] = dt
                print(
                    f"b={batch} {name} {tag}: {dt*1e6:.0f} us "
                    f"({bytes_w/dt/1e9:.0f} GB/s weight stream)",
                    flush=True,
                )
            print(
                f"b={batch} {name}: int8 speedup {out['bf16']/out['int8']:.2f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
