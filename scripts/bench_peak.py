"""MXU calibration: what matmul rate can this chip actually sustain?

Times square bf16/int8 matmuls (shape-independent peak) and the search
shape family (M=batch, K=384, N=corpus slice) across M and K variants,
with the relay-safe fori methodology. Establishes whether the flat-search
kernel's TF/s ceiling is a chip property or a kernel/shape artifact.
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()}", flush=True)
    reps = 8

    def time_matmul(name, m, k, n, in_dtype, acc_dtype, reps=reps):
        a0 = jnp.zeros((m, k), in_dtype)
        b = jax.device_put(
            jnp.asarray(
                np.random.default_rng(0).integers(-3, 3, (k, n)), np.float32
            ).astype(in_dtype)
        )

        @jax.jit
        def run(b, seed):
            def body(i, acc):
                key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
                if in_dtype == jnp.int8:
                    a = jax.random.randint(
                        key, (m, k), -127, 127, jnp.int32
                    ).astype(jnp.int8)
                else:
                    a = jax.random.normal(key, (m, k), jnp.float32).astype(
                        in_dtype
                    )
                s = jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype,
                )
                return acc + jnp.sum(jnp.max(s, axis=1)).astype(jnp.float32)
            return jax.lax.fori_loop(0, reps, body, 0.0)

        np.asarray(run(b, 0))
        t0 = time.time()
        np.asarray(run(b, 7_000))
        dt = (time.time() - t0) / reps
        tf = 2.0 * m * k * n / dt / 1e12
        print(
            f"{name:28s} M={m:5d} K={k:4d} N={n:7d} "
            f"{dt*1e3:8.2f} ms  {tf:7.2f} TF/s",
            flush=True,
        )
        return tf

    # shape-independent peaks
    time_matmul("square_bf16_4k", 4096, 4096, 4096, jnp.bfloat16, jnp.float32)
    time_matmul("square_bf16_8k", 8192, 8192, 8192, jnp.bfloat16, jnp.float32)
    time_matmul("square_int8_4k", 4096, 4096, 4096, jnp.int8, jnp.int32)
    time_matmul("square_int8_8k", 8192, 8192, 8192, jnp.int8, jnp.int32)

    # search-shape family: K=384 contraction
    time_matmul("search_bf16_m512", 512, 384, 262144, jnp.bfloat16, jnp.float32)
    time_matmul("search_bf16_m1024", 1024, 384, 262144, jnp.bfloat16, jnp.float32)
    time_matmul("search_bf16_m2048", 2048, 384, 262144, jnp.bfloat16, jnp.float32)
    time_matmul("search_int8_m512", 512, 384, 262144, jnp.int8, jnp.int32)
    time_matmul("search_int8_m2048", 2048, 384, 262144, jnp.int8, jnp.int32)
    # wider K (8 queries packed per row? no — just calibration of K effect)
    time_matmul("search_bf16_k1536", 512, 1536, 65536, jnp.bfloat16, jnp.float32)


if __name__ == "__main__":
    sys.exit(main())
