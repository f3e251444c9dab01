"""Calibrate the fixed per-measurement overhead of the fori-loop timing
methodology on the relay-attached TPU.

Runs the SAME computation with reps in {8, 32, 128, 512} and fits
time_total = intercept + reps * per_rep. If the intercept is tens of ms
(one relay readback), every per-rep number measured at reps=8..20 is
inflated by intercept/reps — which changes the interpretation of every
kernel benchmark in this repo.
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    M, K, N = 512, 384, 1_000_000
    b = jax.device_put(
        jnp.asarray(rng.standard_normal((N, K)), jnp.float32).astype(
            jnp.bfloat16
        )
    )

    def make(reps):
        @jax.jit
        def run(b, seed):
            def body(i, acc):
                key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
                a = jax.random.normal(key, (M, K), jnp.float32).astype(
                    jnp.bfloat16
                )
                s = jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return acc + jnp.sum(jnp.max(s, axis=1))
            return jax.lax.fori_loop(0, reps, body, 0.0)
        return run

    points = []
    for reps in (8, 32, 128, 512):
        run = make(reps)
        np.asarray(run(b, 1))  # compile+warm
        best = float("inf")
        for trial in range(3):
            t0 = time.time()
            np.asarray(run(b, 10_000 + 1000 * trial))
            best = min(best, time.time() - t0)
        points.append((reps, best))
        print(f"reps={reps:4d}: total {best*1e3:9.1f} ms   "
              f"naive per-rep {best/reps*1e3:7.3f} ms", flush=True)

    xs = np.array([p[0] for p in points], np.float64)
    ys = np.array([p[1] for p in points], np.float64)
    slope, intercept = np.polyfit(xs, ys, 1)
    print(f"fit: per_rep {slope*1e3:.3f} ms, fixed overhead "
          f"{intercept*1e3:.1f} ms "
          f"-> xlamax true rate {2.0*M*K*N/slope/1e12:.1f} TF/s", flush=True)

    # scalar-readback-only cost: a trivial computation
    @jax.jit
    def tiny(seed):
        return jnp.float32(seed) * 2.0

    np.asarray(tiny(1))
    t0 = time.time()
    for i in range(5):
        np.asarray(tiny(100 + i))
    print(f"trivial dispatch+readback: {(time.time()-t0)/5*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
