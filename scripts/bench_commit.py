"""Time DenseIndex commit()'s serving-cache derivation: one fused jit
vs the shipped eager op chain.

MEASURED VERDICT (kept as a negative-result record): fusing the whole
derivation+probe into one jit is a DEAD END on the relay-attached chip.
Steady state is parity (346.7 vs 335.9 ms at 200k x 384 — eager ops
dispatch asynchronously and pipeline, so there is no per-op dispatch
overhead to recover), while the fused graph's REMOTE COMPILE costs
~191 s vs ~17 s for the whole eager chain's small graphs — i.e. the
fusion makes the first commit at any new corpus shape ~10x worse for
zero steady-state gain. commit() therefore keeps the eager chain.

The corpus is generated ON device (jax.random) so no host upload is
involved; each run uses a fresh seed so the relay cache cannot serve
stale results. Timed region: dispatch -> block_until_ready on every
output -> one scalar readback per terminal computation (forces
completion on the relay, same count both paths).

Usage: python scripts/bench_commit.py [N]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
D = 384
PROBE_N = 64


def eager_chain(arr):
    """The pre-fusion derivation, op by op (separate dispatches)."""
    a32 = arr.astype(jnp.float32)
    sqnorms = jnp.sum(a32 * a32, axis=-1)
    mu = jnp.mean(a32, axis=0)
    centered = a32 - mu[None, :]
    center_sqmax = jnp.max(jnp.sum(centered * centered, axis=-1))
    hi = centered.astype(jnp.bfloat16)
    n, d = a32.shape
    key = jax.random.PRNGKey(n)
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (PROBE_N,), 0, n)
    probe = a32[idx] + 0.05 * jnp.std(a32) * jax.random.normal(
        k2, (PROBE_N, d), jnp.float32
    )
    s = probe @ centered.T
    top = jax.lax.top_k(s, 33)[0]
    gap = top[:, 9] - top[:, 32]
    qn = jnp.linalg.norm(probe, axis=1)
    return sqnorms, mu, center_sqmax, hi, gap, qn


_fused = jax.jit(lambda arr: eager_chain(arr))


def force(outs):
    for o in outs:
        o.block_until_ready()
    # scalar readbacks prove completion on the relay
    return [float(np.asarray(o.reshape(-1)[0])) for o in outs]


def fresh(seed):
    arr = jax.random.normal(
        jax.random.PRNGKey(seed), (N, D), jnp.float32
    )
    arr.block_until_ready()
    return arr


def run(fn, label, seeds):
    times = []
    for s in seeds:
        arr = fresh(s)
        t0 = time.perf_counter()
        outs = fn(arr)
        force(outs)
        times.append(time.perf_counter() - t0)
        print(f"  {label} seed={s}: {times[-1]*1e3:.1f} ms", flush=True)
    return times


def main():
    print(f"backend={jax.default_backend()} N={N} D={D}", flush=True)
    base_seed = int(time.time())
    # compile warm-up (excluded): one run each
    print("warmup (incl. compile)...", flush=True)
    run(_fused, "fused", [base_seed])
    run(eager_chain, "eager", [base_seed + 1])
    print("timed (fresh seeds):", flush=True)
    tf = run(_fused, "fused", [base_seed + 10 + i for i in range(3)])
    te = run(eager_chain, "eager", [base_seed + 20 + i for i in range(3)])
    print(
        f"median fused {np.median(tf)*1e3:.1f} ms, "
        f"eager {np.median(te)*1e3:.1f} ms, "
        f"speedup {np.median(te)/np.median(tf):.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
