"""Time the bf16x2 (hi/lo split) two-stage exact path at 1M x 384 —
the one adaptive-stage-1 configuration round 3 never timed on chip.

The margin probe picks bf16x2 for corpora whose top-k gaps clear the
~2^-17-relative hi/lo bound but not the plain-bf16 one: clustered
geometry rows = normalize(center + delta * g) with delta ~ 0.1 (at
delta <= 0.03 even bf16x2 fails -> scan; isotropic picks plain bf16).
This script builds such a corpus at 1M, confirms the probe decision at
that scale, then times:
  * bf16x2 two-stage (3 MXU stage-1 passes + refine + sliced proof)
  * plain-bf16 two-stage (expected: proof-fail fallback storm)
  * chunked f32 scan (the mode="scan" serving fallback)
with the standard fresh-queries-per-iteration fori methodology
(queries are perturbed corpus rows — matching the geometry queries
would have in serving).

Usage: python scripts/bench_bf16x2_1m.py [--n 1000000] [--delta 0.1]
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
    parser.add_argument("--n", type=int, default=1_000_000)
    parser.add_argument("--d", type=int, default=384)
    parser.add_argument("--delta", type=float, default=0.1)
    parser.add_argument("--centers", type=int, default=1024)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--reps", type=int, default=50)
    parser.add_argument("--skip-bf16", action="store_true",
                        help="skip the plain-bf16 fallback-storm config")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from persian_rag_tpu.ops.flat_topk import (
        _bf16_matmul_eps,
        _bf16x2_matmul_eps,
        flat_topk_exact2_stream,
        flat_topk_scan,
    )

    interpret = jax.default_backend() != "tpu"
    print(f"backend={jax.default_backend()} n={args.n} delta={args.delta}"
          f" interpret={interpret}", flush=True)
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((args.centers, args.d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    slabs = []
    remaining = args.n
    while remaining > 0:
        take = min(remaining, 200_000)
        assign = rng.integers(0, args.centers, take)
        rows = centers[assign] + args.delta * (
            rng.standard_normal((take, args.d)).astype(np.float32)
            / np.sqrt(args.d)
        )
        rows /= np.linalg.norm(rows, axis=1, keepdims=True)
        slabs.append(rows.astype(np.float32))
        remaining -= take
    corpus = np.concatenate(slabs)
    del slabs

    t0 = time.time()
    c32 = jax.device_put(jnp.asarray(corpus))
    c32.block_until_ready()
    print(f"upload: {time.time()-t0:.1f}s", flush=True)

    # serving caches, eagerly (the measured-best commit() strategy)
    mu = jnp.mean(c32, axis=0)
    centered = c32 - mu[None, :]
    csq = jnp.sum(c32 * c32, axis=-1)
    center_sqmax = jnp.max(jnp.sum(centered * centered, axis=-1))
    hi = centered.astype(jnp.bfloat16)
    lo = (centered - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    del centered

    # probe decision at THIS scale (mirrors DenseIndex._pick_stage1_mode)
    pidx = rng.integers(0, args.n, 64)
    probe = corpus[pidx] + 0.05 * corpus.std() * rng.standard_normal(
        (64, args.d)
    ).astype(np.float32)
    s = np.asarray(jnp.asarray(probe) @ c32.T)
    top = -np.sort(-s, axis=1)[:, :33]
    gap = top[:, 9] - top[:, 32]
    qn = np.linalg.norm(probe, axis=1)
    cn = float(np.sqrt(np.asarray(center_sqmax)))
    eps16 = _bf16_matmul_eps(args.d) * qn * cn
    eps_x2 = _bf16x2_matmul_eps(args.d) * qn * cn
    mode = ("bf16" if (gap > 2 * eps16).all()
            else "bf16x2" if (gap > 2 * eps_x2).all() else "scan")
    print(f"probe@{args.n}: min gap {gap.min():.2e}, "
          f"2*eps16 {2*eps16.max():.2e}, 2*eps_x2 {2*eps_x2.max():.2e} "
          f"-> mode={mode}", flush=True)

    # ground truth for recall (host, exact)
    want = np.argsort(-s, axis=1, kind="stable")[:, : args.k]

    def timed(name, search, reps=args.reps):
        # search(q, corpus, csq, hi, lo, mu): every multi-hundred-MB
        # array is a traced ARGUMENT — closing over them bakes GBs of
        # constants into the lowered module (breaks/slows the remote
        # compile transport; see CLAUDE.md)
        got = np.asarray(jax.block_until_ready(
            search(jnp.asarray(probe).astype(jnp.float32),
                   c32, csq, hi, lo, mu)
        )[1])[:, : args.k]
        rec = float(np.mean([
            len(set(got[q]) & set(want[q])) / args.k
            for q in range(len(probe))
        ]))

        @jax.jit
        def loop(c, csq_, hi_, lo_, mu_, seed):
            def body(i, acc):
                key = jax.random.fold_in(jax.random.PRNGKey(3), seed + i)
                k1, k2 = jax.random.split(key)
                ridx = jax.random.randint(k1, (args.batch,), 0, args.n)
                q = jnp.take(c, ridx, axis=0) + (
                    args.delta / 2
                ) * jax.random.normal(
                    k2, (args.batch, args.d), jnp.float32
                ) / np.sqrt(args.d)
                s_, i_ = search(q, c, csq_, hi_, lo_, mu_)
                return acc + jnp.sum(s_) + jnp.sum(i_).astype(jnp.float32)

            return jax.lax.fori_loop(0, reps, body, 0.0)

        t0 = time.time()
        np.asarray(loop(c32, csq, hi, lo, mu, 0))  # compile + warm
        print(f"  {name}: compile+warm {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        np.asarray(loop(c32, csq, hi, lo, mu, 50_000))
        dt = (time.time() - t0) / reps
        print(
            f"  {name}: {dt*1e3:.2f} ms / {args.batch} q -> "
            f"{args.batch/dt:.0f} QPS, R@{args.k}={rec:.4f}",
            flush=True,
        )
        return dt, rec

    print("bf16x2 two-stage:", flush=True)
    timed(
        "bf16x2",
        lambda q, c, csq_, hi_, lo_, mu_: flat_topk_exact2_stream(
            q, c, args.k, metric="dot", k_scan=32, tile_n=2048,
            tile_q=256, n_easy=4, corpus_sqnorm=csq_, corpus_bf16=hi_,
            corpus_center=mu_, center_sqmax=center_sqmax,
            corpus_bf16_lo=lo_, interpret=interpret,
        ),
    )
    print("chunked f32 scan:", flush=True)
    timed(
        "scan",
        lambda q, c, csq_, hi_, lo_, mu_: flat_topk_scan(
            q, c, args.k, metric="dot"),
        reps=max(args.reps // 5, 5),
    )
    if not args.skip_bf16:
        print("plain bf16 two-stage (expected fallback storm):", flush=True)
        timed(
            "bf16",
            lambda q, c, csq_, hi_, lo_, mu_: flat_topk_exact2_stream(
                q, c, args.k, metric="dot", k_scan=32, tile_n=2048,
                tile_q=256, n_easy=4, corpus_sqnorm=csq_, corpus_bf16=hi_,
                corpus_center=mu_, center_sqmax=center_sqmax,
                interpret=interpret,
            ),
            reps=max(args.reps // 5, 5),
        )


if __name__ == "__main__":
    main()
