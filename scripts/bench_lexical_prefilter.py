"""Race the hashed-UB prefilter (ops.lexical_prefilter) against the
flat/bucketed ELL scan at serving scale, and measure its residual-proof
pass rate.

Usage: python scripts/bench_lexical_prefilter.py [--n 200000]
  [--h 512,1024] [--k-scan 128,256] [--reps 30] [--query zipf,uniform]

Timing follows the repo's relay-honest convention: one jitted fori loop
generating fresh device-side queries per rep (uniform or Zipf term
draw), returning a scalar; proof verdicts are accumulated in the same
loop so the reported ms/batch includes whatever fallback rescans the
verdict stream actually triggered.
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
    parser.add_argument("--n", type=int, default=200_000)
    parser.add_argument("--reps", type=int, default=30)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--h", type=str, default="512,1024")
    parser.add_argument("--k-scan", type=str, default="128,256")
    parser.add_argument("--dedicated", type=float, default=0.5)
    parser.add_argument("--query", type=str, default="zipf,uniform")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from persian_rag_tpu.index.lexical import BM25Index
    from persian_rag_tpu.ops.lexical_prefilter import (
        assign_buckets,
        build_ub_image,
        prefilter_topk,
    )
    from persian_rag_tpu.ops.sparse_scores import sparse_topk_pallas

    print(f"backend={jax.default_backend()} N={args.n} batch={args.batch}",
          flush=True)
    rng = np.random.default_rng(3)
    vocab_n = 50_000
    words = rng.zipf(1.3, size=(args.n, 60)) % vocab_n
    docs = [" ".join(map(str, row)) for row in words]
    t0 = time.time()
    index = BM25Index().build(docs)
    ids, vals = index._unified_ell_host()
    print(f"build {time.time()-t0:.0f}s  unified ELL L={ids.shape[1]}",
          flush=True)
    t_slots, k = 8, 10
    vocab_sz = len(index.vocab)
    df = np.bincount(ids[ids >= 0].ravel(), minlength=vocab_sz)
    # Zipf-shaped query term draw: sample terms by corpus frequency
    # (favors common terms -- the adversarial case for the UB proof:
    # common terms mean dense near-tie score distributions at the cut).
    p = df.astype(np.float64) / df.sum()
    zipf_probs = jnp.asarray(np.cumsum(p).astype(np.float32))

    dev_ids = jax.device_put(jnp.asarray(ids))
    dev_vals = jax.device_put(jnp.asarray(vals))

    def gen_queries(key, mode):
        if mode == "uniform":
            qi = jax.random.randint(
                key, (args.batch, t_slots), 0, vocab_sz, jnp.int32
            )
        else:  # zipf: inverse-CDF draw over corpus term frequencies
            u = jax.random.uniform(key, (args.batch, t_slots))
            qi = jnp.searchsorted(zipf_probs, u).astype(jnp.int32)
            qi = jnp.minimum(qi, vocab_sz - 1)
        qv = jnp.ones((args.batch, t_slots), jnp.float32)
        return qi, qv

    # -- baseline: flat ELL kernel -----------------------------------------
    def timeit(fn, *arrs, mode="uniform"):
        @jax.jit
        def timed(seed, *a):
            def body(i, acc):
                key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
                qi, qv = gen_queries(key, mode)
                out = fn(qi, qv, *a)
                s, idx = out[0], out[1]
                acc = acc + jnp.sum(s) + jnp.sum(idx).astype(jnp.float32)
                if len(out) > 2:  # ok verdicts
                    acc = acc + 0.0 * jnp.sum(out[2])
                return acc
            return jax.lax.fori_loop(0, args.reps, body, 0.0)

        t0 = time.time()
        np.asarray(timed(0, *arrs))
        compile_s = time.time() - t0
        t0 = time.time()
        np.asarray(timed(40_000, *arrs))
        return (time.time() - t0) / args.reps, compile_s

    def ok_rate(fn, *arrs, mode="uniform"):
        @jax.jit
        def counted(seed, *a):
            def body(i, acc):
                key = jax.random.fold_in(jax.random.PRNGKey(7), seed + i)
                qi, qv = gen_queries(key, mode)
                out = fn(qi, qv, *a)
                return acc + jnp.sum(out[2].astype(jnp.float32))
            return jax.lax.fori_loop(0, 8, body, 0.0)
        return float(np.asarray(counted(123, *arrs))) / (8 * args.batch)

    for mode in args.query.split(","):
        dt, cs = timeit(
            lambda qi, qv, di, dv: sparse_topk_pallas(di, dv, qi, qv, k),
            dev_ids, dev_vals, mode=mode,
        )
        print(f"[{mode}] flat ELL scan:  {dt*1e3:8.1f} ms / {args.batch} q "
              f"({args.batch/dt:7.0f} QPS)  compile={cs:.0f}s", flush=True)

    probe_qi = rng.integers(0, vocab_sz, (32, t_slots)).astype(np.int32)
    probe_qv = np.ones((32, t_slots), np.float32)
    ws, wi = jax.block_until_ready(sparse_topk_pallas(
        dev_ids, dev_vals, jnp.asarray(probe_qi), jnp.asarray(probe_qv), k
    ))

    # -- prefilter sweep ----------------------------------------------------
    for h in (int(x) for x in args.h.split(",")):
        t0 = time.time()
        term_map = assign_buckets(df, h, args.dedicated)
        w16_np, rmax = build_ub_image(ids, vals, term_map, h)
        w16 = jax.device_put(jnp.asarray(w16_np, jnp.bfloat16))
        tm_dev = jax.device_put(jnp.asarray(term_map))
        rmax_dev = jnp.float32(rmax)
        print(f"H={h}: image {w16_np.nbytes//2/1e6:.0f} MB bf16, "
              f"rmax={rmax:.1f}, build+upload {time.time()-t0:.0f}s",
              flush=True)

        for ks in (int(x) for x in args.k_scan.split(",")):
            def pf(qi, qv, w, tm, rm, di, dv, ks=ks):
                # device-side query hashing (one-hot matmul; host path
                # precomputes this in numpy -- same values)
                b = jnp.take(tm, jnp.maximum(qi, 0), axis=0)
                oh = jax.nn.one_hot(b, h, dtype=jnp.float32)
                qh = jnp.einsum(
                    "bt,bth->bh", jnp.where(qi >= 0, qv, 0.0), oh
                )
                return prefilter_topk(
                    qh, w, rm, di, dv, qi, qv, k, k_scan=ks,
                    return_ok=True,
                )

            def pf_fast(qi, qv, w, tm, rm, di, dv, ks=ks):
                b = jnp.take(tm, jnp.maximum(qi, 0), axis=0)
                oh = jax.nn.one_hot(b, h, dtype=jnp.float32)
                qh = jnp.einsum(
                    "bt,bth->bh", jnp.where(qi >= 0, qv, 0.0), oh
                )
                return prefilter_topk(
                    qh, w, rm, di, dv, qi, qv, k, k_scan=ks,
                    fallback=False,
                )

            s, i, okv = jax.block_until_ready(pf(
                jnp.asarray(probe_qi), jnp.asarray(probe_qv),
                w16, tm_dev, rmax_dev, dev_ids, dev_vals,
            ))
            exact = bool(np.array_equal(np.asarray(i), np.asarray(wi)))
            # big arrays must be ARGUMENTS, not jit closures (the relay's
            # remote-compile HTTP body limit rejects baked-in constants)
            scan_jit = jax.jit(
                lambda qi, qv, di, dv: sparse_topk_pallas(di, dv, qi, qv, k)
            )
            pf_jit = jax.jit(pf_fast)
            for mode in args.query.split(","):
                dt, cs = timeit(
                    pf, w16, tm_dev, rmax_dev, dev_ids, dev_vals, mode=mode
                )
                rate = ok_rate(
                    pf, w16, tm_dev, rmax_dev, dev_ids, dev_vals, mode=mode
                )
                dt_f, cs_f = timeit(
                    pf_fast, w16, tm_dev, rmax_dev, dev_ids, dev_vals,
                    mode=mode,
                )
                # candidate-set recall@k of the fast tier vs the scan,
                # fresh host-drawn queries (4 batches)
                hits = tot = 0
                r2 = np.random.default_rng(77)
                for _ in range(4):
                    if mode == "uniform":
                        qi_np = r2.integers(
                            0, vocab_sz, (args.batch, t_slots)
                        ).astype(np.int32)
                    else:
                        qi_np = np.searchsorted(
                            np.asarray(zipf_probs),
                            r2.random((args.batch, t_slots)),
                        ).astype(np.int32)
                        qi_np = np.minimum(qi_np, vocab_sz - 1)
                    qv_np = np.ones((args.batch, t_slots), np.float32)
                    _, si = scan_jit(
                        jnp.asarray(qi_np), jnp.asarray(qv_np),
                        dev_ids, dev_vals,
                    )
                    _, fi = pf_jit(
                        jnp.asarray(qi_np), jnp.asarray(qv_np),
                        w16, tm_dev, rmax_dev, dev_ids, dev_vals,
                    )
                    si, fi = np.asarray(si), np.asarray(fi)
                    for r in range(args.batch):
                        hits += len(set(si[r]) & set(fi[r]))
                        tot += k
                print(
                    f"[{mode}] H={h:5d} k_scan={ks:4d}: verified "
                    f"{dt*1e3:8.1f} ms ({args.batch/dt:7.0f} QPS, "
                    f"proof-ok {rate*100:5.1f}%)  fast {dt_f*1e3:7.1f} ms "
                    f"({args.batch/dt_f:7.0f} QPS, R@{k} {hits/tot:.4f})  "
                    f"ids==scan:{exact}  compile={cs:.0f}/{cs_f:.0f}s",
                    flush=True,
                )


if __name__ == "__main__":
    main()
