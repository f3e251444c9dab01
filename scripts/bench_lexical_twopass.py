"""Chip A/B: two-pass union lexical serving vs the exact union kernel.

Arms (all batch-512, k=10, zipf queries — the adopted serving regime):
  exact   — hashed-union kernel, HIGHEST-precision MXU pass (~6 bf16
            passes; the adopted round-3 serving path)
  stage1  — the same kernel with the bf16 single-pass dot + k_scan=32
            merge (candidate generation alone; decomposition probe)
  twopass — stage1 + exact f32 rescore + residual proof + lax.cond
            exact fallback (sparse_topk_union_twopass)

Also reports the proof pass rate over fresh eager batches and id/score
parity vs the exact kernel.

Usage: python scripts/bench_lexical_twopass.py [--n 200000] [--reps 20]
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
    parser.add_argument("--reps", type=int, default=20)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--pool", type=int, default=8192)
    parser.add_argument("--segments", type=int, default=8)
    parser.add_argument("--u-chunk", type=int, default=128)
    parser.add_argument("--k-scan", type=int, default=32)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from persian_rag_tpu.index.lexical import BM25Index
    from persian_rag_tpu.ops.sparse_scores import (
        _union_twopass_impl,
        hash_segments,
        sparse_topk_union_hashed_pallas,
    )

    print(
        f"backend={jax.default_backend()} N={args.n} batch={args.batch} "
        f"S={args.segments} UC={args.u_chunk} k_scan={args.k_scan}",
        flush=True,
    )
    rng = np.random.default_rng(3)
    vocab_n = 50_000
    doc_len = 60
    words = rng.zipf(1.3, size=(args.n, doc_len)) % vocab_n
    docs = [" ".join(map(str, row)) for row in words]
    t0 = time.time()
    index = BM25Index().build(docs)
    print(f"build {time.time()-t0:.1f}s vocab={len(index.vocab)}", flush=True)

    if index._buckets is None:
        ids, vals = index.doc_ids, index.doc_vals
    else:
        L = max(b.ids.shape[1] for b in index._buckets)
        ids = np.full((args.n, L), -1, np.int32)
        vals = np.zeros((args.n, L), np.float32)
        for b in index._buckets:
            ids[b.gids, : b.ids.shape[1]] = b.ids
            vals[b.gids, : b.vals.shape[1]] = b.vals
    ids3, vals3 = hash_segments(ids, vals, args.segments)
    n, s_n, ls = ids3.shape
    print(f"flat L={ids.shape[1]}, hashed S={s_n} Ls={ls}", flush=True)
    dev_ids = jax.device_put(jnp.asarray(ids))
    dev_vals = jax.device_put(jnp.asarray(vals))
    dev_ids3 = jax.device_put(jnp.asarray(ids3))
    dev_vals3 = jax.device_put(jnp.asarray(vals3))

    t_slots = 8
    k = 10
    interp = jax.default_backend() != "tpu"

    zipf_words = rng.zipf(1.3, size=(args.pool, t_slots)) % vocab_n
    zipf_pool = np.vectorize(lambda w: index.vocab.get(str(w), 0))(
        zipf_words
    ).astype(np.int32)
    dev_pool = jax.device_put(jnp.asarray(zipf_pool))

    # parity + proof rate on fresh eager batches
    n_ok = n_q = 0
    for bi in range(4):
        rows = rng.integers(0, args.pool, args.batch)
        qi = jnp.asarray(zipf_pool[rows])
        qv = jnp.ones((args.batch, t_slots), jnp.float32)
        s_tp, i_tp, ok = jax.jit(
            _union_twopass_impl,
            static_argnames=(
                "k", "k_scan", "use_pallas", "interpret", "return_ok"
            ),
        )(
            dev_ids, dev_vals, dev_ids3, dev_vals3, qi, qv,
            k=k, k_scan=args.k_scan, use_pallas=True, interpret=interp,
            return_ok=True,
        )
        s_ex, i_ex = sparse_topk_union_hashed_pallas(
            dev_ids3, dev_vals3, qi, qv, k, u_chunk=args.u_chunk,
            interpret=interp,
        )
        okn = np.asarray(ok)
        n_ok += int(okn.sum())
        n_q += okn.size
        same = np.mean(np.asarray(i_tp) == np.asarray(i_ex))
        ds = np.max(np.abs(np.asarray(s_tp) - np.asarray(s_ex)))
        print(
            f"batch {bi}: proof pass {okn.mean():.3f}, ids equal "
            f"{same:.4f}, max |ds| {ds:.2e}",
            flush=True,
        )
    print(f"proof pass rate overall: {n_ok}/{n_q} = {n_ok/max(n_q,1):.3f}",
          flush=True)

    def run(arm):
        @jax.jit
        def timed(di, dv, di3, dv3, pool, seed):
            def body(i, acc):
                key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
                rows = jax.random.randint(
                    key, (args.batch,), 0, args.pool, jnp.int32
                )
                qi = pool[rows]
                qv = jnp.ones((args.batch, t_slots), jnp.float32)
                if arm == "exact":
                    s, idx = sparse_topk_union_hashed_pallas(
                        di3, dv3, qi, qv, k, u_chunk=args.u_chunk,
                        interpret=interp)
                elif arm == "stage1":
                    s, idx = sparse_topk_union_hashed_pallas(
                        di3, dv3, qi, qv, args.k_scan,
                        u_chunk=args.u_chunk, interpret=interp,
                        stage1=True)
                else:
                    s, idx = _union_twopass_impl(
                        di, dv, di3, dv3, qi, qv, k=k,
                        k_scan=args.k_scan, use_pallas=True,
                        interpret=interp, return_ok=False)
                return acc + jnp.sum(s) + jnp.sum(idx).astype(jnp.float32)
            return jax.lax.fori_loop(0, args.reps, body, 0.0)

        t0 = time.time()
        r = timed(dev_ids, dev_vals, dev_ids3, dev_vals3, dev_pool, 0)
        np.asarray(r)
        print(f"{arm}: compile+first {time.time()-t0:.1f}s", flush=True)
        best = 1e30
        for trial in range(3):
            t0 = time.time()
            r = timed(dev_ids, dev_vals, dev_ids3, dev_vals3, dev_pool,
                      100 * (trial + 1))
            np.asarray(r)
            dt = (time.time() - t0) / args.reps
            best = min(best, dt)
            print(f"  {arm} trial {trial}: {dt*1e3:.2f} ms/batch", flush=True)
        qps = args.batch / best
        print(f"{arm}: best {best*1e3:.2f} ms/batch-{args.batch} "
              f"= {qps:,.0f} QPS", flush=True)
        return best

    t_exact = run("exact")
    t_stage1 = run("stage1")
    t_two = run("twopass")
    print(
        f"SUMMARY N={args.n}: exact {t_exact*1e3:.2f} ms, stage1 "
        f"{t_stage1*1e3:.2f} ms, twopass {t_two*1e3:.2f} ms "
        f"({t_exact/t_two:.2f}x)",
        flush=True,
    )


if __name__ == "__main__":
    main()
