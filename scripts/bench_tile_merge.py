"""Chip A/B: tile-local iota-id merge vs the whole-width running merge
in the union lexical kernels (round-4 follow-up to the two-pass 1M
probe, which showed extraction passes — not MXU precision — dominate
the exact union kernel at scale: ~4-6 ms/rank at 1M x 512).

Arms (batch 512, k=10, zipf queries, hashed-union layout):
  old — merge_topk over the concatenated (B, k+TN) candidates
  new — tile_topk_iota on the aligned (B, TN) scores + (B, 2k) merge

Also checks id/score parity between the arms on fresh eager batches.

Usage: python scripts/bench_tile_merge.py [--n 1000000] [--reps 20]
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
    parser.add_argument("--reps", type=int, default=20)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--pool", type=int, default=8192)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--segments", type=int, default=8)
    parser.add_argument("--u-chunk", type=int, default=128)
    parser.add_argument("--flat-union", action="store_true",
                        help="A/B the flat union kernel too")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from persian_rag_tpu.index.lexical import BM25Index
    from persian_rag_tpu.ops.sparse_scores import (
        hash_segments,
        sparse_topk_union_hashed_pallas,
        sparse_topk_union_pallas,
    )

    print(f"backend={jax.default_backend()} N={args.n} "
          f"batch={args.batch} k={args.k}", flush=True)
    rng = np.random.default_rng(3)
    vocab_n = 50_000
    words = rng.zipf(1.3, size=(args.n, 60)) % vocab_n
    docs = [" ".join(map(str, row)) for row in words]
    t0 = time.time()
    index = BM25Index().build(docs)
    print(f"build {time.time()-t0:.1f}s", flush=True)

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
    print(f"hashed S={args.segments} Ls={ids3.shape[2]} "
          f"UC={args.u_chunk}", flush=True)
    dev_ids = jax.device_put(jnp.asarray(ids))
    dev_vals = jax.device_put(jnp.asarray(vals))
    dev_ids3 = jax.device_put(jnp.asarray(ids3))
    dev_vals3 = jax.device_put(jnp.asarray(vals3))

    t_slots = 8
    interp = jax.default_backend() != "tpu"
    zipf_words = rng.zipf(1.3, size=(args.pool, t_slots)) % vocab_n
    zipf_pool = np.vectorize(lambda w: index.vocab.get(str(w), 0))(
        zipf_words
    ).astype(np.int32)
    dev_pool = jax.device_put(jnp.asarray(zipf_pool))

    # corpus arrays ride as jit ARGUMENTS — closing over them bakes
    # ~1GB of constants into the computation payload and the remote
    # compile transport rejects it (HTTP 413, CLAUDE.md)
    def make_fn(kernel, tm, qx=False):
        if kernel == "hashed":
            def fn(di, dv, qi, qv):
                return sparse_topk_union_hashed_pallas(
                    di, dv, qi, qv, args.k, u_chunk=args.u_chunk,
                    interpret=interp, tile_merge=tm, qw_exact=qx,
                )
            return fn, (dev_ids3, dev_vals3)
        def fn(di, dv, qi, qv):
            return sparse_topk_union_pallas(
                di, dv, qi, qv, args.k,
                interpret=interp, tile_merge=tm, qw_exact=qx,
            )
        return fn, (dev_ids, dev_vals)

    kernels = ["hashed"] + (["flat"] if args.flat_union else [])
    for kernel in kernels:
        # parity old vs new on 2 fresh eager batches
        for bi in range(2):
            rows = rng.integers(0, args.pool, args.batch)
            qi = jnp.asarray(zipf_pool[rows])
            qv = jnp.ones((args.batch, t_slots), jnp.float32)
            fn_o, arrs = make_fn(kernel, False)
            fn_n, _ = make_fn(kernel, True)
            fn_q, _ = make_fn(kernel, True, qx=True)
            s_o, i_o = jax.jit(fn_o)(*arrs, qi, qv)
            s_n_, i_n_ = jax.jit(fn_n)(*arrs, qi, qv)
            s_q, i_q = jax.jit(fn_q)(*arrs, qi, qv)
            same = np.mean(np.asarray(i_o) == np.asarray(i_n_))
            ds = np.max(np.abs(np.asarray(s_o) - np.asarray(s_n_)))
            same_q = np.mean(np.asarray(i_o) == np.asarray(i_q))
            ds_q = np.max(np.abs(np.asarray(s_o) - np.asarray(s_q)))
            print(f"{kernel} parity batch {bi}: new ids equal {same:.4f} "
                  f"|ds| {ds:.2e}; qw_exact ids equal {same_q:.4f} "
                  f"|ds| {ds_q:.2e}", flush=True)

        for arm, tm, qx in (("old_qw", False, True),):
            fn, arrs = make_fn(kernel, tm, qx)

            @jax.jit
            def timed(di, dv, pool, seed, fn=fn):
                def body(i, acc):
                    key = jax.random.fold_in(
                        jax.random.PRNGKey(0), seed + i
                    )
                    rows = jax.random.randint(
                        key, (args.batch,), 0, args.pool, jnp.int32
                    )
                    qi = pool[rows]
                    qv = jnp.ones((args.batch, t_slots), jnp.float32)
                    s, idx = fn(di, dv, qi, qv)
                    return acc + jnp.sum(s) + jnp.sum(idx).astype(
                        jnp.float32
                    )
                return jax.lax.fori_loop(0, args.reps, body, 0.0)

            t0 = time.time()
            np.asarray(timed(*arrs, dev_pool, 0))
            print(f"{kernel}/{arm}: compile+first {time.time()-t0:.1f}s",
                  flush=True)
            best = 1e30
            for trial in range(3):
                t0 = time.time()
                np.asarray(timed(*arrs, dev_pool, 100 * (trial + 1)))
                best = min(best, (time.time() - t0) / args.reps)
            print(
                f"{kernel}/{arm}: best {best*1e3:.2f} ms/batch = "
                f"{args.batch/best:,.0f} QPS", flush=True,
            )


if __name__ == "__main__":
    main()
