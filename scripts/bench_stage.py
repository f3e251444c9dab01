"""Component-level timing of the two-stage exact flat search on the TPU.

Times, at configurable N (default 1M) x 384, batch 512, k=10:
  * maxonly floor (matmul + running max) in normal and transposed corpus
    layouts,
  * the candidate-extraction kernel alone (stage 1),
  * the full exact two-stage path (flat_topk_exact2_stream) across
    tile_q / n_easy / layout variants,
with the relay-safe fori_loop methodology (fresh on-device queries per
iteration, scalar readback — CLAUDE.md). Each config also reports
Recall@10 vs a NumPy exact reference on a fresh probe batch, so a proof
fallback or selection loss is visible, not silent.

Usage: python scripts/bench_stage.py [--n 1000000] [--configs a,b,...]
  config = name:kind:tile_q:tile_n:n_easy[:T|:g<group>|:Tg<group>]
  kind in {maxonly, xlamax, cand, e2s}
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULTS = [
    "max_n:maxonly:256:2048:0",
    "max_T:maxonly:256:2048:0:T",
    "max_T512:maxonly:512:2048:0:T",
    "xlamax:xlamax:0:0:0",
    "cand_n:cand:256:2048:4",
    "cand_T:cand:256:2048:4:T",
    "cand_T512:cand:512:2048:4:T",
    "e2s_base:e2s:256:2048:4",
    "e2s_T:e2s:256:2048:4:T",
    "e2s_T512:e2s:512:2048:4:T",
    "e2s_T_ne3:e2s:256:2048:3:T",
]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1_000_000)
    parser.add_argument("--d", type=int, default=384)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--reps", type=int, default=20)
    parser.add_argument("--k-scan", type=int, default=32,
                        help="finalist count refined by the e2s path "
                        "(the refine gathers k_scan rows/query; smaller "
                        "trades gather bytes for a looser proof bound)")
    parser.add_argument("--configs", type=str, default=",".join(DEFAULTS))
    parser.add_argument("--passes", type=int, default=1,
                        help="timed passes per config (median + spread "
                        "reported; VERDICT r4 #4 wants median-of-3 "
                        "same-session floor triples)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from persian_rag_tpu.ops.flat_topk import (
        flat_topk_candidates,
        flat_topk_exact2_stream,
        flat_topk_pallas,
    )

    N, D, BATCH, K = args.n, args.d, args.batch, args.k
    print(f"backend={jax.default_backend()} N={N} d={D} batch={BATCH} k={K}",
          flush=True)
    interpret = jax.default_backend() != "tpu"

    rng = np.random.default_rng(0)
    slabs = []
    remaining = N
    while remaining > 0:
        take = min(remaining, 200_000)
        slab = rng.standard_normal((take, D)).astype(np.float32)
        slab /= np.linalg.norm(slab, axis=1, keepdims=True)
        slabs.append(slab)
        remaining -= take
    corpus = np.concatenate(slabs)
    del slabs

    probe = rng.standard_normal((64, D)).astype(np.float32)
    probe /= np.linalg.norm(probe, axis=1, keepdims=True)
    ref_idx = np.argsort(-(probe @ corpus.T), axis=1)[:, :K]

    t_up = time.time()
    c32 = jax.device_put(jnp.asarray(corpus))
    jax.block_until_ready(c32)
    print(f"f32 corpus uploaded in {time.time()-t_up:.0f}s", flush=True)
    # derive bf16 images ON DEVICE (uploads are minutes-slow via relay)
    c16 = jax.jit(lambda c: c.astype(jnp.bfloat16))(c32)
    c16t = jax.jit(lambda c: c.astype(jnp.bfloat16).T)(c32)
    csq = jax.jit(lambda c: jnp.sum(c * c, axis=-1))(c32)
    jax.block_until_ready((c16, c16t, csq))

    for spec in args.configs.split(","):
        parts = spec.split(":")
        name, kind, tile_q, tile_n, n_easy = parts[:5]
        flag = parts[5] if len(parts) > 5 else ""
        transposed = flag.startswith("T")
        group = 0
        lane_slots = 0
        lane_depth = 2
        if "g" in flag:
            group = int(flag.lstrip("T").lstrip("g") or 0)
        elif "s" in flag:
            ls_part = flag.split("s")[1]
            if "d" in ls_part:
                ls_part, d_part = ls_part.split("d")
                lane_depth = int(d_part)
            else:
                lane_depth = 2
            lane_slots = int(ls_part or 0)
        tile_q, tile_n, n_easy = int(tile_q), int(tile_n), int(n_easy)

        if kind == "maxonly":
            cdev = c16t if transposed else c16

            def search(q, c, tq=tile_q, tn=tile_n, tr=transposed):
                return flat_topk_pallas(
                    q, c, K, metric="dot", tile_q=tq, tile_n=tn,
                    compute_dtype=jnp.bfloat16, mode="maxonly",
                    interpret=interpret, corpus_transposed=tr,
                )
        elif kind == "xlamax":
            cdev = c16

            def search(q, c):
                s = jnp.dot(
                    q.astype(jnp.bfloat16), c.T,
                    preferred_element_type=jnp.float32,
                )
                m = jnp.max(s, axis=1, keepdims=True)
                return m, jnp.zeros((q.shape[0], K), jnp.int32)
        elif kind == "cand":
            cdev = c16t if transposed else c16

            def search(q, c, tq=tile_q, tn=tile_n, ne=n_easy, tr=transposed,
                       g=group, ls=lane_slots, ld=lane_depth):
                keys, bounds, _ = flat_topk_candidates(
                    q, c, metric="dot", tile_n=tn, tile_q=tq,
                    n_easy=ne, interpret=interpret, corpus_transposed=tr,
                    group=g, lane_slots=ls, lane_depth=ld,
                )
                return keys[:, :K].astype(jnp.float32), bounds[:, :K]
        elif kind == "e2s":
            cdev = c32

            # csq/c16 ride as explicit args: a closure would bake them
            # into the outer timing jit as 768MB captured constants and
            # blow the remote-compile body limit (HTTP 413, CLAUDE.md)
            def search(q, c, extra, tq=tile_q, tn=tile_n, ne=n_easy,
                       tr=transposed, g=group, ls=lane_slots,
                       ld=lane_depth):
                e_csq, e_c16 = extra
                return flat_topk_exact2_stream(
                    q, c, K, metric="dot", k_scan=args.k_scan, tile_n=tn,
                    tile_q=tq, n_easy=ne, corpus_sqnorm=e_csq,
                    corpus_bf16=e_c16,
                    interpret=interpret, bf16_transposed=tr, group=g,
                    lane_slots=ls, lane_depth=ld,
                )
        elif kind in ("sel", "ref"):
            # glue breakdown: candidates + XLA top_k + id unpack ("sel"),
            # plus the f32 gather+refine ("ref") — everything in e2s
            # except the residual proof & sliced fallback machinery.
            cdev = c32

            from persian_rag_tpu.ops.flat_topk import (
                _COL_MASK,
                _INT_MIN,
                _exact_refine,
            )

            def search(q, c, extra, tq=tile_q, tn=tile_n, ne=n_easy,
                       kind=kind):
                e_csq, e_c16 = extra
                keys, bounds, tnn = flat_topk_candidates(
                    q, e_c16, metric="dot", tile_n=tn, tile_q=tq,
                    n_easy=ne, interpret=interpret,
                )
                ks = min(32, keys.shape[1])
                top_keys, pos = jax.lax.top_k(keys, ks)
                ids = (pos // ne) * tnn + (
                    tnn - 1 - (top_keys & _COL_MASK)
                )
                ids = jnp.where(top_keys == _INT_MIN, -1, ids)
                if kind == "sel":
                    return top_keys[:, :K].astype(jnp.float32), ids[:, :K]
                cand = jnp.sort(ids, axis=1)
                return _exact_refine(
                    q.astype(jnp.float32), c, cand, e_csq, "dot", K
                )
        else:
            raise ValueError(kind)

        extra = (
            (csq, c16t if transposed else c16)
            if kind in ("e2s", "sel", "ref")
            else ()
        )

        if kind == "e2s":
            t_first = time.time()
            got = np.asarray(
                jax.block_until_ready(
                    search(jnp.asarray(probe), cdev, extra)
                )[1]
            )
            compile_s = time.time() - t_first
            recall = float(np.mean([
                len(set(got[i]) & set(ref_idx[i])) / K
                for i in range(len(probe))
            ]))
        else:
            recall, compile_s = float("nan"), 0.0

        @jax.jit
        def timed(c, extra, seed):
            def body(i, acc):
                key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
                q = jax.random.normal(key, (BATCH, D), jnp.float32)
                s, idx = search(q, c, *((extra,) if extra else ()))
                return acc + jnp.sum(s) + jnp.sum(idx).astype(jnp.float32)
            return jax.lax.fori_loop(0, args.reps, body, 0.0)

        t_c = time.time()
        np.asarray(timed(cdev, extra, 0))  # compile + warm
        compile_s = max(compile_s, time.time() - t_c)
        dts = []
        for p in range(args.passes):
            t0 = time.time()
            np.asarray(timed(cdev, extra, 50_000 + 777 * p))
            dts.append((time.time() - t0) / args.reps)
        dts.sort()
        dt = dts[len(dts) // 2]
        spread = (dts[-1] - dts[0]) / max(dt, 1e-12)
        flops = 2.0 * BATCH * N * D
        q_tiles = -(-BATCH // tile_q) if tile_q else 1
        stream = N * D * 2 * q_tiles
        print(
            f"{name:12s} {dt*1e3:7.2f} ms  {BATCH/dt:9.0f} QPS  "
            f"{flops/dt/1e12:6.2f} TF/s  {stream/dt/1e9:6.1f} GB/s "
            f"(corpus x{q_tiles})  R@10={recall:.4f}  "
            f"spread={spread:.3f}/{args.passes}  compile={compile_s:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
