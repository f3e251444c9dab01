"""On-chip validation of DenseIndex's runtime stage-1 demotion.

Builds a clustered corpus (normalize(center + delta*g), few centers ->
dense near-clone clusters) whose commit-time margin probe picks an
OPTIMISTIC stage-1 (bf16 or bf16x2), then serves realistic queries
(perturbed corpus rows, which sit deeper inside the clusters than the
probe's) through DenseIndex.search and checks:

  1. the per-dispatch proof verdict majority-fails on the live stream,
  2. after DEMOTE_STREAK consecutive such dispatches _stage1_mode flips
     to "scan" (logged),
  3. results stay identical to the NumPy exact scan before, during,
     and after the demotion,
  4. post-demotion dispatch latency does not regress vs the storming
     two-stage (each pre-demotion dispatch pays stage-1 AND the f32
     rescan; post-demotion pays the scan alone).

Timing context (already measured, scripts/bench_bf16x2_1m.py): at 1M
clustered the wrong optimistic pick costs 74.8 vs 58.4 ms/512q. This
script validates the self-correction MECHANISM on chip at 200k.

Usage: python scripts/validate_demotion_chip.py [--n 200000]
"""
from __future__ import annotations

import argparse
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=200_000)
    parser.add_argument("--d", type=int, default=384)
    parser.add_argument("--delta", type=float, default=0.1)
    parser.add_argument("--centers", type=int, default=192)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument(
        "--force-mode", default=None, choices=("bf16", "bf16x2"),
        help="override the commit probe's pick with a (wrong) optimistic "
        "stage-1 — injects exactly the probe mistake runtime demotion "
        "exists to correct, so the fail->streak->demote->scan pipeline "
        "can be driven on geometries where the honest probe already "
        "picks scan",
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)

    import jax

    from persian_rag_tpu.index.dense import DenseIndex

    print(f"backend={jax.default_backend()} n={args.n} "
          f"delta={args.delta} centers={args.centers}", flush=True)

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((args.centers, args.d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, args.centers, args.n)
    corpus = centers[assign] + args.delta * (
        rng.standard_normal((args.n, args.d)).astype(np.float32)
        / np.sqrt(args.d)
    )
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    corpus = corpus.astype(np.float32)

    idx = DenseIndex(args.d, metric="ip")
    idx.add(corpus)
    t0 = time.time()
    idx.commit()
    print(f"commit: {time.time()-t0:.1f}s -> probe picked "
          f"stage1_mode={idx._stage1_mode}", flush=True)
    if args.force_mode is not None:
        print(f"forcing stage1_mode={args.force_mode} "
              f"(simulated wrong probe pick)", flush=True)
        idx._stage1_mode = args.force_mode
        if args.force_mode == "bf16":
            idx._stage1_lo = None
        elif idx._stage1_lo is None:
            import jax.numpy as jnp

            a32 = idx._device_corpus.astype(jnp.float32)
            cen = a32 - idx._stage1_center[None, :]
            idx._stage1_lo = (
                cen - idx._stage1_bf16.astype(jnp.float32)
            ).astype(jnp.bfloat16)
    if idx._stage1_mode == "scan":
        print("probe already picked scan: demotion has nothing to do "
              "(raise --delta or pass --force-mode)", flush=True)
        return

    corpus64 = corpus.astype(np.float64)

    def check_vs_f64(q, got, s, tol=1e-5):
        """Set-compare against the f64 ground truth; classify any
        differing ids as near-ties (f64 score gap <= tol) or REAL
        misses. On near-clone clustered geometry distinct f32 scan
        orders (NumPy BLAS, the TPU refine einsum, the chunked scan)
        legitimately disagree on sub-ulp-tied finalists — the
        documented empirical caveat — but a REAL miss (a non-finalist
        beating the kth by more than f32 rounding) would indicate
        proof unsoundness and must fail loudly."""
        s64 = q.astype(np.float64) @ corpus64.T
        want = np.argsort(-s64, axis=1, kind="stable")[:, : args.k]
        n_mismatch, worst = 0, 0.0
        for qi in range(q.shape[0]):
            a, b = set(got[qi].tolist()), set(want[qi].tolist())
            if a == b:
                continue
            n_mismatch += 1
            for missed in b - a:
                gap = float(s64[qi, missed] - s64[qi, got[qi, args.k - 1]])
                worst = max(worst, gap)
                assert gap <= tol, (
                    f"REAL miss: query {qi} id {missed} beats the "
                    f"returned kth by {gap:.2e} (> {tol}) — proof "
                    f"unsoundness, not a tie artifact"
                )
        return n_mismatch, worst

    modes, lat = [], []
    for t in range(2 * DenseIndex.DEMOTE_STREAK + 2):
        r = np.random.default_rng(1000 + t)
        ridx = r.integers(0, args.n, args.batch)
        q = corpus[ridx] + (args.delta / 2) * r.standard_normal(
            (args.batch, args.d)
        ).astype(np.float32) / np.sqrt(args.d)
        q = q.astype(np.float32)
        t0 = time.time()
        s, got = idx.search(q, args.k)
        dt = time.time() - t0
        n_mismatch, worst = check_vs_f64(q, got, s)
        modes.append(idx._stage1_mode)
        lat.append(dt)
        print(
            f"dispatch {t}: mode(before)={modes[-1] if t==0 else modes[-2]}"
            f" -> mode(after)={idx._stage1_mode} streak={idx._fail_streak}"
            f" {dt*1e3:.1f} ms near-tie-mismatches={n_mismatch}/"
            f"{args.batch} (worst f64 gap {worst:.1e})",
            flush=True,
        )

    assert idx._stage1_mode == "scan", (
        "expected runtime demotion to scan; got "
        f"{idx._stage1_mode} (geometry too easy? lower --centers)"
    )
    flip = modes.index("scan")
    pre = [d for d in lat[1:flip] if d]  # skip compile dispatch 0
    post = lat[flip + 1:]               # skip the scan-compile dispatch
    if pre and post:
        print(
            f"pre-demotion (storming two-stage) median "
            f"{1e3*float(np.median(pre)):.1f} ms vs post-demotion scan "
            f"{1e3*float(np.median(post)):.1f} ms",
            flush=True,
        )
    print("DEMOTION VALIDATION OK", flush=True)


if __name__ == "__main__":
    main()
