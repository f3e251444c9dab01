"""Adversarial exactness validation of the dispatching flat search on chip.

Round-2 ran these checks ad hoc at the then-current tiles (tn=2048);
this scripts them so every tile-regime change re-validates. Plants at
N=100k (the tn=1024 regime) for batches 512 AND 2048 (the tq=512
regime), dot and l2:

  * a 6-row exact-duplicate group -> must tie-break lowest-id-first
    (FAISS order) and appear as a block in the top-k;
  * a 12-row near-tie fan (input separations 2e-4 -> score gaps well
    above f32 ulp, so CPU/TPU must agree on the order; separations at
    1e-6 collapse to 1-ulp ties whose order is legitimately
    implementation-dependent — the documented sub-ulp caveat, verified
    here by construction);
  * a zero-norm query -> for dot the scores are EXACTLY 0 (ties ->
    lowest-id-first, ids 0..k-1); for l2 the "ties" are per-row
    ||c||^2 f32 rounding noise, so only score closeness is checkable;
  * everything embedded in a batch of random queries (the planted
    queries must not perturb neighbors' results).

Compares ids AND scores against the stable-argsort f32 NumPy scan.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# --n overrides N (round 5: N >= 150k engages tn=2048, where batch-2048
# also engages the lane-sliced extraction — every regime change must
# re-run this at BOTH scales)
N, D, K = 100_000, 384, 10
if "--n" in sys.argv:
    N = int(sys.argv[sys.argv.index("--n") + 1])
DUP_IDS = [777, 31_337, 54_321, 60_000, 88_888, 99_999]
FAN_BASE = 1234  # near-tie fan occupies ids 1234..1245


W = None  # set by build_corpus; probe queries need the fan direction


def build_corpus(rng):
    global W
    c = rng.standard_normal((N, D)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    # exact duplicate group
    for i in DUP_IDS[1:]:
        c[i] = c[DUP_IDS[0]]
    # near-tie fan: 12 rows = normalize(v + j * 2e-4 * w) — 2e-4 keeps
    # angled-probe score gaps ~100 ulp above f32 rounding (see module
    # docstring; 1e-6 separations collapse to rounding-order ties)
    v = c[FAN_BASE].copy()
    w = rng.standard_normal(D).astype(np.float32)
    w /= np.linalg.norm(w)
    W = w
    for j in range(12):
        row = v + (j * 2e-4) * w
        c[FAN_BASE + j] = row / np.linalg.norm(row)
    return c


def reference(queries, corpus, metric):
    if metric == "dot":
        scores = queries @ corpus.T
        order = np.argsort(-scores, axis=1, kind="stable")[:, :K]
        return np.take_along_axis(scores, order, axis=1), order
    d2 = (
        np.sum(queries * queries, 1, keepdims=True)
        - 2.0 * (queries @ corpus.T)
        + np.sum(corpus * corpus, 1)[None, :]
    ).astype(np.float32)
    order = np.argsort(d2, axis=1, kind="stable")[:, :K]
    return np.take_along_axis(d2, order, axis=1), order


def main():
    import jax
    import jax.numpy as jnp

    from persian_rag_tpu.ops.flat_topk import flat_topk

    rng = np.random.default_rng(42)
    corpus = build_corpus(rng)
    cdev = jax.device_put(jnp.asarray(corpus))

    failures = 0
    for batch in (512, 2048):
        q = rng.standard_normal((batch, D)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        q[0] = corpus[DUP_IDS[0]]          # hits the duplicate group
        # fan probes sit at an ANGLE to the fan direction w: the score
        # gap per fan step is then first-order (2e-4 * 0.1 ~ 2e-5,
        # ~150 f32 ulp at score 1.0 — both implementations must order
        # identically). A probe ON the fan sees only quadratic
        # (sub-ulp) gaps whose order is legitimately rounding-dependent.
        q1 = corpus[FAN_BASE] + 0.1 * W
        q[1] = q1 / np.linalg.norm(q1)
        q[2] = 0.0                         # zero-norm
        q3 = corpus[FAN_BASE] - 0.07 * W
        q[3] = q3 / np.linalg.norm(q3)

        for metric in ("dot", "l2"):
            want_s, want_i = reference(q, corpus, metric)
            s, i = jax.block_until_ready(
                flat_topk(jnp.asarray(q), cdev, K, metric=metric,
                          mode="exact")
            )
            s, i = np.asarray(s), np.asarray(i)
            # flat_topk l2 returns true squared distances (ascending)
            rows = np.arange(batch)
            if metric == "l2":
                rows = rows[rows != 2]  # zero-norm l2: ulp-tied ids
            ok_ids = np.array_equal(i[rows], want_i[rows])
            subulp_rows = 0
            if not ok_ids:
                # Natural sub-ulp near-ties: with enough random queries
                # (~1/512 at 2048 x 200k, round-3 notes) two finalists'
                # true f32-HIGHEST scores land within ~1-2 ulp and the
                # refine einsum's reduction order can rank them
                # opposite the BLAS reference — the documented
                # empirical caveat (flat_topk_exact2_stream docstring).
                # Accept a mismatching UNPLANTED row iff the id SETS
                # agree and every disagreeing position sits in a
                # reference score gap <= 8 ulp; planted rows (0-3) keep
                # strict ordering checks.
                still_bad = []
                for r in rows[(i[rows] != want_i[rows]).any(axis=1)]:
                    if r <= 3 or set(i[r]) != set(want_i[r]):
                        still_bad.append(r)
                        continue
                    diff = np.where(i[r] != want_i[r])[0]
                    gaps = np.abs(
                        want_s[r][diff] - s[r][diff]
                    ) / np.maximum(np.spacing(np.abs(want_s[r][diff])), 1e-30)
                    if np.all(gaps <= 8):
                        subulp_rows += 1
                    else:
                        still_bad.append(r)
                ok_ids = not still_bad
            bitwise = np.array_equal(s, want_s)
            ok_scores = np.allclose(s, want_s, rtol=1e-6, atol=1e-6)
            # targeted asserts
            dup_block = i[0][: len(DUP_IDS)].tolist()
            dup_ok = dup_block == sorted(DUP_IDS)[: len(dup_block)]
            zero_ok = (
                i[2].tolist() == list(range(K)) if metric == "dot"
                else bool(np.allclose(s[2], 1.0, atol=1e-5))
            )
            status = "OK" if (ok_ids and ok_scores and dup_ok and zero_ok) \
                else "FAIL"
            if status == "FAIL":
                failures += 1
                bad = rows[np.where((i[rows] != want_i[rows]).any(axis=1))[0][:5]]
                print(f"  first mismatching queries: {bad.tolist()}")
                for b in bad[:2]:
                    print(f"    got  {i[b].tolist()} {s[b].tolist()}")
                    print(f"    want {want_i[b].tolist()} {want_s[b].tolist()}")
            print(
                f"batch={batch} metric={metric}: ids_equal={ok_ids} "
                f"(sub-ulp tie rows {subulp_rows}) "
                f"scores bitwise={bitwise}/close={ok_scores} "
                f"dup_lowest_first={dup_ok} "
                f"zero_norm_ids_0..k={zero_ok} -> {status}",
                flush=True,
            )
    # SERVING path: the same plants through DenseIndex.search (packed
    # single-transfer flow — scores ride an int32 bitcast container and
    # the proof verdict a packed column; this validates the transport
    # is bit-exact end to end, not just the kernel)
    from persian_rag_tpu.index.dense import DenseIndex

    for metric in ("ip", "l2"):
        index = DenseIndex(D, metric=metric)
        index.add(corpus)
        index.commit()
        q = rng.standard_normal((512, D)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        q[0] = corpus[DUP_IDS[0]]
        q1 = corpus[FAN_BASE] + 0.1 * W
        q[1] = q1 / np.linalg.norm(q1)
        q3 = corpus[FAN_BASE] - 0.07 * W
        q[3] = q3 / np.linalg.norm(q3)
        want_s, want_i = reference(q, corpus, "dot" if metric == "ip"
                                   else "l2")
        s, i = index.search(q, K)
        ok_ids = np.array_equal(i, want_i)
        ok_scores = np.allclose(s, want_s, rtol=1e-6, atol=1e-6)
        status = "OK" if (ok_ids and ok_scores) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"serving DenseIndex.search metric={metric} "
            f"(stage1={index._stage1_mode}): ids_equal={ok_ids} "
            f"scores_close={ok_scores} -> {status}",
            flush=True,
        )

    # ---- lexical mass-tie order (round-4 regression: Mosaic argmax is
    # not tie-deterministic on hardware; _merge._first_max_pos fixed it.
    # Quantized weights force huge exactly-equal score groups, the
    # regime that exposed the bug — CPU interpret never sees it.)
    from persian_rag_tpu.ops.sparse_scores import (
        hash_segments,
        sparse_topk_union_hashed_pallas,
        sparse_topk_union_pallas,
    )

    nl, ll, vocab, bl, tl, kl = 50_000, 12, 5000, 256, 8, 10
    lids = np.full((nl, ll), -1, np.int32)
    lvals = np.zeros((nl, ll), np.float32)
    nt = rng.integers(3, ll + 1, nl)
    for d_ in range(nl):
        tid = np.unique(
            (rng.zipf(1.3, 24) - 1).clip(0, vocab - 1)
        )[: nt[d_]].astype(np.int32)
        lids[d_, : len(tid)] = tid
        lvals[d_, : len(tid)] = (
            np.rint(rng.uniform(0.5, 4.0, len(tid)) * 2) / 2
        ).astype(np.float32)
    lq = np.full((bl, tl), -1, np.int32)
    lqv = np.zeros((bl, tl), np.float32)
    for i_ in range(bl):
        tid = np.unique(
            (rng.zipf(1.3, 16) - 1).clip(0, vocab - 1)
        )[: rng.integers(2, tl + 1)].astype(np.int32)
        lq[i_, : len(tid)] = tid
        lqv[i_, : len(tid)] = 1.0
    lscores = np.zeros((bl, nl), np.float64)
    for bi in range(bl):
        for ti in range(tl):
            q_ = lq[bi, ti]
            if q_ < 0:
                continue
            lscores[bi] += lqv[bi, ti] * np.where(
                lids == q_, lvals, 0
            ).sum(1)
    lorder = np.lexsort(
        (np.arange(nl)[None, :].repeat(bl, 0),
         -lscores.astype(np.float32)),
        axis=1,
    )[:, :kl]
    lids3, lvals3 = hash_segments(lids, lvals, 8)
    for lname, fn, arrs in (
        ("flat-union", sparse_topk_union_pallas,
         (jnp.asarray(lids), jnp.asarray(lvals))),
        ("hashed-union", sparse_topk_union_hashed_pallas,
         (jnp.asarray(lids3), jnp.asarray(lvals3))),
    ):
        f = jax.jit(
            lambda a, c, qi, qv, fn=fn: fn(a, c, qi, qv, kl)
        )
        _, li = f(*arrs, jnp.asarray(lq), jnp.asarray(lqv))
        eq = float(np.mean(np.asarray(li) == lorder))
        status = "OK" if eq == 1.0 else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"lexical mass-tie order {lname}: ids==lexsort {eq:.5f} "
            f"-> {status}",
            flush=True,
        )

    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
