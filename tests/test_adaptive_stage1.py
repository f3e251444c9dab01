"""Adaptive stage-1 selection for the exact two-stage path.

Real embedding corpora are near-tie continuums around the top-k
boundary: the residual proof that certifies the bf16 two-stage result
fails on EVERY batch there (measured 0/20 at 500k real-geometry rows),
silently degrading each search to its full-scan fallback. DenseIndex
now probes the margin at commit and picks bf16 (isotropic data),
bf16x2 (hi/lo split stage 1, ~100x tighter bound), or a direct chunked
f32 scan (margin-free data) — a wrong pick costs speed only, never
exactness.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from persian_rag_tpu.index.dense import DenseIndex
from persian_rag_tpu.ops.flat_topk import (
    flat_topk_exact2_stream,
    flat_topk_ref,
    flat_topk_scan,
)


def test_bf16x2_stream_exact_and_proof_on_cone():
    """On tight-cone data the plain-bf16 proof fails but the bf16x2
    proof holds (dot metric); ids equal the reference either way.
    (Seed pinned: the cone's margins are near the x2 bound, so the
    proof outcome is seed-sensitive — which is exactly why the commit
    probe exists.)"""
    rng = np.random.default_rng(1)
    n, d, q_n, k = 8000, 64, 24, 10
    base = rng.standard_normal((1, d)).astype(np.float32)
    c = base + 0.05 * rng.standard_normal((n, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    q = c[:q_n] + 0.02 * rng.standard_normal((q_n, d)).astype(np.float32)
    c32 = jnp.asarray(c)
    mu = jnp.mean(c32, axis=0)
    cen = c32 - mu[None, :]
    hi = cen.astype(jnp.bfloat16)
    lo = (cen - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    sqmax = jnp.max(jnp.sum(cen * cen, axis=-1))

    ws, wi = flat_topk_ref(jnp.asarray(q), c32, k, "dot")
    gs, gi, ok16 = flat_topk_exact2_stream(
        jnp.asarray(q), c32, k, metric="dot", tile_n=1024, tile_q=32,
        corpus_bf16=hi, corpus_center=mu, center_sqmax=sqmax,
        interpret=True, return_ok=True,
    )
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
    gs2, gi2, ok_x2 = flat_topk_exact2_stream(
        jnp.asarray(q), c32, k, metric="dot", tile_n=1024, tile_q=32,
        corpus_bf16=hi, corpus_bf16_lo=lo, corpus_center=mu,
        center_sqmax=sqmax, interpret=True, return_ok=True,
    )
    np.testing.assert_array_equal(np.asarray(gi2), np.asarray(wi))
    np.testing.assert_allclose(np.asarray(gs2), np.asarray(ws), rtol=1e-5)
    ok16 = np.asarray(ok16)
    ok_x2 = np.asarray(ok_x2)
    assert ok16.shape == (q_n,) and ok_x2.shape == (q_n,)  # per-query
    assert not ok16.all(), "premise: plain bf16 proof should fail here"
    assert ok_x2.all(), "bf16x2 proof should hold on this cone"


def test_scan_mode_matches_ref(rng):
    n, d, q_n, k = 3000, 48, 9, 7
    c = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((q_n, d)).astype(np.float32)
    for metric in ("dot", "l2"):
        ws, wi = flat_topk_ref(jnp.asarray(q), jnp.asarray(c), k, metric)
        gs, gi = flat_topk_scan(
            jnp.asarray(q), jnp.asarray(c), k, metric, chunk=512
        )
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(ws), rtol=1e-5, atol=1e-6
        )


@pytest.mark.slow
def test_commit_probe_picks_bf16_on_isotropic(rng):
    n, d = 70_000, 48
    c = rng.standard_normal((n, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    idx = DenseIndex(d, metric="ip")
    idx.add(c)
    idx.commit()
    assert idx._stage1_mode == "bf16"
    assert idx._stage1_lo is None


@pytest.mark.slow
def test_commit_probe_escalates_on_cone_and_stays_exact(rng):
    """Tight-cone corpus at two-stage scale: the probe must NOT pick
    plain bf16, and the search must still equal the reference scan."""
    n, d = 70_000, 48
    base = rng.standard_normal((1, d)).astype(np.float32)
    c = base + 0.05 * rng.standard_normal((n, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    idx = DenseIndex(d, metric="ip")
    idx.add(c)
    idx.commit()
    assert idx._stage1_mode in ("bf16x2", "scan"), idx._stage1_mode
    if idx._stage1_mode == "bf16x2":
        assert idx._stage1_lo is not None

    q = c[:6] + 0.02 * rng.standard_normal((6, d)).astype(np.float32)
    s, i = idx.search(q, 10)
    ws, wi = flat_topk_ref(jnp.asarray(q), jnp.asarray(c), 10, "dot")
    np.testing.assert_array_equal(i, np.asarray(wi))
    np.testing.assert_allclose(s, np.asarray(ws), rtol=1e-5)


def test_flat_topk_return_ok_none_outside_two_stage(rng):
    """The dispatcher reports no verdict (None) when a regime without a
    residual proof serves the call — callers treat None as "no signal"
    and must not count it toward the demotion streak."""
    from persian_rag_tpu.ops.flat_topk import flat_topk

    c = rng.standard_normal((500, 32)).astype(np.float32)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    s, i, ok = flat_topk(jnp.asarray(q), jnp.asarray(c), 5, return_ok=True)
    assert ok is None
    ws, wi = flat_topk_ref(jnp.asarray(q), jnp.asarray(c), 5, "dot")
    np.testing.assert_array_equal(np.asarray(i), np.asarray(wi))
    s2, i2, ok2 = flat_topk(
        jnp.asarray(q), jnp.asarray(c), 5, mode="scan", return_ok=True
    )
    assert ok2 is None
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(wi))


def test_runtime_demotion_streak():
    """Three consecutive majority-fail proof verdicts demote exact
    serving to the chunked scan; a majority-pass dispatch resets the
    streak; None (non-two-stage dispatch) leaves it untouched; the
    demotion is sticky until the next commit()."""
    idx = DenseIndex(16, metric="ip")
    idx._stage1_mode = "bf16x2"
    fail = np.array([False] * 3 + [True])   # 75% fail -> majority-fail
    ok = np.array([True] * 3 + [False])     # 75% pass

    idx._note_proof_verdict(fail)
    idx._note_proof_verdict(fail)
    assert idx._stage1_mode == "bf16x2" and idx._fail_streak == 2
    idx._note_proof_verdict(None)  # no signal: streak untouched
    assert idx._fail_streak == 2
    idx._note_proof_verdict(ok)    # majority pass resets
    assert idx._fail_streak == 0 and idx._stage1_mode == "bf16x2"

    for _ in range(DenseIndex.DEMOTE_STREAK):
        idx._note_proof_verdict(fail)
    assert idx._stage1_mode == "scan"
    assert idx._stage1_lo is None
    idx._note_proof_verdict(ok)    # sticky: pass does not re-promote
    assert idx._stage1_mode == "scan"

    # commit() re-probes and clears the streak
    rng2 = np.random.default_rng(3)
    idx.add(rng2.standard_normal((100, 16)).astype(np.float32))
    idx.commit()
    assert idx._fail_streak == 0
    assert idx._stage1_mode == "bf16"  # small corpus: probe default


def test_search_feeds_demotion_counter(monkeypatch):
    """DenseIndex.search requests the proof verdict from the dispatcher
    in exact mode and routes it into the demotion counter."""
    rng2 = np.random.default_rng(5)
    idx = DenseIndex(24, metric="ip")
    idx.add(rng2.standard_normal((300, 24)).astype(np.float32))
    idx.commit()

    seen = []
    orig = DenseIndex._note_proof_verdict

    def spy(self, ok):
        seen.append(ok)
        return orig(self, ok)

    monkeypatch.setattr(DenseIndex, "_note_proof_verdict", spy)
    q = rng2.standard_normal((3, 24)).astype(np.float32)
    idx.search(q, 4)
    # CPU never engages the two-stage regime -> verdict must be None,
    # and the call must still have flowed through the counter hook
    assert seen == [None]
    assert idx._fail_streak == 0


def test_sliced_proof_fallback_stays_exact():
    """Batches above the proof-slice width apply the residual proof per
    256-query slice (the ALL-quantifier fails almost surely at large
    batches — measured 3.1 ms -> 20.8 ms at 2048x100k from whole-batch
    fallback); failing slices rescan independently and results stay
    bit-identical to the reference."""
    rng = np.random.default_rng(1)
    n, d, k = 9000, 64, 10
    base = rng.standard_normal((1, d)).astype(np.float32)
    c = base + 0.05 * rng.standard_normal((n, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    q = c[:600] + 0.02 * rng.standard_normal((600, d)).astype(np.float32)
    ws, wi = flat_topk_ref(jnp.asarray(q), jnp.asarray(c), k, "dot")
    gs, gi = flat_topk_exact2_stream(
        jnp.asarray(q), jnp.asarray(c), k, metric="dot",
        tile_n=1024, tile_q=32, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ws), rtol=1e-5)


def test_sliced_proof_allpass_fast_branch_exact():
    """The sliced machinery is nested behind a whole-batch all-pass
    cond (measured ~5 ms/dispatch of scan-of-conds overhead at
    2048x1M even with zero failing slices). Planted well-separated
    geometry (each query's top-12 scores spaced ~0.025 >> the bf16
    eps window; everything else at random-noise level) makes a
    600-query batch prove deterministically, taking the cheap
    keep-everything branch; results must be bit-identical to the
    reference."""
    rng = np.random.default_rng(7)
    d, k, n_q, n_planted = 384, 10, 600, 12
    q = rng.standard_normal((n_q, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    # per query, 12 rows at controlled similarity 0.97 .. 0.70
    targets = np.linspace(0.97, 0.70, n_planted).astype(np.float32)
    alphas = np.sqrt(1.0 / targets**2 - 1.0)
    noise = rng.standard_normal((n_q, n_planted, d)).astype(np.float32)
    noise /= np.linalg.norm(noise, axis=2, keepdims=True)
    planted = q[:, None, :] + alphas[None, :, None] * noise
    planted /= np.linalg.norm(planted, axis=2, keepdims=True)
    filler = rng.standard_normal((1800, d)).astype(np.float32)
    filler /= np.linalg.norm(filler, axis=1, keepdims=True)
    # rank-major interleave: query i's planted rows sit 600 apart, so a
    # 1024-row tile holds at most 2 of them — a random shuffle lets ~2%
    # of queries put >= n_easy+1 planted rows in one tile, starving the
    # candidate extraction and (correctly) failing that query's proof
    c = np.concatenate([planted.transpose(1, 0, 2).reshape(-1, d), filler])
    ws, wi = flat_topk_ref(jnp.asarray(q), jnp.asarray(c), k, "dot")
    gs, gi, ok = flat_topk_exact2_stream(
        jnp.asarray(q), jnp.asarray(c), k, metric="dot",
        tile_n=1024, tile_q=32, interpret=True, return_ok=True,
    )
    assert bool(np.all(np.asarray(ok))), (
        f"{int(np.sum(~np.asarray(ok)))} queries failed the proof"
    )
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ws), rtol=1e-5)
