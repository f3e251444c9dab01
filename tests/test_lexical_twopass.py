"""Two-pass union lexical serving: bf16 candidates + exact rescore + proof.

Covers ops.sparse_scores.sparse_topk_union_twopass (kernel interpret
path and the XLA emulation path) and the index-level _TWOPASS_* gate.
Reference behavior being matched: rank_bm25 ``BM25Okapi.get_scores`` +
argsort top-k (reference src/retrieval.py:117-143) — the two-pass path
must be RESULT-exact (rescored f32 scores, full-scan id set) whenever
it answers, and must fall back to the exact kernel when the residual
proof cannot guarantee that.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from persian_rag_tpu.index import lexical as lexical_mod
from persian_rag_tpu.index.lexical import BM25Index
from persian_rag_tpu.ops.sparse_scores import (
    hash_segments,
    sparse_scores_ref,
    sparse_topk_union_twopass,
)


def _random_ell(rng, n, l, vocab, zipf=1.3):
    """Front-contiguous nonneg ELL with zipf-ish term ids."""
    ids = np.full((n, l), -1, np.int32)
    vals = np.zeros((n, l), np.float32)
    for d in range(n):
        nt = rng.integers(3, l + 1)
        tids = np.unique(
            (rng.zipf(zipf, nt * 2) - 1).clip(0, vocab - 1)
        )[:nt].astype(np.int32)
        ids[d, : len(tids)] = tids
        vals[d, : len(tids)] = rng.uniform(0.5, 4.0, len(tids))
    return ids, vals


def _queries(rng, b, t, vocab):
    qids = np.full((b, t), -1, np.int32)
    qvals = np.zeros((b, t), np.float32)
    for i in range(b):
        nt = rng.integers(2, t + 1)
        tids = np.unique(
            (rng.zipf(1.3, nt * 2) - 1).clip(0, vocab - 1)
        )[:nt].astype(np.int32)
        qids[i, : len(tids)] = tids
        qvals[i, : len(tids)] = rng.uniform(0.5, 2.0, len(tids))
    return qids, qvals


def _ref_topk(ids, vals, qids, qvals, k):
    scores = np.asarray(
        sparse_scores_ref(
            jnp.asarray(ids), jnp.asarray(vals),
            jnp.asarray(qids), jnp.asarray(qvals),
        )
    )
    # score desc, lower id first (the kernels' documented tie order)
    order = np.lexsort((np.arange(scores.shape[1])[None, :].repeat(
        scores.shape[0], 0), -scores), axis=1)[:, :k]
    return np.take_along_axis(scores, order, axis=1), order.astype(
        np.int32
    )


@pytest.mark.parametrize("use_pallas", [True, False])
def test_twopass_matches_reference_flat(use_pallas):
    rng = np.random.default_rng(0)
    n, l, vocab, b, t, k = 700, 12, 400, 24, 8, 5
    ids, vals = _random_ell(rng, n, l, vocab)
    qids, qvals = _queries(rng, b, t, vocab)
    s, i, ok = sparse_topk_union_twopass(
        jnp.asarray(ids), jnp.asarray(vals), None, None,
        jnp.asarray(qids), jnp.asarray(qvals), k,
        use_pallas=use_pallas, return_ok=True,
    )
    rs, ri = _ref_topk(ids, vals, qids, qvals, k)
    np.testing.assert_array_equal(np.asarray(i), ri)
    np.testing.assert_allclose(np.asarray(s), rs, rtol=2e-6, atol=1e-6)
    # random continuous weights: margins are %-scale, the proof should
    # pass for at least most queries (a fallback batch is still exact,
    # but a 0% pass rate would make two-pass pure overhead)
    assert np.asarray(ok).mean() > 0.5


@pytest.mark.parametrize("use_pallas", [True, False])
def test_twopass_hashed_union_copy(use_pallas):
    rng = np.random.default_rng(1)
    n, l, vocab, b, t, k = 640, 16, 300, 16, 8, 4
    ids, vals = _random_ell(rng, n, l, vocab)
    ids3, vals3 = hash_segments(ids, vals, 4)
    qids, qvals = _queries(rng, b, t, vocab)
    s, i = sparse_topk_union_twopass(
        jnp.asarray(ids), jnp.asarray(vals),
        jnp.asarray(ids3), jnp.asarray(vals3),
        jnp.asarray(qids), jnp.asarray(qvals), k,
        use_pallas=use_pallas,
    )
    rs, ri = _ref_topk(ids, vals, qids, qvals, k)
    np.testing.assert_array_equal(np.asarray(i), ri)
    np.testing.assert_allclose(np.asarray(s), rs, rtol=2e-6, atol=1e-6)


@pytest.mark.parametrize("use_pallas", [True, False])
def test_twopass_proof_falls_back_on_ties(use_pallas):
    """> k_scan identical docs: every bf16 candidate cut is a tie, the
    k-th rescored score cannot clear the bound, and the lax.cond must
    serve the exact kernel's answer (lowest-id-first duplicate order)."""
    rng = np.random.default_rng(2)
    n, l, vocab, b, t, k = 400, 6, 50, 8, 4, 5
    ids, vals = _random_ell(rng, n, l, vocab)
    # plant 80 byte-identical rows on term ids OUTSIDE the random vocab
    # (so ONLY plants match the query) — far more than k_scan=32
    row_i = np.array([60, 61, 62, -1, -1, -1], np.int32)
    row_v = np.array([2.0, 1.5, 1.0, 0.0, 0.0, 0.0], np.float32)
    plant = rng.choice(n, 80, replace=False)
    ids[plant] = row_i
    vals[plant] = row_v
    qids = np.full((b, t), -1, np.int32)
    qvals = np.zeros((b, t), np.float32)
    qids[:, :3] = [60, 61, 62]
    qvals[:, :3] = 1.0
    s, i, ok = sparse_topk_union_twopass(
        jnp.asarray(ids), jnp.asarray(vals), None, None,
        jnp.asarray(qids), jnp.asarray(qvals), k,
        use_pallas=use_pallas, return_ok=True,
    )
    assert not bool(np.asarray(ok).any())
    rs, ri = _ref_topk(ids, vals, qids, qvals, k)
    np.testing.assert_array_equal(np.asarray(i), ri)
    np.testing.assert_allclose(np.asarray(s), rs, rtol=2e-6, atol=1e-6)


def test_index_gate_routes_and_matches(monkeypatch):
    """BM25Index with the _TWOPASS_MIN_N gate lowered: two-pass 'auto'
    must return the same ids/scores as two_pass='off' on a
    vocabulary-sharing batch (the union-gated regime)."""
    monkeypatch.setattr(lexical_mod, "_TWOPASS_MIN_N", 1)
    rng = np.random.default_rng(3)
    vocab = [f"w{j}" for j in range(120)]
    docs = [
        " ".join(rng.choice(vocab[:60], rng.integers(4, 9), replace=False))
        for _ in range(300)
    ]
    queries = [
        " ".join(rng.choice(vocab[:30], 3, replace=False))
        for _ in range(16)
    ]

    def run(mode):
        idx = BM25Index()
        idx.build(docs)
        idx.batch_kernel = "union"
        idx.two_pass = mode
        return idx.search(queries, k=5)

    s_tp, i_tp = run("auto")
    s_off, i_off = run("off")
    np.testing.assert_array_equal(i_tp, i_off)
    np.testing.assert_allclose(s_tp, s_off, rtol=2e-6, atol=1e-6)


@pytest.mark.parametrize("use_pallas", [True, False])
def test_twopass_zero_cut_trivially_proven(use_pallas):
    """All-OOV / empty queries score every doc 0: the old '0 > 0' proof
    failed them (forcing the exact-kernel fallback on every dispatch);
    a zero stage-1 cut must now be trivially proven, with the full
    scan's lowest-id-first zero-tie order."""
    rng = np.random.default_rng(5)
    n, l, vocab, b, t, k = 500, 8, 300, 8, 6, 5
    ids, vals = _random_ell(rng, n, l, vocab)
    # half the batch all-OOV (ids outside the corpus vocab), half empty
    qids = np.full((b, t), -1, np.int32)
    qvals = np.zeros((b, t), np.float32)
    qids[: b // 2, :2] = [[vocab + 7, vocab + 9]] * (b // 2)
    qvals[: b // 2, :2] = 1.0
    s, i, ok = sparse_topk_union_twopass(
        jnp.asarray(ids), jnp.asarray(vals), None, None,
        jnp.asarray(qids), jnp.asarray(qvals), k,
        use_pallas=use_pallas, return_ok=True,
    )
    assert bool(np.asarray(ok).all())
    rs, ri = _ref_topk(ids, vals, qids, qvals, k)
    np.testing.assert_array_equal(np.asarray(i), ri)
    np.testing.assert_allclose(np.asarray(s), rs, rtol=2e-6, atol=1e-6)


@pytest.mark.parametrize("use_pallas", [True, False])
def test_twopass_n_union_bound_still_exact(use_pallas):
    """The runtime-tightened bound (traced unique-term count instead of
    the static b*t worst case) must stay result-exact and never pass
    FEWER queries than the loose bound."""
    rng = np.random.default_rng(6)
    n, l, vocab, b, t, k = 700, 12, 400, 24, 8, 5
    ids, vals = _random_ell(rng, n, l, vocab)
    qids, qvals = _queries(rng, b, t, vocab)
    n_u = len(np.unique(qids[qids >= 0]))
    s, i, ok = sparse_topk_union_twopass(
        jnp.asarray(ids), jnp.asarray(vals), None, None,
        jnp.asarray(qids), jnp.asarray(qvals), k,
        use_pallas=use_pallas, return_ok=True,
        n_union=jnp.float32(n_u),
    )
    _, _, ok_loose = sparse_topk_union_twopass(
        jnp.asarray(ids), jnp.asarray(vals), None, None,
        jnp.asarray(qids), jnp.asarray(qvals), k,
        use_pallas=use_pallas, return_ok=True,
    )
    assert np.asarray(ok).sum() >= np.asarray(ok_loose).sum()
    rs, ri = _ref_topk(ids, vals, qids, qvals, k)
    np.testing.assert_array_equal(np.asarray(i), ri)
    np.testing.assert_allclose(np.asarray(s), rs, rtol=2e-6, atol=1e-6)


def test_twopass_sticky_demotion(monkeypatch):
    """A corpus whose live batches majority-fail the proof must flip
    off the two-pass path after TWOPASS_DEMOTE_STREAK dispatches
    (every such dispatch pays candidates + rescore + the full exact
    fallback), with results exact throughout."""
    monkeypatch.setattr(lexical_mod, "_TWOPASS_MIN_N", 1)
    rng = np.random.default_rng(7)
    vocab = [f"w{j}" for j in range(40)]
    # > k_scan byte-identical docs matching the query: every candidate
    # cut is a tie, the proof can never clear it
    docs = ["w0 w1 w2"] * 80 + [
        " ".join(rng.choice(vocab[3:], 5, replace=False))
        for _ in range(240)
    ]
    idx = BM25Index()
    idx.build(docs)
    idx.batch_kernel = "union"
    idx.two_pass = "auto"  # opt-in (default off per chip measurement)
    ref_s, ref_i = None, None
    for _ in range(idx.TWOPASS_DEMOTE_STREAK):
        assert not idx._twopass_demoted
        s, i = idx.search(["w0 w1 w2"] * 16, k=5)
        if ref_s is None:
            off = BM25Index()
            off.build(docs)
            off.batch_kernel = "union"
            off.two_pass = "off"
            ref_s, ref_i = off.search(["w0 w1 w2"] * 16, k=5)
        np.testing.assert_array_equal(i, ref_i)
        np.testing.assert_allclose(s, ref_s, rtol=2e-6, atol=1e-6)
    assert idx._twopass_demoted
    # demoted serving stays exact (and no longer routes two-pass)
    s, i = idx.search(["w0 w1 w2"] * 16, k=5)
    np.testing.assert_array_equal(i, ref_i)
    # a rebuild resets the verdict
    idx.build(docs)
    assert not idx._twopass_demoted
    assert idx._twopass_fail_streak == 0


def test_negative_weights_disable_two_pass():
    """A corpus with any negative stored contribution must never route
    through the proof (its envelope only holds for nonneg weights)."""
    idx = BM25Index()
    ids = np.array([[0, 1, -1], [1, 2, -1], [0, 2, -1]], np.int32)
    vals = np.array(
        [[1.0, -0.5, 0.0], [0.5, 1.0, 0.0], [1.0, 2.0, 0.0]], np.float32
    )
    idx._set_ell(ids, vals)
    assert idx._nonneg is False
    vals2 = np.abs(vals)
    idx._set_ell(ids, vals2)
    assert idx._nonneg is True
