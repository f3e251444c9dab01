"""Parity tests for every flat-search kernel mode (interpret on CPU).

exact / exactns / scan are bit-exact (ids AND scores); fast variants
(fast / fastns / fasti / fastg) return the exact top-k SET at 21-bit key
precision — ordering may permute within quantized ties, so they assert
set equality plus score closeness.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from persian_rag_tpu.ops.flat_topk import (
    flat_topk_pallas,
    flat_topk_ref,
    flat_topk_scan,
)

CASES = [(900, 48, 7, 8, 256), (1003, 32, 10, 16, 256)]


@pytest.mark.parametrize("mode", ["exact", "exactns"])
@pytest.mark.parametrize("metric", ["dot", "l2"])
def test_exact_modes_bit_exact(rng, mode, metric):
    for n, d, k, tq, tn in CASES:
        c = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal((9, d)).astype(np.float32)
        w_s, w_i = flat_topk_ref(jnp.asarray(q), jnp.asarray(c), k, metric)
        g_s, g_i = flat_topk_pallas(
            jnp.asarray(q), jnp.asarray(c), k, metric=metric,
            tile_q=tq, tile_n=tn, mode=mode, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(g_i), np.asarray(w_i))
        np.testing.assert_allclose(
            np.asarray(g_s), np.asarray(w_s), rtol=1e-6, atol=1e-6
        )


@pytest.mark.parametrize("metric", ["dot", "l2"])
def test_scan_path_bit_exact(rng, metric):
    for n, d, k, _, chunk in CASES:
        c = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal((9, d)).astype(np.float32)
        w_s, w_i = flat_topk_ref(jnp.asarray(q), jnp.asarray(c), k, metric)
        g_s, g_i = flat_topk_scan(
            jnp.asarray(q), jnp.asarray(c), k, metric, chunk=chunk
        )
        np.testing.assert_array_equal(np.asarray(g_i), np.asarray(w_i))
        np.testing.assert_allclose(
            np.asarray(g_s), np.asarray(w_s), rtol=1e-6, atol=1e-6
        )


def test_scan_tie_breaking_prefers_lower_ids(rng):
    c = np.tile(rng.standard_normal((50, 16)).astype(np.float32), (4, 1))
    q = rng.standard_normal((3, 16)).astype(np.float32)
    w_s, w_i = flat_topk_ref(jnp.asarray(q), jnp.asarray(c), 8, "dot")
    g_s, g_i = flat_topk_scan(jnp.asarray(q), jnp.asarray(c), 8, "dot",
                              chunk=64)
    np.testing.assert_array_equal(np.asarray(g_i), np.asarray(w_i))


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["fast", "fastns", "fasti", "fastg"])
@pytest.mark.parametrize("metric", ["dot", "l2"])
def test_fast_modes_exact_set(rng, mode, metric):
    for n, d, k, tq, tn in CASES:
        c = rng.standard_normal((n, d)).astype(np.float32)
        q = rng.standard_normal((9, d)).astype(np.float32)
        w_s, w_i = flat_topk_ref(jnp.asarray(q), jnp.asarray(c), k, metric)
        g_s, g_i = flat_topk_pallas(
            jnp.asarray(q), jnp.asarray(c), k, metric=metric,
            tile_q=tq, tile_n=tn, mode=mode, interpret=True,
        )
        gi, wi = np.asarray(g_i), np.asarray(w_i)
        for r in range(9):
            assert set(gi[r]) == set(wi[r]), (mode, metric, n, r)
            assert len(set(gi[r].tolist())) == k, "duplicate ids"
        np.testing.assert_allclose(
            np.sort(np.asarray(g_s), 1), np.sort(np.asarray(w_s), 1),
            rtol=5e-4, atol=5e-4,
        )


@pytest.mark.slow
@pytest.mark.parametrize("tile_n,lane_slots,lane_depth",
                         [(1024, 4, 2), (2048, 8, 2), (1024, 8, 3)])
def test_lane_sliced_extraction_bound_and_parity(rng, tile_n, lane_slots,
                                                 lane_depth):
    """Lane-sliced two-level candidate extraction (round 5): per-tile
    bound must cover every non-extracted element (the two-stage proof
    consumes it), and the full e2s path must stay set-identical to the
    reference. The bound is WEAKER than the plain kernel's exact
    (n_easy+1)-th — elements hidden behind their chunk-offset's top-2
    are covered by max(r2) — so validity, not tightness, is the
    contract."""
    from persian_rag_tpu.ops.flat_topk import (
        _COL_MASK,
        _score_to_ikey,
        flat_topk_candidates,
        flat_topk_exact2_stream,
        flat_topk_ref,
    )

    n, d, nq, n_easy = 5000, 64, 24, 4
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    keys, bounds, tnn = flat_topk_candidates(
        jnp.asarray(q), jnp.asarray(corpus).astype(jnp.bfloat16),
        metric="dot", tile_n=tile_n, tile_q=16, n_easy=n_easy,
        interpret=True, lane_slots=lane_slots, lane_depth=lane_depth,
    )
    keys, bounds = np.asarray(keys), np.asarray(bounds)
    sc = np.asarray(
        jnp.asarray(q).astype(jnp.bfloat16).astype(jnp.float32)
        @ jnp.asarray(corpus).astype(jnp.bfloat16).astype(jnp.float32).T
    )
    n_tiles = -(-n // tnn)
    for qi in range(0, nq, 7):
        for j in range(n_tiles):
            tile = sc[qi, j * tnn:(j + 1) * tnn]
            ik = np.asarray(
                _score_to_ikey(jnp.asarray(tile))
            ).astype(np.int64)
            packed = (ik & ~_COL_MASK) | (tnn - 1 - np.arange(len(tile)))
            extracted = set(
                keys[qi, j * n_easy:(j + 1) * n_easy].tolist()
            )
            over = [
                int(p) for p in packed
                if int(p) not in extracted and int(p) > int(bounds[qi, j])
            ]
            assert not over, (qi, j, over[:3])

    for metric in ("dot", "l2"):
        _, got = flat_topk_exact2_stream(
            jnp.asarray(q), jnp.asarray(corpus), 10, metric=metric,
            tile_n=tile_n, tile_q=16, n_easy=n_easy, interpret=True,
            lane_slots=lane_slots, lane_depth=lane_depth,
        )
        _, want = flat_topk_ref(
            jnp.asarray(q), jnp.asarray(corpus), 10, metric=metric
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
