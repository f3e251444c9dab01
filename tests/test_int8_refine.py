"""int8 storage tier: two-stage search (int8 scan -> exact refine)."""
import numpy as np

from persian_rag_tpu.index.dense import DenseIndex


def _recall(got, want):
    k = want.shape[1]
    return float(np.mean([
        len(set(got[q]) & set(want[q])) / k for q in range(want.shape[0])
    ]))


def test_int8_refine_recovers_true_topk(rng):
    """Isotropic data is the worst case for int8 candidate quality; the
    refine stage must recover the true top-10 (recall >= 0.999) and exact
    f32 scores."""
    n, d, k = 8000, 64, 10
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((32, d)).astype(np.float32)

    exact = DenseIndex(d, metric="cosine")
    exact.add(vectors)
    want_s, want = exact.search(queries, k)

    compact = DenseIndex(d, metric="cosine", storage_dtype="int8")
    compact.add(vectors)

    raw_s, raw = compact.search(queries, k, refine_k=0)  # raw int8 tier
    ref_s, ref = compact.search(queries, k)  # default: refined

    assert _recall(ref, want) >= 0.999, _recall(ref, want)
    assert _recall(ref, want) >= _recall(raw, want)
    # refined scores are exact f32 cosines of the returned ids
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    vn = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
    expect = np.take_along_axis(qn @ vn.T, ref, axis=1)
    np.testing.assert_allclose(ref_s, expect, rtol=1e-4, atol=1e-5)


def test_int8_refine_k_controls_candidates(rng):
    n, d, k = 2000, 32, 5
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((8, d)).astype(np.float32)
    index = DenseIndex(d, metric="ip", storage_dtype="int8")
    index.add(vectors)
    s_small, i_small = index.search(queries, k, refine_k=k)  # no slack
    s_big, i_big = index.search(queries, k, refine_k=500)
    exact = DenseIndex(d, metric="ip")
    exact.add(vectors)
    _, want = exact.search(queries, k)
    assert _recall(i_big, want) >= _recall(i_small, want)
    assert _recall(i_big, want) >= 0.999


def test_int8_no_refine_copy(rng):
    """refine_dtype=None stores the int8 tier alone; refine_k is a no-op."""
    vectors = rng.standard_normal((500, 16)).astype(np.float32)
    index = DenseIndex(16, metric="cosine", storage_dtype="int8",
                       refine_dtype=None, quality_floor=None)
    index.add(vectors)
    index.commit()
    assert index._refine_corpus is None
    s, i = index.search(vectors[:4], 3, refine_k=50)
    assert (i[:, 0] == np.arange(4)).all()


def test_fast_kernel_applies_row_scales(rng):
    """The packed-key fast kernel must fold int8 per-row dequant scales
    into the scores (previously only the exact kernel did)."""
    import jax.numpy as jnp

    from persian_rag_tpu.ops.flat_topk import flat_topk_pallas, flat_topk_ref

    c = rng.integers(-127, 128, size=(400, 32)).astype(np.int8)
    scales = rng.uniform(0.5, 2.0, size=400).astype(np.float32)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    want_s, want_i = flat_topk_ref(
        jnp.asarray(q), jnp.asarray(c), 5, "dot",
        corpus_scale=jnp.asarray(scales),
    )
    got_s, got_i = flat_topk_pallas(
        jnp.asarray(q), jnp.asarray(c), 5, metric="dot",
        corpus_scale=jnp.asarray(scales), tile_q=8, tile_n=128,
        compute_dtype=jnp.bfloat16, mode="fast", interpret=True,
    )
    # bf16 matmul on int8 values is exact; scales are f32 post-matmul
    for r in range(4):
        assert set(np.asarray(got_i)[r]) == set(np.asarray(want_i)[r])


def test_transposed_corpus_layout_matches(rng):
    """(d, N)-resident corpora (plain MXU matmul, no per-tile transpose)
    return identical results to the (N, d) layout."""
    import jax.numpy as jnp

    from persian_rag_tpu.ops.flat_topk import flat_topk_pallas, flat_topk_ref

    c = rng.standard_normal((700, 48)).astype(np.float32)
    q = rng.standard_normal((6, 48)).astype(np.float32)
    for metric in ("dot", "l2"):
        for mode in ("exact", "fast"):
            want_s, want_i = flat_topk_ref(
                jnp.asarray(q), jnp.asarray(c), 7, metric
            )
            got_s, got_i = flat_topk_pallas(
                jnp.asarray(q), jnp.asarray(np.ascontiguousarray(c.T)), 7,
                metric=metric, tile_q=8, tile_n=256, mode=mode,
                interpret=True, corpus_transposed=True,
            )
            np.testing.assert_array_equal(
                np.asarray(got_i), np.asarray(want_i)
            )
            rtol = 1e-5 if mode == "exact" else 5e-4
            np.testing.assert_allclose(
                np.asarray(got_s), np.asarray(want_s), rtol=rtol, atol=5e-4
            )


def test_int8_recommit_preserves_precision(rng):
    """Re-commit after add() must rebuild from the full-precision refine
    copy, not the lossy int8 values."""
    a = rng.standard_normal((60, 16)).astype(np.float32)
    b = rng.standard_normal((60, 16)).astype(np.float32)
    index = DenseIndex(16, metric="ip", storage_dtype="int8")
    index.add(a)
    index.commit()
    index.add(b)
    index.commit()
    both = np.concatenate([a, b])
    np.testing.assert_allclose(index.vectors(), both, rtol=1e-6, atol=1e-6)


def test_scaled_candidates_contain_true_topk(rng):
    """flat_topk_scaled_candidates (the int8 tier's merge-free stage-1)
    must surface every true top-k row for isotropic data so the exact
    refine can reproduce the full-precision ranking."""
    import jax.numpy as jnp

    from persian_rag_tpu.ops.flat_topk import flat_topk_scaled_candidates

    n, d, q, k = 6000, 48, 8, 10
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    scales = np.maximum(np.abs(corpus).max(axis=1) / 127.0, 1e-12)
    values = np.clip(
        np.rint(corpus / scales[:, None]), -127, 127
    ).astype(np.int8)
    queries = rng.standard_normal((q, d)).astype(np.float32)

    cand = np.asarray(
        flat_topk_scaled_candidates(
            jnp.asarray(queries),
            jnp.asarray(values),
            jnp.asarray(scales.astype(np.float32)),
            k_scan=64,
            tile_n=512,
            tile_q=8,
            interpret=True,
        )
    )
    # ground truth over the DEQUANTIZED values (what stage-1 ranks)
    deq = values.astype(np.float32) * scales[:, None]
    want = np.argsort(-(queries @ deq.T), axis=1)[:, :k]
    for r in range(q):
        missing = set(want[r]) - set(cand[r].tolist())
        assert not missing, (r, missing)
