"""Parity tests for the padded-ELL lexical scoring op."""
import numpy as np
import jax.numpy as jnp
import pytest

from persian_rag_tpu.ops.sparse_scores import (
    sparse_scores_ref,
    sparse_topk,
    sparse_topk_pallas,
)


def make_corpus(rng, n_docs, vocab, max_len):
    ids = np.full((n_docs, max_len), -1, np.int32)
    vals = np.zeros((n_docs, max_len), np.float32)
    for d in range(n_docs):
        length = rng.integers(1, max_len + 1)
        terms = rng.choice(vocab, size=length, replace=False)
        ids[d, :length] = terms
        vals[d, :length] = rng.random(length).astype(np.float32)
    return ids, vals


def make_queries(rng, b, vocab, t):
    qids = np.full((b, t), -1, np.int32)
    qvals = np.zeros((b, t), np.float32)
    for i in range(b):
        length = rng.integers(1, t + 1)
        qids[i, :length] = rng.choice(vocab, size=length, replace=False)
        qvals[i, :length] = rng.random(length).astype(np.float32)
    return qids, qvals


def brute_force(ids, vals, qids, qvals):
    b, n = qids.shape[0], ids.shape[0]
    out = np.zeros((b, n), np.float32)
    for bi in range(b):
        lookup = {
            int(t): float(v) for t, v in zip(qids[bi], qvals[bi]) if t >= 0
        }
        for d in range(n):
            s = 0.0
            for t, v in zip(ids[d], vals[d]):
                if t >= 0 and int(t) in lookup:
                    s += lookup[int(t)] * v
            out[bi, d] = s
    return out


def test_ref_matches_bruteforce(rng):
    ids, vals = make_corpus(rng, n_docs=60, vocab=200, max_len=12)
    qids, qvals = make_queries(rng, b=5, vocab=200, t=6)
    want = brute_force(ids, vals, qids, qvals)
    got = sparse_scores_ref(
        jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(qids), jnp.asarray(qvals)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_docs,max_len,b,t,k", [(300, 20, 4, 8, 5), (513, 9, 3, 5, 10)])
def test_pallas_topk_matches_ref(rng, n_docs, max_len, b, t, k):
    ids, vals = make_corpus(rng, n_docs=n_docs, vocab=500, max_len=max_len)
    qids, qvals = make_queries(rng, b=b, vocab=500, t=t)
    dense = np.asarray(
        sparse_scores_ref(
            jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(qids), jnp.asarray(qvals)
        )
    )
    got_s, got_i = sparse_topk_pallas(
        jnp.asarray(ids),
        jnp.asarray(vals),
        jnp.asarray(qids),
        jnp.asarray(qvals),
        k=k,
        tile_n=128,
        interpret=True,
    )
    got_s, got_i = np.asarray(got_s), np.asarray(got_i)
    order = np.argsort(-dense, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(got_i, order)
    np.testing.assert_allclose(
        got_s, np.take_along_axis(dense, order, axis=1), rtol=1e-5, atol=1e-5
    )


def test_dispatcher_cpu_path(rng):
    ids, vals = make_corpus(rng, n_docs=50, vocab=100, max_len=6)
    qids, qvals = make_queries(rng, b=2, vocab=100, t=4)
    s, i = sparse_topk(
        jnp.asarray(ids), jnp.asarray(vals), jnp.asarray(qids), jnp.asarray(qvals), k=3
    )
    assert s.shape == (2, 3) and i.shape == (2, 3)


# -- hashed-segment layout ----------------------------------------------------


def _random_ell(rng, n=300, el=17, vocab=500):
    ids = np.full((n, el), -1, np.int32)
    vals = np.zeros((n, el), np.float32)
    for d in range(n):
        nt = int(rng.integers(2, el))
        terms = rng.choice(vocab, nt, replace=False)
        ids[d, :nt] = terms
        vals[d, :nt] = rng.random(nt).astype(np.float32) * 2 - 0.5
    return ids, vals


def _random_queries(rng, b=10, t=9, vocab=500):
    qids = np.full((b, t), -2, np.int32)
    qvals = np.zeros((b, t), np.float32)
    for i in range(b):
        nt = int(rng.integers(1, t))
        qids[i, :nt] = rng.choice(vocab, nt, replace=False)
        qvals[i, :nt] = rng.integers(1, 4, nt)
    return qids, qvals


@pytest.mark.parametrize("n_segments", [4, 8, 16])
def test_hash_segments_partition_invariants(rng, n_segments):
    from persian_rag_tpu.ops.sparse_scores import hash_segments

    ids, vals = _random_ell(rng)
    ids3, vals3 = hash_segments(ids, vals, n_segments)
    assert ids3.shape[:2] == (ids.shape[0], n_segments)
    assert ids3.shape[2] % 8 == 0
    # every (tid, val) entry survives, in its hash segment
    for d in range(0, ids.shape[0], 37):
        orig = sorted(
            (int(t_), float(v)) for t_, v in zip(ids[d], vals[d]) if t_ >= 0
        )
        repacked = sorted(
            (int(t_), float(v))
            for g in range(n_segments)
            for t_, v in zip(ids3[d, g], vals3[d, g])
            if t_ >= 0
        )
        assert orig == repacked
        for g in range(n_segments):
            seg = ids3[d, g][ids3[d, g] >= 0]
            assert (seg % n_segments == g).all()


def test_hashed_kernel_matches_flat_reference(rng):
    from persian_rag_tpu.ops.sparse_scores import (
        hash_segments,
        sparse_scores_ref,
        sparse_topk,
        sparse_topk_hashed,
        sparse_topk_hashed_pallas,
    )

    ids, vals = _random_ell(rng, n=700, el=23)
    qids, qvals = _random_queries(rng, b=12)
    ids3, vals3 = hash_segments(ids, vals, 8)
    want_s, want_i = sparse_topk(
        jnp.asarray(ids), jnp.asarray(vals),
        jnp.asarray(qids), jnp.asarray(qvals), 8, use_pallas=False,
    )
    got_s, got_i = sparse_topk_hashed_pallas(
        jnp.asarray(ids3), jnp.asarray(vals3),
        jnp.asarray(qids), jnp.asarray(qvals), 8,
        tile_n=256, tile_b=8, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(want_s), rtol=1e-5, atol=1e-6
    )
    # dispatcher's non-pallas path
    ds, di = sparse_topk_hashed(
        jnp.asarray(ids3), jnp.asarray(vals3),
        jnp.asarray(qids), jnp.asarray(qvals), 8, use_pallas=False,
    )
    np.testing.assert_array_equal(np.asarray(di), np.asarray(want_i))


def test_hashed_kernel_tile_boundaries_and_negative_vals(rng):
    """N not a tile multiple + negative contributions (floored-idf BM25
    rows can be negative; pad columns must not win)."""
    from persian_rag_tpu.ops.sparse_scores import (
        hash_segments,
        sparse_topk,
        sparse_topk_hashed_pallas,
    )

    ids, vals = _random_ell(rng, n=391, el=11, vocab=60)
    vals = -np.abs(vals)  # all-negative scores
    qids, qvals = _random_queries(rng, b=5, t=5, vocab=60)
    ids3, vals3 = hash_segments(ids, vals, 4)
    want_s, want_i = sparse_topk(
        jnp.asarray(ids), jnp.asarray(vals),
        jnp.asarray(qids), jnp.asarray(qvals), 6, use_pallas=False,
    )
    got_s, got_i = sparse_topk_hashed_pallas(
        jnp.asarray(ids3), jnp.asarray(vals3),
        jnp.asarray(qids), jnp.asarray(qvals), 6,
        tile_n=128, tile_b=8, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


# -- union-slot (batch-deduplicated) kernel -----------------------------------


def test_union_prep_invariants(rng):
    import jax.numpy as jnp

    from persian_rag_tpu.ops.sparse_scores import union_prep

    qids, qvals = _random_queries(rng, b=13, t=9, vocab=40)
    u_ids, qw, n_chunks = (
        np.asarray(x)
        for x in union_prep(jnp.asarray(qids), jnp.asarray(qvals), 32)
    )
    flat_u = u_ids.reshape(-1)
    real = flat_u[flat_u >= 0]
    want_union = np.unique(qids[qids >= 0])
    np.testing.assert_array_equal(np.sort(real), want_union)
    # populated chunk count covers the union
    n_union = len(want_union)
    assert int(n_chunks) == -(-n_union // 32) if n_union else n_chunks == 0
    # qw reconstructs each query's per-term weight (duplicates sum)
    b = qids.shape[0]
    qw_bu = qw.transpose(1, 0, 2).reshape(b, -1)
    for bi in range(b):
        for u_slot, tid in enumerate(flat_u):
            if tid < 0:
                continue
            want = qvals[bi][qids[bi] == tid].sum()
            np.testing.assert_allclose(qw_bu[bi, u_slot], want, rtol=1e-6)


@pytest.mark.parametrize(
    "n_docs,max_len,b,t,k,vocab",
    [(300, 20, 4, 8, 5, 500), (513, 9, 12, 5, 10, 30), (130, 7, 9, 6, 7, 25)],
)
def test_union_topk_matches_ref(rng, n_docs, max_len, b, t, k, vocab):
    """Id + score parity vs the dense reference, including heavy term
    sharing across the batch (small vocab) and duplicate in-query
    terms (BM25 multiplicity sums into one union slot)."""
    from persian_rag_tpu.ops.sparse_scores import sparse_topk_union_pallas

    ids, vals = make_corpus(rng, n_docs=n_docs, vocab=vocab, max_len=max_len)
    qids = np.full((b, t), -1, np.int32)
    qvals = np.zeros((b, t), np.float32)
    for i in range(b):
        length = rng.integers(1, t + 1)
        qids[i, :length] = rng.choice(vocab, size=length, replace=True)
        qvals[i, :length] = rng.random(length).astype(np.float32)
    dense = np.asarray(
        sparse_scores_ref(
            jnp.asarray(ids), jnp.asarray(vals),
            jnp.asarray(qids), jnp.asarray(qvals),
        )
    )
    got_s, got_i = sparse_topk_union_pallas(
        jnp.asarray(ids), jnp.asarray(vals),
        jnp.asarray(qids), jnp.asarray(qvals),
        k=k, tile_n=128, u_chunk=32, interpret=True,
    )
    order = np.argsort(-dense, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(np.asarray(got_i), order)
    np.testing.assert_allclose(
        np.asarray(got_s), np.take_along_axis(dense, order, axis=1),
        rtol=1e-5, atol=1e-5,
    )


def test_union_negative_scores_and_tile_boundary(rng):
    """All-negative contributions (floored-idf BM25) with N not a tile
    multiple: padding columns must not reach the top-k."""
    from persian_rag_tpu.ops.sparse_scores import (
        sparse_topk,
        sparse_topk_union_pallas,
    )

    ids, vals = _random_ell(rng, n=391, el=11, vocab=60)
    vals = -np.abs(vals)
    qids, qvals = _random_queries(rng, b=5, t=5, vocab=60)
    want_s, want_i = sparse_topk(
        jnp.asarray(ids), jnp.asarray(vals),
        jnp.asarray(qids), jnp.asarray(qvals), 6, use_pallas=False,
    )
    got_s, got_i = sparse_topk_union_pallas(
        jnp.asarray(ids), jnp.asarray(vals),
        jnp.asarray(qids), jnp.asarray(qvals), 6,
        tile_n=128, u_chunk=32, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(want_s), rtol=1e-5, atol=1e-6
    )


def test_union_all_pad_queries(rng):
    """A batch whose queries have no valid terms: zero chunks run, all
    scores 0, ids are the lowest doc ids (stable tie order)."""
    from persian_rag_tpu.ops.sparse_scores import sparse_topk_union_pallas

    ids, vals = _random_ell(rng, n=50, el=5, vocab=30)
    qids = np.full((3, 4), -1, np.int32)
    qvals = np.zeros((3, 4), np.float32)
    s, i = sparse_topk_union_pallas(
        jnp.asarray(ids), jnp.asarray(vals),
        jnp.asarray(qids), jnp.asarray(qvals), 4,
        tile_n=128, u_chunk=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(s), 0.0)
    np.testing.assert_array_equal(
        np.asarray(i), np.tile(np.arange(4), (3, 1))
    )


def test_union_prep_hashed_invariants(rng):
    """Segment-grouped dedup: chunks are segment-homogeneous, the union
    covers exactly the batch's distinct ids, qw reconstructs per-query
    weights (duplicates sum), and chunk_seg maps populated chunks to
    the segment their terms hash to."""
    import jax.numpy as jnp

    from persian_rag_tpu.ops.sparse_scores import union_prep_hashed

    qids, qvals = _random_queries(rng, b=13, t=9, vocab=40)
    s_n, uc = 4, 16
    u_ids, qw, chunk_seg, n_chunks = (
        np.asarray(x)
        for x in union_prep_hashed(
            jnp.asarray(qids), jnp.asarray(qvals), uc, s_n
        )
    )
    flat_u = u_ids.reshape(-1)
    real = flat_u[flat_u >= 0]
    want_union = np.unique(qids[qids >= 0])
    np.testing.assert_array_equal(np.sort(real), np.sort(want_union))
    # segment homogeneity + chunk_seg correctness
    nc = int(n_chunks)
    for c in range(nc):
        chunk = u_ids[c].reshape(-1)
        chunk = chunk[chunk >= 0]
        if len(chunk):
            segs = np.unique(chunk % s_n)
            assert len(segs) == 1, (c, segs)
            assert segs[0] == chunk_seg[0, c], (c, segs, chunk_seg[0, c])
    # every real term sits in a populated chunk
    for c in range(nc, u_ids.shape[0]):
        assert (u_ids[c] < 0).all()
    # qw weights
    b = qids.shape[0]
    qw_bu = qw.transpose(1, 0, 2).reshape(b, -1)
    for bi in range(b):
        for u_slot, tid in enumerate(flat_u):
            if tid < 0:
                continue
            want = qvals[bi][qids[bi] == tid].sum()
            np.testing.assert_allclose(qw_bu[bi, u_slot], want, rtol=1e-6)


@pytest.mark.parametrize(
    "n_docs,max_len,b,t,k,vocab,s_n",
    [
        (300, 20, 4, 8, 5, 500, 4),
        (513, 9, 12, 5, 10, 30, 8),
        (130, 7, 9, 6, 7, 25, 2),
    ],
)
def test_union_hashed_topk_matches_ref(rng, n_docs, max_len, b, t, k,
                                       vocab, s_n):
    """Id + score parity vs the dense reference through the hashed-
    segment corpus layout x segment-grouped union chunks."""
    from persian_rag_tpu.ops.sparse_scores import (
        hash_segments,
        sparse_topk_union_hashed_pallas,
    )

    ids, vals = make_corpus(rng, n_docs=n_docs, vocab=vocab, max_len=max_len)
    ids3, vals3 = hash_segments(ids, vals, s_n)
    qids = np.full((b, t), -1, np.int32)
    qvals = np.zeros((b, t), np.float32)
    for i in range(b):
        length = rng.integers(1, t + 1)
        qids[i, :length] = rng.choice(vocab, size=length, replace=True)
        qvals[i, :length] = rng.random(length).astype(np.float32)
    dense = np.asarray(
        sparse_scores_ref(
            jnp.asarray(ids), jnp.asarray(vals),
            jnp.asarray(qids), jnp.asarray(qvals),
        )
    )
    got_s, got_i = sparse_topk_union_hashed_pallas(
        jnp.asarray(ids3), jnp.asarray(vals3),
        jnp.asarray(qids), jnp.asarray(qvals),
        k=k, tile_n=128, u_chunk=32, interpret=True,
    )
    order = np.argsort(-dense, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(np.asarray(got_i), order)
    np.testing.assert_allclose(
        np.asarray(got_s), np.take_along_axis(dense, order, axis=1),
        rtol=1e-5, atol=1e-5,
    )


def test_union_hashed_skewed_segments_and_all_pad(rng):
    """All of the batch's terms hash into ONE segment (worst-case
    imbalance: other segments get zero chunks), plus the all-pad
    batch (zero chunks run at all)."""
    from persian_rag_tpu.ops.sparse_scores import (
        hash_segments,
        sparse_topk_union_hashed_pallas,
    )

    s_n = 4
    vocab_ids = np.arange(3, 60, s_n, dtype=np.int32)  # all % s_n == 3
    ids = np.full((97, 6), -1, np.int32)
    vals = np.zeros((97, 6), np.float32)
    for r in range(97):
        ln = rng.integers(1, 7)
        ids[r, :ln] = rng.choice(vocab_ids, size=ln, replace=False)
        vals[r, :ln] = rng.random(ln).astype(np.float32)
    ids3, vals3 = hash_segments(ids, vals, s_n)
    qids = np.full((5, 4), -1, np.int32)
    qvals = np.zeros((5, 4), np.float32)
    for i in range(5):
        qids[i, : 2 + i % 3] = rng.choice(vocab_ids, size=2 + i % 3,
                                          replace=False)
        qvals[i, : 2 + i % 3] = rng.random(2 + i % 3).astype(np.float32)
    dense = np.asarray(
        sparse_scores_ref(
            jnp.asarray(ids), jnp.asarray(vals),
            jnp.asarray(qids), jnp.asarray(qvals),
        )
    )
    got_s, got_i = sparse_topk_union_hashed_pallas(
        jnp.asarray(ids3), jnp.asarray(vals3),
        jnp.asarray(qids), jnp.asarray(qvals),
        k=6, tile_n=128, u_chunk=16, interpret=True,
    )
    order = np.argsort(-dense, axis=1, kind="stable")[:, :6]
    np.testing.assert_array_equal(np.asarray(got_i), order)

    # all-pad batch
    qids0 = np.full((3, 4), -1, np.int32)
    qvals0 = np.zeros((3, 4), np.float32)
    s0, i0 = sparse_topk_union_hashed_pallas(
        jnp.asarray(ids3), jnp.asarray(vals3),
        jnp.asarray(qids0), jnp.asarray(qvals0), 4,
        tile_n=128, u_chunk=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(s0), 0.0)
    np.testing.assert_array_equal(
        np.asarray(i0), np.tile(np.arange(4), (3, 1))
    )


def test_tile_merge_duplicate_tie_order(rng):
    """tile_merge=True (the documented negative-result flag) must keep
    the lowest-id-first tie order across planted duplicate rows
    spanning corpus tiles — the carry-first (B, 2k) merge plus in-tile
    iota extraction."""
    import jax.numpy as jnp

    from persian_rag_tpu.ops.sparse_scores import (
        hash_segments,
        sparse_scores_ref,
        sparse_topk_union_hashed_pallas,
        sparse_topk_union_pallas,
    )

    n, l, vocab, b, t, k = 3000, 8, 200, 16, 6, 8
    ids = np.full((n, l), -1, np.int32)
    vals = np.zeros((n, l), np.float32)
    for d in range(n):
        nt = rng.integers(3, l + 1)
        tid = np.unique(rng.integers(0, vocab, nt * 2))[:nt].astype(
            np.int32
        )
        ids[d, : len(tid)] = tid
        vals[d, : len(tid)] = rng.uniform(0.5, 4.0, len(tid))
    # duplicate one row across several tiles (tile_n=896)
    for dst in (40, 950, 1800, 2700):
        ids[dst] = ids[7]
        vals[dst] = vals[7]
    qids = np.full((b, t), -1, np.int32)
    qvals = np.zeros((b, t), np.float32)
    qids[:, :3] = ids[7, :3]
    qvals[:, :3] = 1.0
    scores = np.asarray(sparse_scores_ref(
        jnp.asarray(ids), jnp.asarray(vals),
        jnp.asarray(qids), jnp.asarray(qvals),
    ))
    order = np.lexsort(
        (np.arange(n)[None, :].repeat(b, 0), -scores), axis=1
    )[:, :k]
    ids3, vals3 = hash_segments(ids, vals, 4)
    s1, i1 = sparse_topk_union_pallas(
        jnp.asarray(ids), jnp.asarray(vals),
        jnp.asarray(qids), jnp.asarray(qvals), k,
        interpret=True, tile_merge=True,
    )
    np.testing.assert_array_equal(np.asarray(i1), order)
    s2, i2 = sparse_topk_union_hashed_pallas(
        jnp.asarray(ids3), jnp.asarray(vals3),
        jnp.asarray(qids), jnp.asarray(qvals), k,
        interpret=True, tile_merge=True,
    )
    np.testing.assert_array_equal(np.asarray(i2), order)
