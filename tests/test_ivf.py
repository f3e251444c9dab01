"""IVF index: recall, full-probe exactness, overflow, persistence."""
import numpy as np
import pytest

from persian_rag_tpu.index.dense import DenseIndex
from persian_rag_tpu.index.ivf import IVFIndex, kmeans


def clustered_data(rng, n_clusters=20, per_cluster=50, d=32):
    centers = rng.standard_normal((n_clusters, d)) * 10
    rows = []
    for c in centers:
        rows.append(c + rng.standard_normal((per_cluster, d)))
    return np.concatenate(rows).astype(np.float32)


def test_kmeans_reduces_distortion(rng):
    import jax.numpy as jnp

    data = clustered_data(rng)
    c1 = kmeans(jnp.asarray(data), 20, iters=1, seed=0)
    c10 = kmeans(jnp.asarray(data), 20, iters=10, seed=0)

    def distortion(centroids):
        d2 = (
            (data**2).sum(1)[:, None]
            - 2 * data @ np.asarray(centroids).T
            + (np.asarray(centroids) ** 2).sum(1)[None]
        )
        return d2.min(axis=1).mean()

    assert distortion(c10) <= distortion(c1) + 1e-5


def test_full_probe_matches_flat(rng):
    data = clustered_data(rng, n_clusters=10, per_cluster=30)
    queries = rng.standard_normal((7, 32)).astype(np.float32)
    ivf = IVFIndex(32, n_cells=10, nprobe=10, metric="l2").build(data)
    flat = DenseIndex(32, metric="l2")
    flat.add(data)
    want_s, want_i = flat.search(queries, 5)
    got_s, got_i = ivf.search(queries, 5, nprobe=10)
    # probing every cell is an exact search
    assert all(set(got_i[q]) == set(want_i[q]) for q in range(7))
    np.testing.assert_allclose(
        np.sort(got_s, axis=1), np.sort(want_s, axis=1), rtol=1e-4, atol=1e-4
    )


def test_partial_probe_high_recall_on_clustered_data(rng):
    data = clustered_data(rng, n_clusters=20, per_cluster=50)
    # queries near cluster centers: nprobe=3 should be near-exact
    queries = data[rng.choice(len(data), 20)] + 0.01
    ivf = IVFIndex(32, n_cells=20, nprobe=3, metric="l2").build(data)
    flat = DenseIndex(32, metric="l2")
    flat.add(data)
    _, want = flat.search(queries, 5)
    _, got = ivf.search(queries, 5)
    recall = np.mean(
        [len(set(got[q]) & set(want[q])) / 5 for q in range(len(queries))]
    )
    assert recall >= 0.9, recall


def test_overflow_rows_never_lost(rng):
    data = rng.standard_normal((100, 16)).astype(np.float32)
    # cap=2 forces heavy overflow
    ivf = IVFIndex(16, n_cells=5, nprobe=5, cell_cap=2).build(data)
    flat = DenseIndex(16, metric="l2")
    flat.add(data)
    queries = data[:5] + 0.001
    _, want = flat.search(queries, 3)
    _, got = ivf.search(queries, 3, nprobe=5)
    # full probe + overflow block == exact despite tiny cells
    assert all(set(got[q]) == set(want[q]) for q in range(5))


def test_cosine_metric(rng):
    data = rng.standard_normal((200, 16)).astype(np.float32)
    ivf = IVFIndex(16, n_cells=8, nprobe=8, metric="cosine").build(data)
    q = data[3:4]
    scores, ids = ivf.search(q, 1)
    assert ids[0, 0] == 3
    np.testing.assert_allclose(scores[0, 0], 1.0, rtol=1e-4)


def test_save_load(tmp_path, rng):
    data = rng.standard_normal((150, 16)).astype(np.float32)
    ivf = IVFIndex(16, n_cells=6, nprobe=3).build(data)
    ivf.save(str(tmp_path / "ivf"))
    loaded = IVFIndex.load(str(tmp_path / "ivf"))
    q = rng.standard_normal((4, 16)).astype(np.float32)
    s1, i1 = ivf.search(q, 5)
    s2, i2 = loaded.search(q, 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_auto_cap_cost_optimal_on_imbalanced_cells(rng):
    """The auto cell capacity minimizes nprobe*cap + overflow over the
    observed occupancies: imbalanced (clustered) occupancies must NOT
    pad every cell to the max (measured 2.5x wasted scan on real
    geometry), while balanced occupancies degenerate to ~max (zero
    overflow). Searches stay exact-at-full-probe regardless (overflow
    rows are always scanned)."""
    index = IVFIndex(8, n_cells=4, nprobe=1, metric="l2")
    skewed = np.array([800, 10, 10, 10])
    cap = index._auto_cap(skewed)
    # optimum: cap=10 costs 1*10 + 790 overflow = 800; cap=800 costs 800
    # -> any cap is 800-ish here, but nprobe=2 breaks the tie clearly
    index.nprobe = 2
    cap = index._auto_cap(skewed)
    assert cap == 10, cap  # 2*10+790=810 < 2*800+0=1600
    balanced = np.array([100, 99, 101, 100])
    # ~max occupancy (cap=100 + 1 overflow row costs 201, beating
    # cap=101's 202 at nprobe=2 — the optimum is near-max, not max)
    assert index._auto_cap(balanced) >= 100

    # end-to-end: a skewed corpus with auto-cap still returns exact
    # results at full probe (overflow block is always scanned)
    data = np.concatenate([
        rng.standard_normal((400, 16)) * 0.1,        # one dense blob
        rng.standard_normal((40, 16)) * 0.1 + 20.0,  # far small blob
    ]).astype(np.float32)
    index = IVFIndex(16, n_cells=8, nprobe=8, metric="l2")
    index.build(data, train_iters=5)
    flat = DenseIndex(16, metric="l2")
    flat.add(data)
    flat.commit()
    q = data[rng.integers(0, len(data), 16)] + 0.01 * rng.standard_normal(
        (16, 16)
    ).astype(np.float32)
    _, ids_ivf = index.search(q, 5)
    _, ids_flat = flat.search(q, 5)
    np.testing.assert_array_equal(ids_ivf, ids_flat)
