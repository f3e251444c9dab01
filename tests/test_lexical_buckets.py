"""Doc-length-bucketed ELL: identical scores/ranking to the flat layout,
without letting one long document inflate the whole matrix."""
import numpy as np
import pytest

from persian_rag_tpu.core.mesh import build_mesh
from persian_rag_tpu.index.lexical import BM25Index, TfidfIndex

from tests.test_lexical import rank_bm25_reference


def _mixed_corpus():
    vocab = [f"w{i}" for i in range(600)]
    docs = [" ".join(vocab[i : i + 9]) for i in range(0, 120, 4)]  # short
    docs.append(" ".join(vocab[:500]))  # one long doc -> its own bucket
    docs.append(" ".join(vocab[100:350]))  # medium bucket
    return docs


def test_bucketed_storage_created_and_compact():
    docs = _mixed_corpus()
    index = BM25Index().build(docs, use_native=False)
    assert index._buckets is not None and len(index._buckets) >= 2
    assert index.ntotal == len(docs)
    total_cells = sum(b.ids.size for b in index._buckets)
    flat_cells = len(docs) * 512  # width forced by the 500-term doc
    assert total_cells < flat_cells / 3


@pytest.mark.parametrize("use_native", [False, None])
def test_bucketed_bm25_scores_match_reference(use_native):
    docs = _mixed_corpus()
    index = BM25Index().build(docs, use_native=use_native)
    for q in ["w3 w7 w120", "w499", " ".join(f"w{i}" for i in range(150))]:
        want = rank_bm25_reference([d.split() for d in docs], q.split())
        got = index.get_scores(q)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        s, i = index.search([q], k=5)
        order = np.lexsort((np.arange(len(want)), -want))[:5]
        np.testing.assert_array_equal(i[0], order)
        np.testing.assert_allclose(s[0], want[order], rtol=1e-5, atol=1e-6)


def test_bucketed_tfidf_matches_flat():
    docs = _mixed_corpus()
    index = TfidfIndex(max_features=None, ngram_range=(1, 1)).build(docs)
    assert index._buckets is not None
    q = "w10 w11 w200 w499"
    dense = index.get_scores(q)
    s, i = index.search([q], k=4)
    order = np.lexsort((np.arange(len(dense)), -dense))[:4]
    np.testing.assert_array_equal(i[0], order)


def test_bucketed_save_load(tmp_path):
    docs = _mixed_corpus()
    index = BM25Index().build(docs, use_native=False)
    index.save(str(tmp_path / "bm25b"))
    loaded = BM25Index.load(str(tmp_path / "bm25b"))
    assert loaded._buckets is not None
    q = "w3 w200 w499"
    np.testing.assert_allclose(loaded.get_scores(q), index.get_scores(q))
    s0, i0 = index.search([q], k=4)
    s1, i1 = loaded.search([q], k=4)
    np.testing.assert_array_equal(i0, i1)


def test_bucketed_sharded_matches_single_device():
    docs = _mixed_corpus()
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    flat = BM25Index().build(docs, use_native=False)
    sharded = BM25Index(mesh=mesh).build(docs, use_native=False)
    q = "w3 w7 w120 w499"
    s0, i0 = flat.search([q], k=6)
    s1, i1 = sharded.search([q], k=6)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-5)


def test_hashed_device_layout_engages_and_matches_dense():
    """Wide-ELL buckets adopt the (N, S, Ls) hashed device layout on a
    single chip; search results stay identical to the dense argsort."""
    from persian_rag_tpu.index.lexical import BM25Index, _HASH_MIN_L

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(900)]
    # realistic chunk-scale docs: ~90 unique terms (the reference's
    # 150-word chunks land at L~110-160; the hashed gate needs L>=64)
    docs = [
        " ".join(rng.choice(vocab, size=90, replace=False))
        for _ in range(150)
    ]
    index = BM25Index().build(docs, use_native=False)
    buckets = index._buckets
    arrays = (
        [b.dev_ids for b in buckets] if buckets else [index._dev_ids]
    )
    assert any(a.ndim == 3 for a in arrays), "hashed layout not engaged"

    query = " ".join(vocab[:12])
    dense = index.get_scores(query)
    scores, ids = index.search([query], k=7)
    want = np.lexsort((np.arange(len(dense)), -dense))[:7]
    np.testing.assert_array_equal(ids[0], want)
    np.testing.assert_allclose(scores[0], dense[want], rtol=1e-5)
