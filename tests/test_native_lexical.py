"""Native C++ lexical builder parity: bit-identical to the Python path."""
import numpy as np
import pytest

from persian_rag_tpu import native
from persian_rag_tpu.index.lexical import BM25Index

CORPUS = [
    "دارو برای درمان بیماری استفاده می شود",
    "این دارو عوارض جانبی کمی دارد",
    "بیماری قلبی نیاز به درمان فوری دارد",
    "the quick brown fox jumps over the lazy dog",
    "mixed زبان corpus with دارو tokens",
    "",  # empty doc
    "dup dup dup words words",
]

needs_native = pytest.mark.skipif(
    not native.available(), reason="g++/native lib unavailable"
)


@needs_native
def test_native_build_matches_python_exactly():
    py = BM25Index()._build_python(CORPUS)
    nat = BM25Index().build(CORPUS, use_native=True)

    assert nat.vocab == py.vocab
    assert abs(nat._avgdl - py._avgdl) < 1e-9
    for term, value in py.idf.items():
        assert abs(nat.idf[term] - value) < 1e-9, term
    assert nat.doc_ids.shape == py.doc_ids.shape
    np.testing.assert_array_equal(nat.doc_ids, py.doc_ids)
    np.testing.assert_allclose(nat.doc_vals, py.doc_vals, rtol=1e-6, atol=1e-7)

    for query in ("دارو درمان", "quick fox", "dup words", "نامربوط"):
        np.testing.assert_allclose(
            nat.get_scores(query), py.get_scores(query), rtol=1e-5, atol=1e-6
        )


@needs_native
def test_native_build_larger_random_corpus(rng):
    vocab = [f"tok{i}" for i in range(500)]
    corpus = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 40)))
        for _ in range(300)
    ]
    py = BM25Index()._build_python(corpus)
    nat = BM25Index().build(corpus, use_native=True)
    # mixed doc lengths bucket the ELL; compare bucket-by-bucket
    assert (py._buckets is None) == (nat._buckets is None)
    if py._buckets is None:
        np.testing.assert_array_equal(nat.doc_ids, py.doc_ids)
        np.testing.assert_allclose(
            nat.doc_vals, py.doc_vals, rtol=1e-6, atol=1e-7
        )
    else:
        assert len(nat._buckets) == len(py._buckets)
        for nb, pb in zip(nat._buckets, py._buckets):
            np.testing.assert_array_equal(nb.gids, pb.gids)
            np.testing.assert_array_equal(nb.ids, pb.ids)
            np.testing.assert_allclose(
                nb.vals, pb.vals, rtol=1e-6, atol=1e-7
            )
    q = " ".join(rng.choice(vocab, size=5))
    np.testing.assert_allclose(
        nat.get_scores(q), py.get_scores(q), rtol=1e-5, atol=1e-6
    )


def test_python_fallback_when_native_disabled():
    index = BM25Index().build(CORPUS, use_native=False)
    assert index.ntotal == len(CORPUS)
    assert index.get_scores("دارو").shape == (len(CORPUS),)
