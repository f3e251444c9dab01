"""Direct behavioral parity against the reference's own code.

The reference source at /root/reference is pure Python; its heavy
dependencies (faiss, rank_bm25, sentence_transformers, hazm, datasets,
PyPDF2) are stubbed so the string-math and chunking logic import and run
as-is. Every metric and every chunk boundary must match our rebuild
exactly on the same inputs.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

REFERENCE_SRC = "/root/reference/src"


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for key, value in attrs.items():
        setattr(mod, key, value)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def reference():
    """Import /root/reference/src as a package with stubbed deps."""
    saved = dict(sys.modules)

    class _Anything:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            return self

        def __getattr__(self, item):
            return _Anything()

    _stub_module("faiss", read_index=_Anything(), IndexFlatL2=_Anything)
    _stub_module("rank_bm25", BM25Okapi=_Anything)
    _stub_module(
        "sentence_transformers",
        SentenceTransformer=_Anything,
        InputExample=_Anything,
        losses=_Anything(),
    )
    _stub_module("sentence_transformers.evaluation",
                 EmbeddingSimilarityEvaluator=_Anything)
    # torch itself is installed (CPU build) — no stub needed

    # hazm stub that always fails -> the reference falls back to its own
    # regex/simple-split paths (src/chunking.py:94-97, :139-140)
    class _FailingTokenizer:
        def __init__(self, *a, **k):
            pass

        def tokenize(self, text):
            raise RuntimeError("hazm unavailable")

    class _IdentityNormalizer:
        def normalize(self, text):
            return text

    _stub_module(
        "hazm",
        Normalizer=_IdentityNormalizer,
        WordTokenizer=_FailingTokenizer,
        SentenceTokenizer=_FailingTokenizer,
    )

    package = types.ModuleType("refsrc")
    package.__path__ = [REFERENCE_SRC]
    sys.modules["refsrc"] = package

    def load(name):
        spec = importlib.util.spec_from_file_location(
            f"refsrc.{name}", f"{REFERENCE_SRC}/{name}.py"
        )
        module = importlib.util.module_from_spec(spec)
        sys.modules[f"refsrc.{name}"] = module
        spec.loader.exec_module(module)
        return module

    load("utils")
    load("llama_client")
    load("retrieval")
    modules = {
        "evaluation": load("evaluation"),
        "chunking": load("chunking"),
        "llama_client": sys.modules["refsrc.llama_client"],
    }
    yield modules
    sys.modules.clear()
    sys.modules.update(saved)


PAIRS = [
    ("دارو برای درمان بیماری استفاده می شود", "دارو برای درمان استفاده می شود"),
    ("پاسخ درست است", "پاسخ درست است"),
    ("سال ۱۴۰۲ بود!", "سال 1402 بود"),
    ("", "غیر خالی"),
    ("یک دو سه چهار پنج شش", "سه چهار پنج یک"),
    ("the quick brown fox", "quick brown dog jumps"),
    ("tokens aa bb cc dd ee ff gg", "aa cc ee gg"),
    ("در از به با که", "این آن تا بر"),  # all stopwords
]


def test_string_metrics_match_reference(reference):
    ref = reference["evaluation"].RAGEvaluator.__new__(
        reference["evaluation"].RAGEvaluator
    )
    from persian_rag_tpu.eval.metrics import TextMetrics

    ours = TextMetrics()
    for pred, gold in PAIRS:
        assert ref._clean_text(pred) == ours.clean_text(pred), pred
        assert ref._tokenize(pred) == ours.tokenize(pred), pred
        assert ref.exact_match(pred, gold) == ours.exact_match(pred, gold)
        np.testing.assert_allclose(
            ref.f1_score(pred, gold), ours.f1_score(pred, gold), atol=1e-12
        )
        np.testing.assert_allclose(
            ref.precision(pred, gold), ours.precision(pred, gold), atol=1e-12
        )
        np.testing.assert_allclose(
            ref.recall(pred, gold), ours.recall(pred, gold), atol=1e-12
        )
        np.testing.assert_allclose(
            ref.bleu_score(pred, gold), ours.bleu_score(pred, gold), atol=1e-9
        )
        np.testing.assert_allclose(
            ref.rouge_l(pred, gold), ours.rouge_l(pred, gold), atol=1e-12
        )


def test_context_metrics_match_reference(reference):
    ref = reference["evaluation"].RAGEvaluator.__new__(
        reference["evaluation"].RAGEvaluator
    )
    from persian_rag_tpu.eval.metrics import TextMetrics

    ours = TextMetrics()
    retrieved = [
        "دارو برای درمان بیماری استفاده می شود",
        "متن کاملا نامربوط درباره هوا",
    ]
    relevant = ["دارو برای درمان بیماری مفید استفاده می شود"]
    assert ref.context_precision(retrieved, relevant) == ours.context_precision(
        retrieved, relevant
    )
    assert ref.context_recall(retrieved, relevant) == ours.context_recall(
        retrieved, relevant
    )
    for a, b in PAIRS:
        assert ref._is_similar_context(a, b) == ours.is_similar_context(a, b)


def test_lcs_matches_reference(reference):
    ref = reference["evaluation"].RAGEvaluator.__new__(
        reference["evaluation"].RAGEvaluator
    )
    from persian_rag_tpu.eval.metrics import TextMetrics

    rng = np.random.default_rng(0)
    for _ in range(20):
        a = [str(x) for x in rng.integers(0, 5, rng.integers(0, 12))]
        b = [str(x) for x in rng.integers(0, 5, rng.integers(0, 12))]
        assert ref._lcs_length(a, b) == TextMetrics.lcs_length(a, b)


def test_rag_prompt_matches_reference(reference):
    ref_client = reference["llama_client"].LlamaClient.__new__(
        reference["llama_client"].LlamaClient
    )
    from persian_rag_tpu.gen.client import LlamaClient

    ours = LlamaClient.__new__(LlamaClient)
    question = "دارو چیست؟"
    contexts = ["متن اول درباره دارو", "متن دوم درباره درمان", "س" * 3000]
    assert ref_client.create_rag_prompt(
        question, contexts
    ) == ours.create_rag_prompt(question, contexts)


def test_clean_prediction_matches_reference(reference):
    ref_client = reference["llama_client"].LlamaClient.__new__(
        reference["llama_client"].LlamaClient
    )
    from persian_rag_tpu.gen.client import LlamaClient

    ours = LlamaClient.__new__(LlamaClient)
    cases = [
        "<|eot_id|> پاسخ: دارو ماده درمانی است.",
        "user گفت assistant پاسخ داد",
        "بر اساس اطلاعات ارائه شده، دارو مفید است.",
        "جمله اول. " + "کلمه " * 40 + ".",
        "",
        "short",
    ]
    for text in cases:
        assert ref_client.clean_prediction(text) == ours.clean_prediction(
            text
        ), text


def test_word_chunking_matches_reference(reference):
    """With hazm stubbed to fail, the reference uses simple split; on
    pre-normalized ASCII-spaced text both chunkers must produce identical
    boundaries, ids and texts."""
    config = {
        "chunking": {
            "word_chunk_size": 25,
            "word_overlap": 7,
            "sentences_per_chunk": 3,
        }
    }
    ref_chunker = reference["chunking"].TextChunker(config)
    from persian_rag_tpu.text.chunking import TextChunker

    our_chunker = TextChunker(config)
    text = " ".join(f"word{i}" for i in range(500))
    ref_chunks = ref_chunker.word_based_chunking(text)
    our_chunks = our_chunker.word_based_chunking(text)
    assert len(ref_chunks) == len(our_chunks)
    for r, o in zip(ref_chunks, our_chunks):
        assert r["id"] == o["id"]
        assert r["text"] == o["text"]
        assert r["num_words"] == o["num_words"]
        assert r["overlap_words"] == o["overlap_words"]


def test_sentence_chunking_matches_reference(reference):
    config = {
        "chunking": {
            "word_chunk_size": 25,
            "word_overlap": 7,
            "sentences_per_chunk": 2,
        }
    }
    ref_chunker = reference["chunking"].TextChunker(config)
    from persian_rag_tpu.text.chunking import TextChunker

    # hazm is absent in this environment, so the reference code runs its
    # '.'-split fallback (src/chunking.py:139-140); sentence_split_mode=
    # "simple" reproduces that path byte-for-byte (texts compared EXACTLY,
    # including the re-appended trailing '.').
    our_chunker = TextChunker(config, sentence_split_mode="simple")
    text = "sentence one is here. sentence two is here. sentence three. four. five. six"
    ref_chunks = ref_chunker.sentence_based_chunking(text)
    our_chunks = our_chunker.sentence_based_chunking(text)

    assert [c["text"] for c in ref_chunks] == [
        c["text"] for c in our_chunks
    ]
    assert [c["id"] for c in ref_chunks] == [c["id"] for c in our_chunks]
    assert [c["num_sentences"] for c in ref_chunks] == [
        c["num_sentences"] for c in our_chunks
    ]
    # default mode keeps the hazm-equivalent tokenizer: same chunking,
    # terminators preserved (matches the reference running WITH hazm)
    auto_chunks = TextChunker(config).sentence_based_chunking(text)
    assert [c["text"].rstrip(".") for c in auto_chunks] == [
        c["text"].rstrip(".") for c in ref_chunks
    ]
