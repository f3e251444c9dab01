"""Golden tests for the metric suite (reference formulas, hand-computed)."""
import pytest
import math

import numpy as np

from persian_rag_tpu.eval.metrics import (
    TextMetrics,
    hit_at_k,
    mrr_at_k,
    recall_at_k,
)

m = TextMetrics()


def test_clean_text_folds_digits_and_punct():
    assert m.clean_text("سال ۱۴۰۲ بود!") == "سال 1402 بود"
    assert m.clean_text("Hello, World!") == "hello world"
    assert m.clean_text("") == ""


def test_tokenize_filters_stopwords_and_short():
    tokens = m.tokenize("این دارو از بیماری خوب است")
    assert "این" not in tokens and "از" not in tokens
    assert "دارو" in tokens and "بیماری" in tokens


def test_exact_match():
    assert m.exact_match("پاسخ درست", "پاسخ درست.") == 1.0
    assert m.exact_match("پاسخ غلط", "پاسخ درست") == 0.0


def test_f1_hand_computed():
    # pred tokens {aa bb cc}, gold {bb cc dd}: common 2
    pred, gold = "aa bb cc", "bb cc dd"
    p, r = 2 / 3, 2 / 3
    want = 2 * p * r / (p + r)
    assert abs(m.f1_score(pred, gold) - want) < 1e-9
    assert abs(m.precision(pred, gold) - p) < 1e-9
    assert abs(m.recall(pred, gold) - r) < 1e-9


def test_f1_empty_both_is_one():
    assert m.f1_score("", "") == 1.0
    assert m.f1_score("aa", "") == 0.0


def test_bleu_perfect_match():
    text = "aa bb cc dd ee"
    assert abs(m.bleu_score(text, text) - 1.0) < 1e-9


def test_bleu_hand_computed_unigram_only():
    # pred "aa" (1 token): only 1-gram precision = 1.0 -> bleu 1 * bp
    # bp = exp(1 - 3/1) = exp(-2)
    got = m.bleu_score("aa", "aa bb cc")
    assert abs(got - math.exp(-2)) < 1e-9


def test_rouge_l_hand_computed():
    # pred: aa bb cc ; gold: aa cc  -> LCS = 2
    # P = 2/3, R = 2/2 -> F1 = 2*2/3*1/(2/3+1) = 0.8
    assert abs(m.rouge_l("aa bb cc", "aa cc") - 0.8) < 1e-9


def test_lcs_length():
    assert m.lcs_length(list("abcde"), list("ace")) == 3
    assert m.lcs_length([], list("ace")) == 0


def test_context_precision_recall():
    retrieved = ["aa bb cc dd", "zz yy xx ww"]
    relevant = ["aa bb cc dd"]
    assert m.context_precision(retrieved, relevant) == 0.5
    assert m.context_recall(retrieved, relevant) == 1.0
    assert m.context_recall(retrieved, []) == 1.0
    assert m.context_precision([], relevant) == 0.0


def test_is_similar_context_jaccard_threshold():
    # 3 common of 4 union = 0.75 >= 0.7
    assert m.is_similar_context("aa bb cc", "aa bb cc dd")
    # 2 of 4 = 0.5 < 0.7
    assert not m.is_similar_context("aa bb cc", "aa bb dd ee")


@pytest.mark.slow
def test_semantic_similarity_batch_matches_pairwise():
    from persian_rag_tpu.models.encoder import EncoderConfig
    from persian_rag_tpu.models.sentence_encoder import SentenceEncoder
    from persian_rag_tpu.models.tokenizer import HashTokenizer

    enc = SentenceEncoder(
        EncoderConfig(
            vocab_size=256, hidden_size=16, num_layers=1, num_heads=2,
            intermediate_size=32, max_position_embeddings=32,
        ),
        tokenizer=HashTokenizer(256),
    )
    preds = ["دارو خوب است", "قلب سالم", ""]
    golds = ["دارو عالی است", "قلب قوی", "x"]
    batch = m.semantic_similarity_batch(preds, golds, enc)
    for i in range(3):
        single = m.semantic_similarity(preds[i], golds[i], enc)
        assert abs(batch[i] - single) < 1e-5
    assert batch[2] == 0.0  # empty pred
    assert (batch >= 0).all() and (batch <= 1).all()


def test_rank_metrics():
    assert hit_at_k(["a", "b", "c"], ["c"], 3) == 1.0
    assert hit_at_k(["a", "b", "c"], ["c"], 2) == 0.0
    assert mrr_at_k(["a", "b", "c"], ["b"]) == 0.5
    assert mrr_at_k(["a"], ["z"]) == 0.0
    assert recall_at_k(["a", "b"], ["a", "z"], 2) == 0.5
