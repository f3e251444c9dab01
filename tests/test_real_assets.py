"""Env-gated integration tests for real pretrained assets.

These light up automatically when real checkpoints / dataset caches are
present and skip cleanly offline (no network in CI):

* PERSIAN_RAG_ST_DIR — a local sentence-transformers model directory
  (e.g. paraphrase-multilingual-MiniLM-L12-v2, the reference's model at
  src/retrieval.py:27). The test loads it through hf_loader +
  HFTokenizer, encodes real Persian text, and cross-checks the
  embeddings against the torch transformers implementation.
* PERSIAN_RAG_HF_DATASETS — set (or a populated default HF datasets
  cache) enables the pquad/persian_qa ingestion path
  (reference: src/data_loader.py:20-40).

Drop-in instructions live in README.md ("Real pretrained assets").
"""
import os

import numpy as np
import pytest


def _st_dir():
    path = os.environ.get("PERSIAN_RAG_ST_DIR", "")
    if path and os.path.isdir(path) and os.path.exists(
        os.path.join(path, "config.json")
    ):
        return path
    return None


def _hf_cache_populated():
    if os.environ.get("PERSIAN_RAG_HF_DATASETS"):
        return True
    cache = os.path.expanduser(
        os.environ.get("HF_DATASETS_CACHE", "~/.cache/huggingface/datasets")
    )
    for name in ("Gholamreza___pquad", "SajjadAyoubi___persian_qa"):
        if os.path.isdir(os.path.join(cache, name)):
            return True
    return False


@pytest.mark.skipif(
    _st_dir() is None,
    reason="set PERSIAN_RAG_ST_DIR to a local sentence-transformers dir",
)
def test_real_checkpoint_encodes_and_matches_torch():
    import torch
    import transformers

    from persian_rag_tpu.models.sentence_encoder import SentenceEncoder

    model_dir = _st_dir()
    enc = SentenceEncoder.from_pretrained(model_dir)
    texts = [
        "دارو برای درمان بیماری استفاده می شود",
        "مصرف دارو باید طبق دستور پزشک باشد",
        "هوا امروز آفتابی است",
    ]
    ours = enc.encode(texts)
    assert ours.shape[0] == 3 and np.isfinite(ours).all()
    # ranking sanity: the two drug sentences are mutually closer than
    # either is to the weather sentence
    sim = lambda a, b: float(
        a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    )
    assert sim(ours[0], ours[1]) > sim(ours[0], ours[2])

    # numerical cross-check against torch transformers (mean pooling)
    tok = transformers.AutoTokenizer.from_pretrained(model_dir)
    model = transformers.AutoModel.from_pretrained(model_dir)
    model.eval()
    with torch.no_grad():
        batch = tok(
            texts, padding=True, truncation=True, max_length=enc.max_seq_len,
            return_tensors="pt",
        )
        out = model(**batch).last_hidden_state
        mask = batch["attention_mask"].unsqueeze(-1).float()
        theirs = (out * mask).sum(1) / mask.sum(1)
        theirs = theirs.numpy()
    # compare cosine of per-text embeddings (pooling/projection config
    # differences aside, the backbone must agree)
    if theirs.shape[1] == ours.shape[1]:
        for i in range(3):
            cos = sim(ours[i], theirs[i])
            assert cos > 0.98, (i, cos)


@pytest.mark.skipif(
    not _hf_cache_populated(),
    reason="no HF datasets cache for pquad/persian_qa "
    "(set PERSIAN_RAG_HF_DATASETS or populate HF_DATASETS_CACHE)",
)
def test_real_datasets_ingest():
    from persian_rag_tpu.data.loader import DataLoader

    loader = DataLoader()
    pquad, persian_qa = loader.load_datasets()
    assert pquad is not None or persian_qa is not None
    records = loader.prepare_qa_data_for_training(
        pquad, persian_qa, synthetic_fallback=False
    )
    assert len(records) > 1000
    sample = records[0]
    assert {"question", "context", "answer", "source"} <= set(sample)
    assert len(sample["question"]) > 10 and len(sample["answer"]) > 5
