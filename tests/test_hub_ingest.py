"""Offline exercise of the HuggingFace-hub ingest path.

The reference's DataLoader consumes hub datasets with these schemas
(reference: src/data_loader.py:20-40, record extraction :80-120):

* Gholamreza/pquad — SQuAD-style: question / context /
  answers={"text": [...], "answer_start": [...]}
* SajjadAyoubi/persian_qa — consumed via item.get('answer', '')
  (src/data_loader.py:107-117)

No network exists in CI, but the `datasets` library does — so these
tests build real in-memory ``datasets.DatasetDict`` objects with the
hub schemas and drive the ACTUAL ingest path (load_datasets ->
prepare_qa_data_for_training -> create_test_split ->
save_processed_data), not the synthetic fallback. The env-gated test in
test_real_assets.py still covers the true hub download when a cache
exists; this file pins the record-extraction behavior offline.
"""
import os

import pandas as pd
import pytest

datasets = pytest.importorskip("datasets")

from persian_rag_tpu.data.loader import DataLoader


def _pquad_like():
    """SQuAD-style DatasetDict matching Gholamreza/pquad's schema."""
    rows = {
        "id": ["q1", "q2", "q3", "q4"],
        "title": ["دارو"] * 4,
        "question": [
            # normal record — survives the filters
            "کاربرد   آسپرین در پزشکی چیست؟",  # double space: normalizer food
            # question too short (<= 10 chars after normalization)
            "چیست؟",
            # no answer text -> dropped (src/data_loader.py:93-96)
            "عوارض جانبی انسولین کدام است؟",
            # answer too short (<= 5 chars)
            "دوز مصرفی ویتامین چقدر است؟",
        ],
        "context": [
            "آسپرین برای کاهش درد و التهاب استفاده می شود.",
            "متن زمینه.",
            "انسولین قند خون را تنظیم می کند.",
            "ویتامین ها مفید هستند.",
        ],
        "answers": [
            {"text": ["کاهش درد و التهاب"], "answer_start": [11]},
            {"text": ["پاسخ معتبر طولانی"], "answer_start": [0]},
            {"text": [], "answer_start": []},
            {"text": ["کم"], "answer_start": [0]},
        ],
    }
    return datasets.DatasetDict(
        {"train": datasets.Dataset.from_dict(rows)}
    )


def _persian_qa_like():
    rows = {
        "question": [
            "آنتی بیوتیک چه زمانی تجویز می شود؟",
            "کوتاه؟",  # filtered: question <= 10
        ],
        "answer": [
            "برای مقابله با عفونت باکتریایی",
            "پاسخ بلند اما سوال کوتاه است",
        ],
    }
    return datasets.DatasetDict(
        {"train": datasets.Dataset.from_dict(rows)}
    )


def test_load_datasets_via_hub_api(monkeypatch):
    """DataLoader.load_datasets() itself runs against a patched hub."""
    fixtures = {
        "Gholamreza/pquad": _pquad_like(),
        "SajjadAyoubi/persian_qa": _persian_qa_like(),
    }

    def fake_load_dataset(name, **kwargs):
        return fixtures[name]

    monkeypatch.setattr(datasets, "load_dataset", fake_load_dataset)
    pquad, persian_qa = DataLoader().load_datasets()
    assert pquad is fixtures["Gholamreza/pquad"]
    assert persian_qa is fixtures["SajjadAyoubi/persian_qa"]


def test_prepare_qa_records_from_hub_schemas(tmp_path):
    loader = DataLoader()
    records = loader.prepare_qa_data_for_training(
        _pquad_like(), _persian_qa_like(), synthetic_fallback=False
    )
    # pquad: only q1 survives (q2 short question, q3 empty answers,
    # q4 short answer); persian_qa: only the first row
    assert len(records) == 2
    by_source = {r["source"]: r for r in records}
    assert set(by_source) == {"pquad", "persian_qa"}

    pq = by_source["pquad"]
    # answers["text"][0] extraction + whitespace normalization applied
    assert pq["answer"] == "کاهش درد و التهاب"
    assert "  " not in pq["question"]
    assert pq["context"].startswith("آسپرین")

    sq = by_source["persian_qa"]
    assert sq["answer"] == "برای مقابله با عفونت باکتریایی"
    assert sq["context"] == ""  # reference stores no context for this set

    # split + CSV persistence on the same records
    train, test = loader.create_test_split(records, test_size=0.5)
    assert len(train) == 1 and len(test) == 1
    path = loader.save_processed_data(
        records, "hub_ingest.csv", directory=str(tmp_path)
    )
    assert os.path.exists(path)
    df = pd.read_csv(path)
    assert len(df) == 2
    assert set(df.columns) == {"question", "context", "answer", "source"}


def test_empty_hub_result_falls_back_to_synthetic():
    loader = DataLoader()
    empty = datasets.DatasetDict(
        {
            "train": datasets.Dataset.from_dict(
                {"question": [], "context": [], "answers": []}
            )
        }
    )
    records = loader.prepare_qa_data_for_training(empty, None)
    assert len(records) > 100  # synthetic fallback engaged
    assert all(r["source"] == "synthetic" for r in records)
