"""create_embeddings pipeline: discovery, idempotent skip, verify; collections."""
import os

import numpy as np
import pytest

from persian_rag_tpu.core.config import Config
from persian_rag_tpu.index.collections import Collection, CollectionStore
from persian_rag_tpu.pipelines import create_embeddings, phase3


@pytest.fixture
def config(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = Config()
    cfg.models = ["tiny-model"]
    cfg.chunking.word_chunk_size = 30
    cfg.chunking.word_overlap = 5
    return cfg


@pytest.mark.slow
def test_build_skip_and_verify(config):
    phase3.main(config, tiny=True)  # produce chunk CSVs
    results = create_embeddings.main(config, tiny=True)
    per_model = results["models"]["tiny-model"]
    assert not per_model["word"]["skipped"]
    assert per_model["word"]["num_vectors"] > 0
    assert per_model["word"]["docs_per_sec"] > 0
    assert os.path.exists(per_model["word"]["path"] + ".index")  # faiss export

    # idempotent skip on second run
    results2 = create_embeddings.main(config, tiny=True)
    assert results2["models"]["tiny-model"]["word"]["skipped"]
    # force rebuild
    results3 = create_embeddings.main(config, tiny=True, force=True)
    assert not results3["models"]["tiny-model"]["word"]["skipped"]

    verify = create_embeddings.main(config, verify=True)["verify"]
    assert verify, "no indexes verified"
    assert all(v["ok"] for v in verify.values()), verify


def test_discovers_finetuned_dirs(config, tmp_path):
    os.makedirs("models/foo_finetuned", exist_ok=True)
    models = create_embeddings.discover_models(config)
    assert any("foo_finetuned" in m for m in models)
    assert "tiny-model" in models


def test_collection_add_query(rng):
    col = Collection("test", metric="cosine")
    emb = rng.standard_normal((20, 16)).astype(np.float32)
    col.add(
        ids=[f"id{i}" for i in range(20)],
        documents=[f"doc {i}" for i in range(20)],
        embeddings=emb,
        metadatas=[{"i": i} for i in range(20)],
        batch_size=7,
    )
    assert col.count() == 20
    out = col.query(query_embeddings=emb[[3]], n_results=3)
    assert out["ids"][0][0] == "id3"
    assert out["documents"][0][0] == "doc 3"
    assert out["metadatas"][0][0] == {"i": 3}
    assert out["distances"][0][0] == pytest.approx(0.0, abs=1e-4)


def test_collection_store():
    store = CollectionStore()
    a = store.get_or_create_collection("a")
    assert store.get_or_create_collection("a") is a
    assert store.list_collections() == ["a"]
    store.delete_collection("a")
    assert store.list_collections() == []


def test_collection_save_load_roundtrip(rng, tmp_path):
    col = Collection("rt", metric="cosine")
    emb = rng.standard_normal((12, 8)).astype(np.float32)
    col.add(
        ids=[f"id{i}" for i in range(12)],
        documents=[f"سند {i}" for i in range(12)],
        embeddings=emb,
        metadatas=[{"i": i} for i in range(12)],
    )
    d = str(tmp_path / "rt")
    col.save(d)
    back = Collection.load(d)
    assert back.count() == 12
    assert back.metric == "cosine"
    out = back.query(query_embeddings=emb[[5]], n_results=3)
    ref = col.query(query_embeddings=emb[[5]], n_results=3)
    assert out["ids"] == ref["ids"]
    assert out["documents"][0][0] == "سند 5"
    assert out["metadatas"] == ref["metadatas"]
    np.testing.assert_allclose(
        out["distances"], ref["distances"], atol=1e-6
    )


def test_persistent_store_survives_restart(rng, tmp_path):
    """The reference's chromadb.PersistentClient('./chroma_db') store
    survives process restart (scripts/phase3_pdf_chunking.py:80); a
    fresh CollectionStore over the same path must reopen collections
    with identical query results."""
    root = str(tmp_path / "chroma_db")
    emb = rng.standard_normal((15, 8)).astype(np.float32)
    store = CollectionStore(path=root)
    col = store.get_or_create_collection("drugs", metric="cosine")
    col.add(
        ids=[f"c{i}" for i in range(15)],
        documents=[f"doc {i}" for i in range(15)],
        embeddings=emb,
        metadatas=[{"n": i} for i in range(15)],
    )
    ref = col.query(query_embeddings=emb[[2]], n_results=4)

    # "restart": a brand-new store over the same path
    store2 = CollectionStore(path=root)
    assert store2.list_collections() == ["drugs"]
    col2 = store2.get_or_create_collection("drugs")
    assert col2.count() == 15
    out = col2.query(query_embeddings=emb[[2]], n_results=4)
    assert out["ids"] == ref["ids"]
    assert out["metadatas"] == ref["metadatas"]

    # incremental adds through the reopened handle persist too
    col2.add(ids=["extra"], documents=["doc x"],
             embeddings=rng.standard_normal((1, 8)).astype(np.float32))
    store3 = CollectionStore(path=root)
    assert store3.get_or_create_collection("drugs").count() == 16

    # delete removes the on-disk copy
    store3.delete_collection("drugs")
    assert CollectionStore(path=root).list_collections() == []


def test_persisted_metric_mismatch_raises(rng, tmp_path):
    """chromadb raises when reopening a collection with mismatched
    metadata; silently serving cosine distances to an l2 caller would
    corrupt results (ADVICE r4)."""
    root = str(tmp_path / "chroma_db")
    store = CollectionStore(path=root)
    col = store.get_or_create_collection("drugs", metric="cosine")
    col.add(ids=["a"], documents=["d"],
            embeddings=rng.standard_normal((1, 8)).astype(np.float32))
    store2 = CollectionStore(path=root)
    with pytest.raises(ValueError, match="metric"):
        store2.get_or_create_collection("drugs", metric="l2")
    # matching metric reopens fine
    assert store2.get_or_create_collection(
        "drugs", metric="cosine"
    ).count() == 1


def test_incremental_adds_append_shards_not_full_rewrites(rng, tmp_path):
    """ADVICE r4: add() used to rewrite the ENTIRE npz + full-document
    sidecar per batch (O(m^2) across m adds). Now each add appends one
    shard pair; the base sidecar stays small until consolidation, and a
    reopening store replays shards in order."""
    import os

    root = str(tmp_path / "chroma_db")
    store = CollectionStore(path=root)
    col = store.get_or_create_collection("inc", metric="cosine")
    embs = [rng.standard_normal((3, 8)).astype(np.float32)
            for _ in range(4)]
    for b, emb in enumerate(embs):
        col.add(
            ids=[f"b{b}-{i}" for i in range(3)],
            documents=[f"doc {b}-{i}" for i in range(3)],
            embeddings=emb,
            metadatas=[{"b": b, "i": i} for i in range(3)],
        )
    d = os.path.join(root, "inc")
    shard_json = [f for f in os.listdir(d)
                  if f.startswith("shard-") and f.endswith(".json")]
    assert len(shard_json) == 4
    # base sidecar holds no documents yet (adds did not rewrite it)
    import json as _json
    with open(os.path.join(d, "collection.json"), encoding="utf-8") as f:
        side = _json.load(f)
    assert side["ids"] == []

    ref = col.query(
        query_embeddings=embs[2][[1]], n_results=4
    )
    # restart: shards replay in order and consolidate
    col2 = CollectionStore(path=root).get_or_create_collection("inc")
    assert col2.count() == 12
    out = col2.query(query_embeddings=embs[2][[1]], n_results=4)
    assert out["ids"] == ref["ids"]
    assert out["metadatas"] == ref["metadatas"]
    # consolidation on reopen cleared the shard backlog
    assert not [f for f in os.listdir(d) if f.startswith("shard-")]
    with open(os.path.join(d, "collection.json"), encoding="utf-8") as f:
        assert len(_json.load(f)["ids"]) == 12
    # and a third open still agrees
    col3 = CollectionStore(path=root).get_or_create_collection("inc")
    assert col3.query(
        query_embeddings=embs[2][[1]], n_results=4
    )["ids"] == ref["ids"]
