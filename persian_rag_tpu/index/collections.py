"""ChromaDB-style collection API over the dense index.

The reference builds secondary ChromaDB collections with cosine HNSW
(reference: scripts/phase3_pdf_chunking.py:73-130, query test :449-467).
At these corpus scales exact flat search dominates approximate HNSW on
both quality and (on TPU) speed, so the collection API is a thin facade
over DenseIndex: add(documents, embeddings, metadatas, ids) in batches,
query(query_embeddings | query_texts, n_results) returning the Chroma
response shape (ids/documents/metadatas/distances lists-of-lists).

Persistence matches the reference's ``chromadb.PersistentClient(path=
"./chroma_db")`` contract (scripts/phase3_pdf_chunking.py:80): a
CollectionStore constructed with a path writes each collection to
``<path>/<name>/`` (DenseIndex npz payload + a JSON sidecar holding
ids/documents/metadatas) after every ``add``, and a fresh store over
the same path lists and reopens them across process restarts.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Optional, Sequence

import numpy as np

from persian_rag_tpu.index.dense import DenseIndex

_SIDECAR = "collection.json"


class Collection:
    def __init__(
        self,
        name: str,
        dim: Optional[int] = None,
        metric: str = "cosine",
        encoder=None,
        mesh=None,
        persist_dir: Optional[str] = None,
    ):
        self.name = name
        self.metric = metric
        self.encoder = encoder
        self.mesh = mesh
        self.persist_dir = persist_dir
        self._dim = dim
        self._index: Optional[DenseIndex] = None
        self._ids: List[str] = []
        self._documents: List[str] = []
        self._metadatas: List[Dict] = []

    def count(self) -> int:
        return len(self._ids)

    def add(
        self,
        ids: Sequence[str],
        documents: Optional[Sequence[str]] = None,
        embeddings: Optional[np.ndarray] = None,
        metadatas: Optional[Sequence[Dict]] = None,
        batch_size: int = 500,
    ) -> None:
        """Batched adds (the reference inserts in batches of 500)."""
        n = len(ids)
        if embeddings is None:
            if self.encoder is None or documents is None:
                raise ValueError("need embeddings, or documents + an encoder")
            embeddings = self.encoder.encode(list(documents))
        embeddings = np.asarray(embeddings, np.float32)
        if self._index is None:
            self._dim = embeddings.shape[1]
            self._index = DenseIndex(self._dim, metric=self.metric, mesh=self.mesh)
        for start in range(0, n, batch_size):
            self._index.add(embeddings[start : start + batch_size])
        self._ids.extend(ids)
        self._documents.extend(documents or [""] * n)
        self._metadatas.extend(metadatas or [{}] * n)
        if self.persist_dir is not None:
            # Eager durability like chromadb's PersistentClient, but
            # APPEND-ONLY: each add writes one shard file instead of
            # rewriting the whole npz + full-document sidecar (that was
            # O(m^2) serialization across m incremental adds). Shards
            # consolidate into the base files on save()/load().
            self._save_shard(
                self.persist_dir, list(ids),
                list(documents or [""] * n),
                list(metadatas or [{}] * n),
                embeddings,
            )

    def query(
        self,
        query_embeddings: Optional[np.ndarray] = None,
        query_texts: Optional[Sequence[str]] = None,
        n_results: int = 10,
    ) -> Dict[str, List[List]]:
        if self._index is None:
            raise ValueError("empty collection")
        if query_embeddings is None:
            if self.encoder is None or query_texts is None:
                raise ValueError("need query_embeddings, or query_texts + encoder")
            query_embeddings = self.encoder.encode(list(query_texts))
        scores, idx = self._index.search(
            np.asarray(query_embeddings, np.float32), n_results
        )
        if scores.ndim == 1:
            scores, idx = scores[None], idx[None]
        out = {"ids": [], "documents": [], "metadatas": [], "distances": []}
        for qi in range(scores.shape[0]):
            row_ids, row_docs, row_meta, row_dist = [], [], [], []
            for s, i in zip(scores[qi], idx[qi]):
                if 0 <= i < len(self._ids):
                    row_ids.append(self._ids[i])
                    row_docs.append(self._documents[i])
                    row_meta.append(self._metadatas[i])
                    # Chroma cosine space returns distance = 1 - cos
                    row_dist.append(
                        1.0 - float(s) if self.metric == "cosine" else float(s)
                    )
            out["ids"].append(row_ids)
            out["documents"].append(row_docs)
            out["metadatas"].append(row_meta)
            out["distances"].append(row_dist)
        return out

    # -- persistence (the reference's chromadb store survives process
    # restart: scripts/phase3_pdf_chunking.py:80) ------------------------

    def _save_shard(
        self,
        directory: str,
        ids: List[str],
        documents: List[str],
        metadatas: List[Dict],
        embeddings: np.ndarray,
    ) -> None:
        """Append one add() batch as a numbered shard pair
        (shard-NNNNNN.npz + .json). The base sidecar is written once
        (empty) so a reopening store can identify the collection even
        if the process dies before the first consolidation."""
        os.makedirs(directory, exist_ok=True)
        if not os.path.exists(os.path.join(directory, _SIDECAR)):
            self._write_sidecar(directory, ids=[], documents=[],
                                metadatas=[])
        existing = [
            f for f in os.listdir(directory)
            if f.startswith("shard-") and f.endswith(".json")
        ]
        stem = os.path.join(directory, f"shard-{len(existing):06d}")
        np.savez(stem + ".npz", vectors=np.asarray(embeddings, np.float32))
        tmp = stem + ".json.tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(
                {"ids": ids, "documents": documents,
                 "metadatas": metadatas},
                f, ensure_ascii=False,
            )
        os.replace(tmp, stem + ".json")

    def _write_sidecar(self, directory, ids, documents, metadatas) -> None:
        sidecar = {
            "name": self.name,
            "metric": self.metric,
            "dim": self._dim,
            "ids": ids,
            "documents": documents,
            "metadatas": metadatas,
        }
        tmp = os.path.join(directory, _SIDECAR + ".tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(sidecar, f, ensure_ascii=False)
        os.replace(tmp, os.path.join(directory, _SIDECAR))

    @staticmethod
    def _shard_stems(directory: str) -> List[str]:
        return sorted(
            os.path.join(directory, f[:-5])
            for f in os.listdir(directory)
            if f.startswith("shard-") and f.endswith(".json")
        )

    def save(self, directory: str) -> None:
        """Write the collection to ``directory``: DenseIndex payload
        (vectors npz + meta json) plus a JSON sidecar carrying the
        ids/documents/metadatas lists.

        The npz is written from the index's HOST-side copy when vectors
        are still staged (add() persists eagerly like chromadb's
        PersistentClient): calling DenseIndex.save() here would force a
        full device commit per add() batch — O(m * N) device uploads
        over m incremental adds (each relay upload is seconds-to-
        minutes). Committed indexes (queried at least once) still go
        through DenseIndex.save()."""
        os.makedirs(directory, exist_ok=True)
        if self._index is not None:
            idx = self._index
            if idx._pending and idx._device_corpus is None:
                # all vectors still staged host-side: snapshot without
                # touching the device (same on-disk format as
                # DenseIndex.save)
                vectors = np.concatenate(idx._pending, axis=0)
                if idx.metric == "cosine":
                    norms = np.linalg.norm(vectors, axis=1, keepdims=True)
                    vectors = vectors / np.maximum(norms, 1e-12)
                base = os.path.join(directory, "index")
                np.savez(base + ".npz", vectors=vectors)
                with open(base + ".meta.json", "w", encoding="utf-8") as f:
                    json.dump(
                        {
                            "dim": idx.dim,
                            "metric": idx.metric,
                            "ntotal": vectors.shape[0],
                        },
                        f,
                    )
            else:
                idx.save(os.path.join(directory, "index"))
        self._write_sidecar(
            directory, self._ids, self._documents, self._metadatas
        )
        # consolidated: the in-memory state now fully covers the shards
        for stem in self._shard_stems(directory):
            for suffix in (".npz", ".json"):
                try:
                    os.remove(stem + suffix)
                except OSError:
                    pass

    @classmethod
    def load(
        cls,
        directory: str,
        encoder=None,
        mesh=None,
        persist: bool = False,
    ) -> "Collection":
        with open(
            os.path.join(directory, _SIDECAR), "r", encoding="utf-8"
        ) as f:
            sidecar = json.load(f)
        col = cls(
            sidecar["name"],
            dim=sidecar.get("dim"),
            metric=sidecar["metric"],
            encoder=encoder,
            mesh=mesh,
            persist_dir=directory if persist else None,
        )
        index_path = os.path.join(directory, "index")
        if os.path.exists(index_path + ".meta.json"):
            col._index = DenseIndex.load(index_path, mesh=mesh)
            col._dim = col._index.dim
        col._ids = list(sidecar["ids"])
        col._documents = list(sidecar["documents"])
        col._metadatas = list(sidecar["metadatas"])
        # replay append-only shards written after the last consolidation
        stems = Collection._shard_stems(directory)
        for stem in stems:
            with open(stem + ".json", "r", encoding="utf-8") as f:
                rec = json.load(f)
            with np.load(stem + ".npz") as z:
                vectors = np.asarray(z["vectors"], np.float32)
            if col._index is None:
                col._dim = vectors.shape[1]
                col._index = DenseIndex(
                    col._dim, metric=col.metric, mesh=mesh
                )
            col._index.add(vectors)
            col._ids.extend(rec["ids"])
            col._documents.extend(rec["documents"])
            col._metadatas.extend(rec["metadatas"])
        if stems and persist:
            # consolidate so the shard list doesn't grow without bound
            col.save(directory)
        return col


class CollectionStore:
    """get_or_create_collection facade (chromadb.PersistentClient-like).

    With ``path`` set, behaves like the reference's
    ``chromadb.PersistentClient("./chroma_db")``: collections persist
    under ``<path>/<name>/`` after every add, existing ones are listed
    and reopened by a fresh store over the same path, and
    delete_collection removes the on-disk copy too."""

    def __init__(self, encoder=None, mesh=None, path: Optional[str] = None):
        self._collections: Dict[str, Collection] = {}
        self.encoder = encoder
        self.mesh = mesh
        self.path = path
        if path is not None:
            os.makedirs(path, exist_ok=True)

    def _dir(self, name: str) -> Optional[str]:
        return None if self.path is None else os.path.join(self.path, name)

    def get_or_create_collection(
        self, name: str, metric: str = "cosine"
    ) -> Collection:
        if name not in self._collections:
            d = self._dir(name)
            if d is not None and os.path.exists(os.path.join(d, _SIDECAR)):
                col = Collection.load(
                    d, encoder=self.encoder, mesh=self.mesh, persist=True
                )
                if col.metric != metric:
                    # chromadb raises on a metadata/metric mismatch when
                    # reopening; silently serving cosine distances to a
                    # caller who asked for l2 would corrupt results
                    raise ValueError(
                        f"collection {name!r} exists with metric "
                        f"{col.metric!r}; requested {metric!r}"
                    )
                self._collections[name] = col
            else:
                self._collections[name] = Collection(
                    name,
                    metric=metric,
                    encoder=self.encoder,
                    mesh=self.mesh,
                    persist_dir=d,
                )
        return self._collections[name]

    def list_collections(self) -> List[str]:
        names = set(self._collections)
        if self.path is not None and os.path.isdir(self.path):
            for entry in os.listdir(self.path):
                if os.path.exists(
                    os.path.join(self.path, entry, _SIDECAR)
                ):
                    names.add(entry)
        return sorted(names)

    def persist(self) -> None:
        """Flush every open collection to disk (adds already persist
        eagerly; this covers collections mutated through their index)."""
        if self.path is None:
            return
        for name, col in self._collections.items():
            col.save(os.path.join(self.path, name))

    def delete_collection(self, name: str) -> None:
        self._collections.pop(name, None)
        d = self._dir(name)
        if d is not None and os.path.isdir(d):
            shutil.rmtree(d)
