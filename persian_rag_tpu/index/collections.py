"""ChromaDB-style collection API over the dense index.

The reference builds secondary ChromaDB collections with cosine HNSW
(reference: scripts/phase3_pdf_chunking.py:73-130, query test :449-467).
At these corpus scales exact flat search dominates approximate HNSW on
both quality and (on TPU) speed, so the collection API is a thin facade
over DenseIndex: add(documents, embeddings, metadatas, ids) in batches,
query(query_embeddings | query_texts, n_results) returning the Chroma
response shape (ids/documents/metadatas/distances lists-of-lists).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from persian_rag_tpu.index.dense import DenseIndex


class Collection:
    def __init__(
        self,
        name: str,
        dim: Optional[int] = None,
        metric: str = "cosine",
        encoder=None,
        mesh=None,
    ):
        self.name = name
        self.metric = metric
        self.encoder = encoder
        self.mesh = mesh
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


class CollectionStore:
    """get_or_create_collection facade (chromadb.PersistentClient-like)."""

    def __init__(self, encoder=None, mesh=None):
        self._collections: Dict[str, Collection] = {}
        self.encoder = encoder
        self.mesh = mesh

    def get_or_create_collection(
        self, name: str, metric: str = "cosine"
    ) -> Collection:
        if name not in self._collections:
            self._collections[name] = Collection(
                name, metric=metric, encoder=self.encoder, mesh=self.mesh
            )
        return self._collections[name]

    def list_collections(self) -> List[str]:
        return sorted(self._collections)

    def delete_collection(self, name: str) -> None:
        self._collections.pop(name, None)
