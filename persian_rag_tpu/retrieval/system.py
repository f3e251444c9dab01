"""Unified retrieval system: dense | bm25 | tfidf | hybrid.

API- and semantics-compatible rebuild of the reference's RetrievalSystem
(reference: src/retrieval.py:12-336) on the TPU-native index stack:

* dense    — DenseIndex (fused Pallas flat search) with the reference's
             1/(1+L2) similarity mapping (src/retrieval.py:108),
* bm25     — BM25Index, raw Okapi scores descending (:117-143),
* tfidf    — TfidfIndex, cosine descending (:145-172),
* hybrid   — dense & bm25 each at 2*k, per-method max-normalization and a
             0.6/0.4 weighted sum (:174-216).

Beyond the reference: `retrieve_batch` answers many queries in one device
round-trip (the reference is strictly one-query-at-a-time), and a mesh
shards the dense corpus across chips.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from jax.sharding import Mesh

from persian_rag_tpu.index.dense import DenseIndex
from persian_rag_tpu.index.lexical import BM25Index, TfidfIndex

Chunk = Dict
Result = Tuple[Chunk, float]


def assemble_contexts(
    results: Sequence[Result], max_context_length: int = 2000
) -> Tuple[List[str], List[Dict]]:
    """Character-budgeted context assembly with truncation-with-'...'
    (reference: src/retrieval.py:240-272). Shared by the retrieval API
    and the evaluator."""
    contexts: List[str] = []
    metadata: List[Dict] = []
    total = 0
    for chunk, score in results:
        text = str(chunk["text"])
        if total + len(text) > max_context_length:
            remaining = max_context_length - total
            if remaining > 100:
                text = text[:remaining] + "..."
            else:
                break
        contexts.append(text)
        metadata.append(
            {
                "chunk_id": chunk["id"],
                "score": score,
                "chunk_type": chunk.get("chunk_type", "unknown"),
                "length": len(text),
            }
        )
        total += len(text)
        if total >= max_context_length:
            break
    return contexts, metadata


class RetrievalSystem:
    def __init__(
        self,
        method: str = "dense",
        encoder=None,
        model_path: Optional[str] = None,
        mesh: Optional[Mesh] = None,
        dense_metric: str = "l2",
        query_prefix: str = "",
        passage_prefix: str = "",
        dense_index_type: str = "flat",
        ivf_cells: int = 100,
        ivf_nprobe: int = 8,
        ivf_target_recall: Optional[float] = None,
    ):
        """
        Args:
          method: "dense" | "bm25" | "tfidf" | "hybrid"
          encoder: a SentenceEncoder (or None for lexical-only methods)
          model_path: local sentence-transformers dir, loaded lazily when
            no encoder instance is passed (reference keeps this argument)
          mesh: optional device mesh for corpus sharding
          dense_metric: "l2" (FAISS-parity scores) or "cosine"
          query_prefix/passage_prefix: e5-style instruction prefixes
        """
        self.method = method
        self.mesh = mesh
        self.dense_metric = dense_metric
        self.query_prefix = query_prefix
        self.passage_prefix = passage_prefix
        self.dense_index_type = dense_index_type
        self.ivf_cells = ivf_cells
        self.ivf_nprobe = ivf_nprobe
        # calibrate nprobe to a measured Recall@10 target at build time
        # (IVFIndex.calibrate_nprobe) instead of serving a raw knob
        self.ivf_target_recall = ivf_target_recall
        self.embedding_model = encoder
        if encoder is None and model_path and method in ("dense", "hybrid"):
            from persian_rag_tpu.models.sentence_encoder import SentenceEncoder

            self.embedding_model = SentenceEncoder.from_pretrained(
                model_path, mesh=mesh
            )
        self.chunks: Optional[List[Chunk]] = None
        self.dense_index: Optional[DenseIndex] = None
        self.bm25_index: Optional[BM25Index] = None
        self.tfidf_index: Optional[TfidfIndex] = None
        self.is_ready = False
        self._fused_cache: Dict = {}

    # -- setup ---------------------------------------------------------------

    def load_chunks_and_index(
        self,
        chunk_file,
        faiss_index_file: Optional[str] = None,
        embeddings: Optional[np.ndarray] = None,
        embeddings_from_encoder: bool = True,
    ) -> bool:
        """Load chunks (CSV path or list of dicts) and build/load indexes.

        Dense vectors come from, in priority order: `embeddings`, a FAISS
        or native index file, or encoding the chunks with the embedding
        model (the reference requires a prebuilt FAISS file — reference:
        src/retrieval.py:52-59).

        embeddings_from_encoder: contract flag for caller-supplied
        `embeddings` — True (default) asserts row i was produced by THIS
        system's encoder from chunk i, which lets rerank gather stored
        index vectors instead of re-encoding candidate texts. Pass False
        for vectors from another embedding space; rerank then falls back
        to re-encoding. Index files loaded from disk are always treated
        as foreign (rerank re-encodes) since their provenance is unknown.
        """
        if isinstance(chunk_file, str):
            import pandas as pd

            df = pd.read_csv(chunk_file, encoding="utf-8")
            self.chunks = df.to_dict("records")
        else:
            self.chunks = list(chunk_file)
        texts = [str(c["text"]) for c in self.chunks]
        # chunk id -> dense-index row, for the rerank fast path (only
        # usable when ids are unique; positions and index rows coincide
        # because the index is built from self.chunks in order)
        ids_seen = [c.get("id") for c in self.chunks]
        self._id_to_row = (
            {cid: i for i, cid in enumerate(ids_seen)}
            if None not in ids_seen and len(set(ids_seen)) == len(ids_seen)
            else None
        )

        # whether stored index rows live in this system's embedding space
        # (gates the rerank stored-vector fast path)
        self._rows_match_encoder = False
        if self.method in ("dense", "hybrid"):
            if embeddings is not None:
                self._build_dense(np.asarray(embeddings, np.float32))
                self._rows_match_encoder = bool(embeddings_from_encoder)
            elif faiss_index_file:
                if faiss_index_file.endswith(".npz"):
                    self.dense_index = DenseIndex.load(
                        faiss_index_file, mesh=self.mesh
                    )
                else:
                    from persian_rag_tpu.index import faiss_io

                    if faiss_io.probe_faiss(faiss_index_file) == "ivf":
                        from persian_rag_tpu.index.ivf import IVFIndex

                        self.dense_index = IVFIndex.from_faiss(
                            faiss_index_file
                        )
                    else:
                        self.dense_index = DenseIndex.from_faiss(
                            faiss_index_file, mesh=self.mesh
                        )
                self.dense_metric = self.dense_index.metric
            elif self.embedding_model is not None:
                vectors = self.embedding_model.encode(
                    [self.passage_prefix + t for t in texts]
                )
                self._build_dense(vectors)
                self._rows_match_encoder = True
            else:
                print("dense retrieval needs embeddings, an index file, or an encoder")
                return False
            if self.dense_index.ntotal != len(self.chunks):
                print(
                    f"warning: index has {self.dense_index.ntotal} vectors "
                    f"but {len(self.chunks)} chunks"
                )

        if self.method in ("bm25", "hybrid"):
            self.bm25_index = BM25Index(mesh=self.mesh).build(texts)

        if self.method in ("tfidf", "hybrid"):
            self.tfidf_index = TfidfIndex(mesh=self.mesh).build(texts)

        self._fused_cache.clear()  # jitted steps bake the old index's k clamp
        self.is_ready = True
        return True

    def _build_dense(self, vectors: np.ndarray) -> None:
        if self.dense_index_type == "ivf":
            from persian_rag_tpu.index.ivf import IVFIndex

            self.dense_index = IVFIndex(
                vectors.shape[1],
                n_cells=min(self.ivf_cells, max(1, vectors.shape[0] // 4)),
                nprobe=self.ivf_nprobe,
                metric=self.dense_metric,
                target_recall=self.ivf_target_recall,
                mesh=self.mesh,
            ).build(vectors)
        else:
            self.dense_index = DenseIndex(
                vectors.shape[1], metric=self.dense_metric, mesh=self.mesh
            )
            self.dense_index.add(vectors)
            self.dense_index.commit()

    # -- single-query paths (reference-compatible API) -------------------------

    def retrieve_dense(self, query: str, top_k: int = 10) -> List[Result]:
        results = self.retrieve_dense_batch([query], top_k)
        return results[0]

    def retrieve_bm25(self, query: str, top_k: int = 10) -> List[Result]:
        return self.retrieve_bm25_batch([query], top_k)[0]

    def retrieve_tfidf(self, query: str, top_k: int = 10) -> List[Result]:
        return self.retrieve_tfidf_batch([query], top_k)[0]

    def retrieve_hybrid(
        self,
        query: str,
        top_k: int = 10,
        dense_weight: float = 0.6,
        bm25_weight: float = 0.4,
    ) -> List[Result]:
        return self.retrieve_hybrid_batch(
            [query], top_k, dense_weight, bm25_weight
        )[0]

    def retrieve(self, query: str, top_k: int = 10) -> List[Result]:
        """Dispatch on the configured method (reference:
        src/retrieval.py:222-238)."""
        return self.retrieve_batch([query], top_k)[0]

    # -- batched paths ---------------------------------------------------------

    def retrieve_batch(
        self, queries: Sequence[str], top_k: int = 10
    ) -> List[List[Result]]:
        if not self.is_ready:
            raise RuntimeError(
                "Retrieval system is not ready; load_chunks_and_index first"
            )
        if self.method == "dense":
            return self.retrieve_dense_batch(queries, top_k)
        if self.method == "bm25":
            return self.retrieve_bm25_batch(queries, top_k)
        if self.method == "tfidf":
            return self.retrieve_tfidf_batch(queries, top_k)
        if self.method == "hybrid":
            return self.retrieve_hybrid_batch(queries, top_k)
        raise ValueError(f"unknown retrieval method: {self.method}")

    def _encode_queries(self, queries: Sequence[str]) -> np.ndarray:
        if self.embedding_model is None:
            raise RuntimeError("no embedding model configured for dense retrieval")
        return self.embedding_model.encode(
            [self.query_prefix + q for q in queries]
        )

    # -- fused encode+search (one device dispatch per batch) -------------------

    def _fused_supported(self) -> bool:
        """The fused path needs an in-process encoder and a committed
        single-chip flat DenseIndex (IVF and mesh-sharded indexes keep
        the two-dispatch path)."""
        return (
            self.embedding_model is not None
            and type(self.dense_index) is DenseIndex
            and self.dense_index.mesh is None
            and getattr(self.embedding_model, "mesh", None) is None
        )

    def _fused_dense_fn(self, k: int):
        """Jitted tokenized-queries -> (scores, ids) step: encoder forward,
        pooling, and the fused Pallas flat search in ONE dispatch (the
        unfused path pays a host round-trip between encode and search —
        ~25-40 ms per transfer on relay-attached TPUs). The corpus (and
        int8 scales) are passed as arguments, not closed over."""
        if k not in self._fused_cache:
            import jax

            enc = self.embedding_model
            index = self.dense_index
            encoder, head = enc.encoder, enc.head

            def step(params, packed_tok, corpus, row_scales,
                     refine_corpus, sqnorms, stage1_bf16, center,
                     stage1_center, center_sqmax, stage1_lo):
                # packed_tok = [input_ids | attention_mask], one int32
                # upload instead of two (each relay transfer is a fixed
                # ~15-35 ms round trip regardless of size)
                l = packed_tok.shape[1] // 2
                input_ids = packed_tok[:, :l]
                attention_mask = packed_tok[:, l:]
                hidden = encoder.apply(
                    {"params": params["encoder"]}, input_ids, attention_mask
                )
                emb = head.apply(
                    {"params": params["head"]}, hidden, attention_mask
                )
                s, i = index.search_device(
                    emb, k, corpus=corpus, row_scales=row_scales,
                    refine_corpus=refine_corpus, sqnorms=sqnorms,
                    stage1_bf16=stage1_bf16, center=center,
                    stage1_center=stage1_center, center_sqmax=center_sqmax,
                    stage1_lo=stage1_lo,
                )
                # one int32 readback: [bitcast(scores) | ids]. The
                # container must be INT32 — ids bitcast into f32 are
                # denormals and the TPU f32 path flushes them to zero.
                import jax.numpy as jnp

                return jnp.concatenate(
                    [
                        jax.lax.bitcast_convert_type(
                            s.astype(jnp.float32), jnp.int32
                        ),
                        i.astype(jnp.int32),
                    ],
                    axis=1,
                )

            # None args are empty pytrees — jit handles them natively
            self._fused_cache[k] = jax.jit(step)
        return self._fused_cache[k]

    def _hybrid_fused_supported(self) -> bool:
        """The one-dispatch hybrid path additionally needs a single-chip
        BM25 index and unique chunk ids (device row ids must coincide
        with chunk positions for the id-keyed dedup to be equivalent)."""
        return (
            self._fused_supported()
            and self.bm25_index is not None
            and self.bm25_index.mesh is None
            and getattr(self, "_id_to_row", None) is not None
        )

    def _fused_hybrid_fn(
        self,
        k: int,
        m_d: int,
        m_b: int,
        rerank: bool,
        dense_weight: float,
        bm25_weight: float,
        use_union: bool = False,
        hash_ok=(True, ()),
        qw_exact: bool = False,
    ):
        """Jitted (tokenized queries, lexical query terms) -> hybrid
        top-k step: encoder forward + fused dense search + fused lexical
        search + channel fusion (+ stored-vector cosine rerank) in ONE
        device dispatch. The host path pays a per-query Python dict loop
        plus separate dense/bm25/rerank dispatches (reference semantics:
        src/retrieval.py:174-216; measured 4.17 ms/q at 20k docs).
        use_union routes the lexical share through the union/hashed-
        union batch-dedup kernels (per-batch host gate, like
        BM25Index.search's)."""
        from persian_rag_tpu.index.lexical import (
            _fused_bucket_topk_impl,
            _topk_one_layout,
        )
        from persian_rag_tpu.ops.hybrid_fusion import (
            fuse_hybrid,
            gather_rows_device,
            rerank_cosine,
        )

        # the union kernels' merge unrolls k extraction steps; stay on
        # the per-term kernels for wide over-retrieves
        use_union = use_union and m_b <= 32
        flat_hash_ok, bucket_hash_ok = hash_ok
        kbs = self.bm25_index.bucket_kbs(m_b)
        key = ("hybrid", k, m_d, m_b, rerank, dense_weight, bm25_weight,
               kbs, use_union, flat_hash_ok, bucket_hash_ok, qw_exact)
        if key not in self._fused_cache:
            import jax

            enc = self.embedding_model
            index = self.dense_index
            encoder, head = enc.encoder, enc.head
            dense_sim = "l2" if self.dense_metric == "l2" else "sim"
            n_buckets = len(kbs)

            def step(params, packed_q, corpus, row_scales,
                     refine_corpus, sqnorms, stage1_bf16, center,
                     stage1_center, center_sqmax, stage1_lo,
                     *lex_arrays, l):
                # packed_q = [input_ids | attention_mask | qids |
                # bitcast(qvals)] — ONE int32 upload for all four query
                # arrays (each relay transfer is a fixed ~15-35 ms round
                # trip). l (token length) is static; the lexical term
                # width t falls out of the packed width.
                import jax.numpy as jnp

                t = (packed_q.shape[1] - 2 * l) // 2
                input_ids = packed_q[:, :l]
                attention_mask = packed_q[:, l : 2 * l]
                qids = packed_q[:, 2 * l : 2 * l + t]
                qvals = jax.lax.bitcast_convert_type(
                    packed_q[:, 2 * l + t :], jnp.float32
                )
                hidden = encoder.apply(
                    {"params": params["encoder"]}, input_ids, attention_mask
                )
                emb = head.apply(
                    {"params": params["head"]}, hidden, attention_mask
                )
                d_s, d_i = index.search_device(
                    emb, m_d, corpus=corpus, row_scales=row_scales,
                    refine_corpus=refine_corpus, sqnorms=sqnorms,
                    stage1_bf16=stage1_bf16, center=center,
                    stage1_center=stage1_center, center_sqmax=center_sqmax,
                    stage1_lo=stage1_lo,
                )
                if n_buckets == 0:
                    l_s, l_i = _topk_one_layout(
                        lex_arrays[0], lex_arrays[1],
                        lex_arrays[2], lex_arrays[3],
                        qids, qvals, m_b, None, use_union,
                        flat_hash_ok, qw_exact=qw_exact,
                    )
                else:
                    l_s, l_i = _fused_bucket_topk_impl(
                        tuple(lex_arrays[0::5]),
                        tuple(lex_arrays[1::5]),
                        tuple(lex_arrays[2::5]),
                        qids, qvals, kbs=kbs, k=m_b, use_pallas=None,
                        use_union=use_union,
                        bucket_ids3=tuple(lex_arrays[3::5]),
                        bucket_vals3=tuple(lex_arrays[4::5]),
                        hash_ok=bucket_hash_ok,
                        qw_exact=qw_exact,
                    )
                f_s, f_i = fuse_hybrid(
                    d_s, d_i, l_s, l_i, k,
                    dense_weight=dense_weight, bm25_weight=bm25_weight,
                    dense_sim=dense_sim,
                )
                if rerank:
                    rows = gather_rows_device(
                        f_i, corpus, row_scales, refine_corpus
                    )
                    f_s, f_i = rerank_cosine(emb, rows, f_s, f_i)
                # one int32 readback: [bitcast(scores) | ids] (f32
                # containers flush denormal id bits on TPU)
                return jnp.concatenate(
                    [
                        jax.lax.bitcast_convert_type(
                            f_s.astype(jnp.float32), jnp.int32
                        ),
                        f_i.astype(jnp.int32),
                    ],
                    axis=1,
                )

            self._fused_cache[key] = jax.jit(step, static_argnames=("l",))
        return self._fused_cache[key]

    def _retrieve_hybrid_fused(
        self,
        queries: Sequence[str],
        top_k: int,
        dense_weight: float,
        bm25_weight: float,
        rerank: bool,
    ) -> List[List[Result]]:
        import jax.numpy as jnp

        enc = self.embedding_model
        texts = [self.query_prefix + q for q in queries]
        real = len(texts)
        pad = (-real) % 8
        ids, mask = enc.tokenizer.encode_batch(
            texts + [""] * pad, enc.max_seq_len
        )
        bm = self.bm25_index
        qids, qvals = bm._encode_queries(
            [bm._query_terms(q) for q in queries] + [[]] * pad
        )
        n = self.dense_index.ntotal
        m_d = min(top_k * 2, n)
        m_b = min(top_k * 2, bm.ntotal)
        k = min(top_k, n)
        (corpus, scales, refine, sqnorms, stage1, center,
         s1_center, c_sqmax, s1_lo) = self.dense_index.fused_args()
        use_union = bm._union_gate(qids)
        from persian_rag_tpu.index.lexical import qw_exact_gate

        qw_exact = qw_exact_gate(qvals)
        fn = self._fused_hybrid_fn(
            k, m_d, m_b, rerank, dense_weight, bm25_weight,
            use_union=use_union,
            hash_ok=bm._hash_ok_flags(qids) if use_union else (True, ()),
            qw_exact=qw_exact,
        )
        packed_q = np.concatenate(
            [
                ids.astype(np.int32),
                mask.astype(np.int32),
                qids.astype(np.int32),
                qvals.astype(np.float32).view(np.int32),
            ],
            axis=1,
        )
        out = np.asarray(
            fn(
                enc.params, jnp.asarray(packed_q), corpus, scales,
                refine, sqnorms, stage1, center, s1_center, c_sqmax, s1_lo,
                *bm.device_arrays(), l=ids.shape[1],
            )
        )
        scores = np.ascontiguousarray(out[:real, :k]).view(np.float32)
        gids = np.ascontiguousarray(out[:real, k:])
        out: List[List[Result]] = []
        for qi in range(real):
            out.append(
                [
                    (self.chunks[idx], float(s))
                    for s, idx in zip(scores[qi], gids[qi])
                    if 0 <= idx < len(self.chunks)
                ]
            )
        return out

    def _retrieve_dense_fused(
        self, queries: Sequence[str], top_k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        import jax.numpy as jnp

        enc = self.embedding_model
        texts = [self.query_prefix + q for q in queries]
        real = len(texts)
        pad = (-real) % 8  # batch-shape bucketing limits recompiles
        ids, mask = enc.tokenizer.encode_batch(
            texts + [""] * pad, enc.max_seq_len
        )
        (corpus, scales, refine, sqnorms, stage1, center,
         s1_center, c_sqmax, s1_lo) = self.dense_index.fused_args()
        kk = min(top_k, self.dense_index.ntotal)
        fn = self._fused_dense_fn(kk)
        packed_tok = np.concatenate(
            [ids.astype(np.int32), mask.astype(np.int32)], axis=1
        )
        out = np.asarray(
            fn(
                enc.params, jnp.asarray(packed_tok), corpus, scales,
                refine, sqnorms, stage1, center, s1_center, c_sqmax, s1_lo,
            )
        )
        return (
            np.ascontiguousarray(out[:real, :kk]).view(np.float32),
            np.ascontiguousarray(out[:real, kk:]),
        )

    def retrieve_dense_batch(
        self, queries: Sequence[str], top_k: int = 10
    ) -> List[List[Result]]:
        if self.dense_index is None:
            return [[] for _ in queries]
        if self._fused_supported():
            scores, ids = self._retrieve_dense_fused(queries, top_k)
        else:
            q = self._encode_queries(queries)
            scores, ids = self.dense_index.search(q, top_k)
        out: List[List[Result]] = []
        for qi in range(len(queries)):
            row: List[Result] = []
            for score, idx in zip(scores[qi], ids[qi]):
                if 0 <= idx < len(self.chunks):
                    if self.dense_metric == "l2":
                        # similarity mapping from reference src/retrieval.py:108
                        similarity = 1.0 / (1.0 + float(score))
                    else:
                        similarity = float(score)
                    row.append((self.chunks[idx], similarity))
            out.append(row)
        return out

    def _lexical_batch(
        self, index, queries: Sequence[str], top_k: int
    ) -> List[List[Result]]:
        if index is None:
            return [[] for _ in queries]
        scores, ids = index.search(list(queries), top_k)
        out: List[List[Result]] = []
        for qi in range(len(queries)):
            row = [
                (self.chunks[idx], float(score))
                for score, idx in zip(scores[qi], ids[qi])
                if 0 <= idx < len(self.chunks)
            ]
            out.append(row)
        return out

    def retrieve_bm25_batch(self, queries, top_k: int = 10):
        return self._lexical_batch(self.bm25_index, queries, top_k)

    def retrieve_tfidf_batch(self, queries, top_k: int = 10):
        return self._lexical_batch(self.tfidf_index, queries, top_k)

    def _candidate_embeddings(
        self, candidates: List[List[Result]], flat_texts: List[str]
    ) -> np.ndarray:
        """Embeddings for rerank candidates, flattened in span order.

        Fast path: gather the candidates' STORED vectors from the dense
        index in one device dispatch — re-encoding hundreds of candidate
        texts per batch costs dozens of encoder dispatches (measured to
        dominate hybrid+rerank latency). The path engages only when the
        index rows are known to live in this system's embedding space
        (built by encoding here, or caller-certified embeddings — see
        load_chunks_and_index). Falls back to re-encoding when that
        contract is absent, the index type has no row gather, chunk ids
        are not unique, or a candidate id is unknown."""
        id_map = getattr(self, "_id_to_row", None)
        if (
            self.dense_index is not None
            and id_map is not None
            and getattr(self, "_rows_match_encoder", False)
            and hasattr(self.dense_index, "rows")
        ):
            rows = [
                id_map.get(c.get("id"))
                for cands in candidates
                for c, _ in cands
            ]
            if None not in rows:
                return self.dense_index.rows(np.asarray(rows, np.int64))
        return self.embedding_model.encode(flat_texts)

    def rerank_batch(
        self, queries: Sequence[str], candidates: List[List[Result]]
    ) -> List[List[Result]]:
        """Re-score fused candidates with exact dense cosine similarity
        (one batched encoder pass over all candidate texts) and re-sort.
        The 'rerank' stage of the enhanced hybrid pipeline."""
        if self.embedding_model is None:
            return candidates
        flat_texts: List[str] = []
        spans: List[Tuple[int, int]] = []
        for cands in candidates:
            start = len(flat_texts)
            flat_texts.extend(
                self.passage_prefix + str(c["text"]) for c, _ in cands
            )
            spans.append((start, len(flat_texts)))
        if not flat_texts:
            return candidates
        q_emb = self._encode_queries(queries)
        c_emb = self._candidate_embeddings(candidates, flat_texts)
        out: List[List[Result]] = []
        for qi, (start, end) in enumerate(spans):
            if start == end:
                out.append([])
                continue
            emb = c_emb[start:end]
            q = q_emb[qi]
            denom = np.maximum(
                np.linalg.norm(emb, axis=1) * np.linalg.norm(q), 1e-12
            )
            sims = emb @ q / denom
            order = np.argsort(-sims, kind="stable")
            out.append(
                [(candidates[qi][i][0], float(sims[i])) for i in order]
            )
        return out

    def retrieve_hybrid_batch(
        self,
        queries: Sequence[str],
        top_k: int = 10,
        dense_weight: float = 0.6,
        bm25_weight: float = 0.4,
        rerank: bool = False,
        fused: Optional[bool] = None,
    ) -> List[List[Result]]:
        """Over-retrieve both channels at 2*k, max-normalize per channel,
        weighted-sum, re-rank (reference: src/retrieval.py:174-216).
        rerank=True re-scores the fused top-k with exact dense cosine.

        fused=None (default) auto-selects the one-dispatch device path
        (encode + dense + bm25 + fusion + rerank in a single jit) when
        supported; fused=False forces the host fusion loop."""
        if fused is None:
            fused = self._hybrid_fused_supported()
        # the device rerank gathers STORED rows, so it honors the same
        # provenance contract as the host fast path (_candidate_embeddings)
        rerank_ok = not rerank or getattr(self, "_rows_match_encoder", False)
        if fused and self._hybrid_fused_supported() and rerank_ok:
            return self._retrieve_hybrid_fused(
                queries, top_k, dense_weight, bm25_weight, rerank
            )
        dense = self.retrieve_dense_batch(queries, top_k * 2)
        bm25 = self.retrieve_bm25_batch(queries, top_k * 2)
        out: List[List[Result]] = []
        for qi in range(len(queries)):
            combined: Dict[str, Dict] = {}
            if dense[qi]:
                max_d = max(s for _, s in dense[qi])
                for chunk, score in dense[qi]:
                    norm = score / max_d if max_d > 0 else 0.0
                    combined[chunk["id"]] = {
                        "chunk": chunk,
                        "dense": norm * dense_weight,
                        "bm25": 0.0,
                    }
            if bm25[qi]:
                max_b = max(s for _, s in bm25[qi])
                for chunk, score in bm25[qi]:
                    norm = score / max_b if max_b > 0 else 0.0
                    entry = combined.setdefault(
                        chunk["id"], {"chunk": chunk, "dense": 0.0, "bm25": 0.0}
                    )
                    entry["bm25"] = norm * bm25_weight
            fused = [
                (e["chunk"], e["dense"] + e["bm25"]) for e in combined.values()
            ]
            fused.sort(key=lambda x: x[1], reverse=True)
            out.append(fused[:top_k])
        if rerank:
            out = self.rerank_batch(queries, out)
        return out

    # -- RAG context assembly ----------------------------------------------------

    def get_contexts_for_rag(
        self, query: str, top_k: int = 5, max_context_length: int = 2000
    ) -> Tuple[List[str], List[Dict]]:
        """Budgeted context assembly (reference: src/retrieval.py:240-272)."""
        results = self.retrieve(query, top_k)
        return assemble_contexts(results, max_context_length)

    # -- built-in retrieval eval ---------------------------------------------------

    def evaluate_retrieval_quality(
        self,
        test_queries: List[Dict],
        relevant_chunks: Dict[str, List[str]],
        batch_size: int = 64,
    ) -> Dict[str, float]:
        """Hit@{1,3,5} and MRR@10 (reference: src/retrieval.py:274-323),
        batched on device instead of per-query."""
        hit1, hit3, hit5, mrrs = [], [], [], []
        evaluated = []
        for i, qd in enumerate(test_queries):
            qid = qd.get("id", str(i))
            if relevant_chunks.get(qid):
                evaluated.append((qd["question"], relevant_chunks[qid]))
        for start in range(0, len(evaluated), batch_size):
            batch = evaluated[start : start + batch_size]
            results = self.retrieve_batch([q for q, _ in batch], top_k=10)
            for (query, relevant), res in zip(batch, results):
                ids = [chunk["id"] for chunk, _ in res]
                hit1.append(any(c in relevant for c in ids[:1]))
                hit3.append(any(c in relevant for c in ids[:3]))
                hit5.append(any(c in relevant for c in ids[:5]))
                mrr = 0.0
                for rank, cid in enumerate(ids, 1):
                    if cid in relevant:
                        mrr = 1.0 / rank
                        break
                mrrs.append(mrr)
        return {
            "hit_at_1": float(np.mean(hit1)) if hit1 else 0.0,
            "hit_at_3": float(np.mean(hit3)) if hit3 else 0.0,
            "hit_at_5": float(np.mean(hit5)) if hit5 else 0.0,
            "mrr": float(np.mean(mrrs)) if mrrs else 0.0,
            "total_queries": len(test_queries),
        }

    def cleanup(self) -> None:
        """Release references (reference: src/retrieval.py:325-336)."""
        self.embedding_model = None
        self.dense_index = None
        self.bm25_index = None
        self.tfidf_index = None
        self.chunks = None
        self._fused_cache.clear()
        self.is_ready = False


class MultiModelRetrieval:
    """Compare several embedding models on the same corpus (reference:
    src/retrieval.py:339-389)."""

    def __init__(self, encoders: Dict[str, object], mesh=None):
        self.encoders = encoders
        self.mesh = mesh
        self.retrievers: Dict[str, RetrievalSystem] = {}

    def setup_retrievers(
        self, chunk_file, indices: Optional[Dict[str, str]] = None
    ) -> None:
        for name, encoder in self.encoders.items():
            retriever = RetrievalSystem(
                method="dense", encoder=encoder, mesh=self.mesh
            )
            index_file = (indices or {}).get(name)
            if retriever.load_chunks_and_index(chunk_file, index_file):
                self.retrievers[name] = retriever

    def compare_retrieval_performance(
        self, test_queries: List[Dict], relevant_chunks: Dict[str, List[str]]
    ) -> Dict[str, Dict]:
        return {
            name: r.evaluate_retrieval_quality(test_queries, relevant_chunks)
            for name, r in self.retrievers.items()
        }

    def cleanup_all(self) -> None:
        for retriever in self.retrievers.values():
            retriever.cleanup()
        self.retrievers.clear()
