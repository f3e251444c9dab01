"""High-level sentence encoder: tokenize -> jitted forward -> pooled vectors.

The TPU-native replacement for the reference's SentenceTransformer usage
(reference: src/embedding_trainer.py:143-144 encode_texts,
src/create_embeddings.py:88-101 batch encode, src/retrieval.py:98 query
encode). Batches run under jit with bucketed static shapes; with a mesh,
batches shard over the ``data`` axis (pure data parallelism — the
reference's only throughput lever was batch size on one GPU).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from persian_rag_tpu.core.mesh import DATA_AXIS
from persian_rag_tpu.models.encoder import EncoderConfig, TransformerEncoder
from persian_rag_tpu.models.pooling import PoolingHead
from persian_rag_tpu.models.tokenizer import HashTokenizer, TokenizerBase


class SentenceEncoder:
    def __init__(
        self,
        config: EncoderConfig,
        params: Optional[Dict] = None,
        pooling: str = "mean",
        projection_dim: Optional[int] = None,
        normalize: bool = False,
        projection_params: Optional[Dict] = None,
        tokenizer: Optional[TokenizerBase] = None,
        mesh: Optional[Mesh] = None,
        max_seq_len: int = 128,
        seed: int = 0,
    ):
        self.config = config
        self.mesh = mesh
        self.max_seq_len = max_seq_len
        self.tokenizer = tokenizer or HashTokenizer(config.vocab_size)
        self.encoder = TransformerEncoder(config)
        self.head = PoolingHead(
            pooling=pooling,
            projection_dim=projection_dim,
            normalize=normalize,
        )
        self.dim = projection_dim or config.hidden_size

        if params is None:
            rng = jax.random.PRNGKey(seed)
            dummy = jnp.zeros((1, 8), jnp.int32)
            params = self.encoder.init(rng, dummy, jnp.ones((1, 8), jnp.int32))[
                "params"
            ]
        head_params = projection_params
        if head_params is None:
            rng = jax.random.PRNGKey(seed + 1)
            dummy_h = jnp.zeros((1, 8, config.hidden_size), jnp.float32)
            init = self.head.init(rng, dummy_h, jnp.ones((1, 8), jnp.int32))
            head_params = init.get("params", {})
        self.params = {"encoder": params, "head": head_params}
        self._jit_cache: Dict[Any, Any] = {}

    # -- loading ------------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        model_dir: str,
        tokenizer: Optional[TokenizerBase] = None,
        **kwargs,
    ) -> "SentenceEncoder":
        """Load a local sentence-transformers model directory."""
        from persian_rag_tpu.models.hf_loader import load_sentence_transformer
        from persian_rag_tpu.models.tokenizer import HFTokenizer

        config, params, pooling = load_sentence_transformer(model_dir)
        if tokenizer is None:
            try:
                tokenizer = HFTokenizer(model_dir)
            except Exception:
                tokenizer = HashTokenizer(config.vocab_size)
        return cls(
            config,
            params=params,
            pooling=pooling["pooling"],
            projection_dim=pooling.get("projection_dim"),
            normalize=pooling.get("normalize", False),
            projection_params=pooling.get("projection_params"),
            tokenizer=tokenizer,
            **kwargs,
        )

    # -- forward ------------------------------------------------------------

    def _forward_fn(self):
        encoder, head = self.encoder, self.head

        def forward(params, input_ids, attention_mask):
            hidden = encoder.apply(
                {"params": params["encoder"]}, input_ids, attention_mask
            )
            return head.apply(
                {"params": params["head"]}, hidden, attention_mask
            )

        return forward

    def _jitted(self):
        key = "fwd"
        if key not in self._jit_cache:
            fwd = self._forward_fn()
            if self.mesh is not None:
                data = NamedSharding(self.mesh, P(DATA_AXIS))
                repl = NamedSharding(self.mesh, P())
                fwd = jax.jit(
                    fwd,
                    in_shardings=(repl, data, data),
                    out_shardings=repl,
                )
            else:
                fwd = jax.jit(fwd)
            self._jit_cache[key] = fwd
        return self._jit_cache[key]

    def encode(
        self,
        texts: Sequence[str],
        batch_size: int = 32,
        prefix: Optional[str] = None,
        show_progress: bool = False,
    ) -> np.ndarray:
        """Encode a list of texts to an (N, dim) float32 matrix."""
        if isinstance(texts, str):
            texts = [texts]
        if prefix:
            texts = [prefix + t for t in texts]
        n = len(texts)
        if n == 0:
            return np.zeros((0, self.dim), np.float32)
        if self.mesh is not None:
            dp = self.mesh.shape[DATA_AXIS]
            batch_size = max(batch_size, dp)
            batch_size -= batch_size % dp
        fwd = self._jitted()
        out = np.zeros((n, self.dim), np.float32)
        for start in range(0, n, batch_size):
            chunk = list(texts[start : start + batch_size])
            real = len(chunk)
            if real < batch_size:
                chunk = chunk + [""] * (batch_size - real)  # shape stability
            ids, mask = self.tokenizer.encode_batch(chunk, self.max_seq_len)
            emb = fwd(self.params, jnp.asarray(ids), jnp.asarray(mask))
            out[start : start + real] = np.asarray(emb)[:real]
            if show_progress and (start // batch_size) % 10 == 0:
                print(f"  encoded {min(start + batch_size, n)}/{n}")
        return out

    def encode_robust(
        self, texts: Sequence[str], batch_size: int = 32
    ) -> Tuple[np.ndarray, Dict[str, int]]:
        """Encode with a failure-fallback chain (the TPU analog of the
        reference's GPU -> CPU small-batch -> zero-vector chain,
        scripts/phase3_pdf_chunking.py:132-203): full batch -> per-item
        retry -> zero vectors, with failure accounting.

        Returns (embeddings, {"failed": n, "fallback_items": m}).
        """
        stats = {"failed": 0, "fallback_items": 0}
        try:
            return self.encode(texts, batch_size=batch_size), stats
        except Exception:
            pass
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, text in enumerate(texts):
            try:
                out[i] = self.encode([text])[0]
                stats["fallback_items"] += 1
            except Exception:
                stats["failed"] += 1  # leave the zero vector
        return out, stats

    def similarity(self, text1: str, text2: str) -> float:
        """Cosine similarity between two texts (reference:
        src/embedding_trainer.py:146-152)."""
        emb = self.encode([text1, text2])
        a, b = emb[0], emb[1]
        denom = max(float(np.linalg.norm(a) * np.linalg.norm(b)), 1e-12)
        return float(a @ b / denom)
