"""Benchmark: TPU fused flat-search QPS vs CPU flat exact search.

BASELINE.json north star: >=10x FAISS-flat CPU QPS at identical
Recall@10 on the Persian QA corpus scale. faiss is not installed in this
image, so the CPU baseline is the same exact computation (full matmul +
top-k) through NumPy/BLAS — the identical algorithm faiss-flat runs.

Measurement methodology (important on this tunneled-TPU setup): repeated
dispatches of identical (computation, inputs) pairs are served from a
relay cache and host<->device transfers cost ~25-40 ms, so the timed
region is a single jitted ``lax.fori_loop`` that generates a fresh query
batch on device every iteration and folds results into one scalar; one
dispatch + one scalar readback per measurement.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Everything else goes to stderr.
"""
from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


import os

N_DOCS = int(os.environ.get("BENCH_N", 100_000))
DIM = 384          # MiniLM-L12 dimensionality
K = 10
BATCH = 512        # queries per request batch
REPS = 20          # fori_loop iterations inside the timed dispatch
RECALL_QUERIES = 256
CPU_QUERIES = 128  # CPU baseline batch (QPS scales linearly; the host
                   # CPU is shared and slow, so keep its slice small)


def cpu_flat_search(queries: np.ndarray, corpus: np.ndarray, k: int):
    """Exact cosine top-k on CPU (faiss IndexFlatIP-equivalent math)."""
    scores = queries @ corpus.T
    part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
    part_scores = np.take_along_axis(scores, part, axis=1)
    order = np.argsort(-part_scores, axis=1, kind="stable")
    idx = np.take_along_axis(part, order, axis=1)
    return np.take_along_axis(scores, idx, axis=1), idx


def bench_encoder(jax, jnp) -> float:
    """MiniLM-L12-architecture forward throughput (seq 128, batch 128).

    Reference comparison: sentence-transformers encode at ~160 docs/s on
    an RTX 3060 (BASELINE.md, distiluse build row).
    """
    from persian_rag_tpu.models.encoder import EncoderConfig, TransformerEncoder
    from persian_rag_tpu.models.pooling import PoolingHead

    config = EncoderConfig(
        vocab_size=32_000, hidden_size=384, num_layers=12, num_heads=12,
        intermediate_size=1536, max_position_embeddings=512,
        compute_dtype=jnp.bfloat16,
    )
    encoder = TransformerEncoder(config)
    head = PoolingHead(pooling="mean")
    batch, seq, reps = 128, 128, 8
    rng = jax.random.PRNGKey(0)
    params = encoder.init(
        rng, jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32)
    )["params"]

    @jax.jit
    def run(params, seed):
        def body(i, acc):
            key = jax.random.fold_in(jax.random.PRNGKey(1), seed + i)
            ids = jax.random.randint(key, (batch, seq), 1, 32_000)
            mask = jnp.ones((batch, seq), jnp.int32)
            hidden = encoder.apply({"params": params}, ids, mask)
            return acc + jnp.sum(head.apply({"params": {}}, hidden, mask))

        return jax.lax.fori_loop(0, reps, body, 0.0)

    np.asarray(run(params, 0))  # compile + warm
    t0 = time.time()
    np.asarray(run(params, 999))
    dt = (time.time() - t0) / reps
    return batch / dt


def bench_end_to_end(jax, jnp, corpus_dev) -> float:
    """Query-encode (MiniLM-L12 arch, batch 8, seq 32) + fused search —
    the reference's 'dense retrieval latency' measurement shape."""
    import functools

    from persian_rag_tpu.models.encoder import EncoderConfig, TransformerEncoder
    from persian_rag_tpu.models.pooling import PoolingHead
    from persian_rag_tpu.ops.flat_topk import flat_topk_pallas

    config = EncoderConfig(
        vocab_size=32_000, hidden_size=384, num_layers=12, num_heads=12,
        intermediate_size=1536, max_position_embeddings=512,
        compute_dtype=jnp.bfloat16,
    )
    encoder = TransformerEncoder(config)
    head = PoolingHead(pooling="mean", normalize=True)
    params = encoder.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
    )["params"]
    search = functools.partial(
        flat_topk_pallas, k=K, metric="dot", tile_q=8, tile_n=2048,
        compute_dtype=jnp.bfloat16, mode="fast",
    )
    batch, seq, reps = 8, 32, 10

    @jax.jit
    def run(params, c, seed):
        def body(i, acc):
            key = jax.random.fold_in(jax.random.PRNGKey(2), seed + i)
            ids = jax.random.randint(key, (batch, seq), 1, 32_000)
            mask = jnp.ones((batch, seq), jnp.int32)
            hidden = encoder.apply({"params": params}, ids, mask)
            emb = head.apply({"params": {}}, hidden, mask)
            s, idx = search(emb.astype(jnp.float32), c)
            return acc + jnp.sum(s) + jnp.sum(idx).astype(jnp.float32)

        return jax.lax.fori_loop(0, reps, body, 0.0)

    np.asarray(run(params, corpus_dev, 0))
    t0 = time.time()
    np.asarray(run(params, corpus_dev, 777))
    return (time.time() - t0) / reps * 1e3


def main() -> None:
    rng = np.random.default_rng(0)
    log(f"corpus N={N_DOCS} d={DIM}, batch={BATCH}, k={K}")
    corpus = rng.standard_normal((N_DOCS, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)

    # -- CPU baseline ---------------------------------------------------------
    cpu_queries = rng.standard_normal((CPU_QUERIES, DIM)).astype(np.float32)
    cpu_queries /= np.linalg.norm(cpu_queries, axis=1, keepdims=True)
    _ = cpu_flat_search(cpu_queries[:8], corpus, K)  # warm BLAS
    t0 = time.time()
    cpu_flat_search(cpu_queries, corpus, K)
    cpu_time = time.time() - t0
    cpu_qps = CPU_QUERIES / cpu_time
    log(
        f"CPU flat exact: {cpu_time*1e3:.1f} ms / {CPU_QUERIES} q "
        f"-> {cpu_qps:.0f} QPS"
    )

    # -- TPU fused kernel -------------------------------------------------------
    import jax
    import jax.numpy as jnp

    from persian_rag_tpu.ops.flat_topk import flat_topk_pallas

    backend = jax.default_backend()
    log(f"jax backend: {backend}, devices: {jax.devices()}")
    interpret = backend != "tpu"

    probe = rng.standard_normal((RECALL_QUERIES, DIM)).astype(np.float32)
    probe /= np.linalg.norm(probe, axis=1, keepdims=True)
    _, cpu_idx = cpu_flat_search(probe, corpus, K)

    def run_config(name, corpus_dev, **kw):
        search = functools.partial(
            flat_topk_pallas, k=K, metric="dot", interpret=interpret, **kw
        )
        tpu_idx = np.asarray(
            jax.block_until_ready(search(jnp.asarray(probe), corpus_dev))[1]
        )
        recall = float(
            np.mean(
                [
                    len(set(tpu_idx[q]) & set(cpu_idx[q])) / K
                    for q in range(RECALL_QUERIES)
                ]
            )
        )

        @jax.jit
        def timed_loop(c, seed):
            def body(i, acc):
                key = jax.random.fold_in(jax.random.PRNGKey(0), seed + i)
                q = jax.random.normal(key, (BATCH, DIM), jnp.float32)
                s, idx = search(q, c)
                return acc + jnp.sum(s) + jnp.sum(idx).astype(jnp.float32)

            return jax.lax.fori_loop(0, REPS, body, 0.0)

        np.asarray(timed_loop(corpus_dev, 0))  # compile + warm
        t0 = time.time()
        np.asarray(timed_loop(corpus_dev, 10_000))  # fresh seeds
        dt = (time.time() - t0) / REPS
        qps = BATCH / dt
        log(
            f"{name}: {dt*1e3:.2f} ms / {BATCH} q -> {qps:.0f} QPS "
            f"({qps / cpu_qps:.1f}x CPU), Recall@{K}={recall:.4f}"
        )
        return qps, recall

    c32 = jax.device_put(jnp.asarray(corpus))
    # Headline config: bit-exact search — identical Recall@10/MRR to the
    # CPU/FAISS-flat reference by construction.
    exact_qps, exact_recall = run_config(
        "TPU exact f32", c32, tile_q=256, tile_n=1024, mode="exact"
    )
    # Upside config: bf16-resident corpus + packed-key top-k.
    c16 = jax.device_put(jnp.asarray(corpus).astype(jnp.bfloat16))
    fast_qps, fast_recall = run_config(
        "TPU fast bf16",
        c16,
        tile_q=256,
        tile_n=2048,
        compute_dtype=jnp.bfloat16,
        mode="fast",
    )
    del fast_qps, fast_recall  # stderr visibility only

    # -- encoder throughput (docs/sec, BASELINE secondary metric) --------------
    try:
        encode_docs_per_sec = bench_encoder(jax, jnp)
        log(f"MiniLM-L12 encode throughput: {encode_docs_per_sec:.0f} docs/s")
    except Exception as e:
        log(f"encoder bench skipped: {e}")

    # -- end-to-end dense retrieval latency (encode + search) ------------------
    # Reference comparison: 5.9-35 ms per query, encode+flat-search
    # (BASELINE.md "dense retrieval latency" row).
    try:
        e2e_ms = bench_end_to_end(jax, jnp, c16)
        log(
            f"end-to-end dense retrieval (encode batch-8 + fused search, "
            f"N={N_DOCS}): {e2e_ms:.2f} ms/batch = {e2e_ms/8:.2f} ms/query"
        )
    except Exception as e:
        log(f"e2e bench skipped: {e}")

    print(
        json.dumps(
            {
                "metric": (
                    f"flat_search_qps_n{N_DOCS}_d{DIM}_k{K}"
                    f"_recall{exact_recall:.3f}"
                ),
                "value": round(exact_qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(exact_qps / cpu_qps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
