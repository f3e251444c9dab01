"""Benchmark: TPU fused flat-search QPS vs CPU flat exact search.

The BASELINE.json north star: >=10x FAISS-flat CPU QPS at identical
Recall@10 on the Persian QA corpus scale. faiss is not installed in this
image, so the CPU baseline is the same exact computation (full matmul +
top-k) through NumPy/BLAS — the identical algorithm faiss-flat runs, on
all host cores.

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


N_DOCS = 200_000
DIM = 384          # MiniLM-L12 dimensionality
N_QUERIES = 256
K = 10
BATCH = 64         # queries per request batch
REPS = 30


def cpu_flat_search(queries: np.ndarray, corpus: np.ndarray, k: int):
    """Exact cosine top-k on CPU (faiss IndexFlatIP-equivalent math)."""
    scores = queries @ corpus.T
    part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
    part_scores = np.take_along_axis(scores, part, axis=1)
    order = np.argsort(-part_scores, axis=1, kind="stable")
    idx = np.take_along_axis(part, order, axis=1)
    return np.take_along_axis(scores, idx, axis=1), idx


def main() -> None:
    rng = np.random.default_rng(0)
    log(f"corpus N={N_DOCS} d={DIM}, {N_QUERIES} queries, k={K}")
    corpus = rng.standard_normal((N_DOCS, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((N_QUERIES, DIM)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    # -- CPU baseline --------------------------------------------------------
    _ = cpu_flat_search(queries[:8], corpus, K)  # warm BLAS
    t0 = time.time()
    cpu_reps = 3
    for _ in range(cpu_reps):
        _, cpu_idx = cpu_flat_search(queries, corpus, K)
    cpu_time = (time.time() - t0) / cpu_reps
    cpu_qps = N_QUERIES / cpu_time
    log(f"CPU flat exact: {cpu_time*1e3:.1f} ms / {N_QUERIES} q -> {cpu_qps:.0f} QPS")

    # -- TPU fused kernel ------------------------------------------------------
    import jax
    import jax.numpy as jnp

    from persian_rag_tpu.ops.flat_topk import flat_topk_pallas

    backend = jax.default_backend()
    log(f"jax backend: {backend}, devices: {jax.devices()}")
    corpus_dev = jax.device_put(jnp.asarray(corpus))
    queries_dev = jnp.asarray(queries)

    search = jax.jit(
        functools.partial(
            flat_topk_pallas, k=K, metric="dot", interpret=backend != "tpu"
        )
    )
    # warm-up / compile
    s, i = search(queries_dev[:BATCH], corpus_dev)
    jax.block_until_ready((s, i))

    # recall parity check vs CPU exact
    tpu_idx = np.asarray(
        jax.block_until_ready(search(queries_dev, corpus_dev))[1]
    )
    recall = np.mean(
        [
            len(set(tpu_idx[q]) & set(cpu_idx[q])) / K
            for q in range(N_QUERIES)
        ]
    )
    log(f"Recall@{K} vs CPU exact: {recall:.4f}")

    t0 = time.time()
    for rep in range(REPS):
        start = (rep * BATCH) % (N_QUERIES - BATCH + 1)
        s, i = search(queries_dev[start : start + BATCH], corpus_dev)
    jax.block_until_ready((s, i))
    tpu_time = (time.time() - t0) / REPS
    tpu_qps = BATCH / tpu_time
    log(
        f"TPU fused flat search: {tpu_time*1e3:.2f} ms / {BATCH} q "
        f"-> {tpu_qps:.0f} QPS ({tpu_qps / cpu_qps:.1f}x CPU)"
    )

    print(
        json.dumps(
            {
                "metric": f"flat_search_qps_n{N_DOCS}_d{DIM}_k{K}_recall{recall:.3f}",
                "value": round(tpu_qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(tpu_qps / cpu_qps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
