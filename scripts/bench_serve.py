"""End-to-end RAG serving benchmark: HTTP -> micro-batcher -> one-dispatch
hybrid retrieval, on one chip.

Drives serve/api.RetrievalServer (stdlib ThreadingHTTPServer + request
coalescing) with closed-loop client threads posting single-query /search
requests (fresh random query text per request — the relay caches repeated
identical dispatches), and reports requests/s, latency p50/p99, and the
achieved micro-batch group size per concurrency level.

The retrieval stack is the bench.py hybrid configuration: MiniLM-L12
architecture encoder (hash tokenizer), 100k-doc corpus with precomputed
normalized embeddings, hybrid 0.6/0.4 fusion + rerank in one fused
dispatch. Group sizes pad to multiples of 8 (the fused path's batch
buckets), so every reachable compile shape is warmed before timing.

Usage: python scripts/bench_serve.py [--n 100000] [--max-batch 32]
  [--levels 1,16,64] [--secs 15]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--max-batch", type=int, default=32)
    parser.add_argument("--max-wait-ms", type=float, default=5.0)
    parser.add_argument("--levels", type=str, default="1,16,64")
    parser.add_argument("--secs", type=float, default=15.0)
    parser.add_argument("--top-k", type=int, default=10)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from persian_rag_tpu.models.encoder import EncoderConfig
    from persian_rag_tpu.models.sentence_encoder import SentenceEncoder
    from persian_rag_tpu.models.tokenizer import HashTokenizer
    from persian_rag_tpu.retrieval.system import RetrievalSystem
    from persian_rag_tpu.serve.api import RetrievalServer

    print(f"backend={jax.default_backend()} N={args.n} "
          f"max_batch={args.max_batch}", flush=True)
    rng = np.random.default_rng(11)
    chunks = [
        {"id": i,
         "text": " ".join(str(x) for x in rng.integers(0, 30_000, 12))}
        for i in range(args.n)
    ]
    emb = rng.standard_normal((args.n, 384)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    config = EncoderConfig(
        vocab_size=32_000, hidden_size=384, num_layers=12, num_heads=12,
        intermediate_size=1536, max_position_embeddings=512,
        compute_dtype=jnp.bfloat16,
    )
    encoder = SentenceEncoder(
        config, tokenizer=HashTokenizer(32_000), max_seq_len=32
    )
    rs = RetrievalSystem(
        method="hybrid", encoder=encoder, dense_metric="cosine"
    )
    t0 = time.time()
    rs.load_chunks_and_index(chunks, embeddings=emb)
    print(f"index build+upload {time.time()-t0:.0f}s", flush=True)
    assert rs._hybrid_fused_supported()

    # warm every batch bucket the coalescer can produce (multiples of 8
    # after padding; a cold compile mid-load-test would serialize every
    # in-flight request behind a 30s-5min relay compile)
    def qtexts(seed, count):
        r = np.random.default_rng(seed)
        return [" ".join(str(x) for x in r.integers(0, 30_000, 8))
                for _ in range(count)]

    for bi, b in enumerate(range(8, args.max_batch + 1, 8)):
        t0 = time.time()
        rs.retrieve_hybrid_batch(qtexts(1000 + bi, b), args.top_k)
        print(f"warm bucket {b}: {time.time()-t0:.0f}s", flush=True)

    server = RetrievalServer(
        rs, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms
    ).start()
    url = server.url + "/search"
    print(f"serving at {server.url}", flush=True)

    def one_request(seed):
        body = json.dumps(
            {"queries": qtexts(seed, 1), "top_k": args.top_k}
        ).encode()
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"}
        )
        t0 = time.time()
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        dt = time.time() - t0
        assert len(out["results"][0]) == args.top_k
        return dt

    for level in (int(x) for x in args.levels.split(",")):
        lats: list = []
        stop = time.time() + args.secs
        b0, r0 = server.batches_served, server.requests_served
        lock = threading.Lock()

        def client(tid):
            s = 10_000 + tid * 100_000
            while time.time() < stop:
                s += 1
                dt = one_request(s)
                with lock:
                    lats.append(dt)

        threads = [
            threading.Thread(target=client, args=(t,)) for t in range(level)
        ]
        t_start = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t_start
        db = server.batches_served - b0
        dr = server.requests_served - r0
        arr = np.array(lats)
        print(
            f"concurrency {level:3d}: {len(lats)/wall:7.1f} req/s  "
            f"p50 {np.percentile(arr, 50)*1e3:6.1f} ms  "
            f"p99 {np.percentile(arr, 99)*1e3:6.1f} ms  "
            f"avg group {dr/max(db,1):.1f}",
            flush=True,
        )

    server.stop()


if __name__ == "__main__":
    main()
