"""A/B: fused q/k/v + gate/up serving projections vs unfused (Llama-1B
arch, bf16, one chip).

Batch-1 decode is weight-stream-bound at ~520 GB/s whole-step while the
individual 8-MB layer matmuls run far below stream rate in isolation
(scripts/bench_int8_matvec.py) — fewer, larger weight reads (7 -> 4
matmuls/layer) may lift the achieved stream. Measures plain greedy
batch-1 and batch-8 tok/s both ways, distinct prompts per timed call.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from persian_rag_tpu.gen.generator import TextGenerator
    from persian_rag_tpu.models.decoder import DecoderConfig

    max_tokens = int(os.environ.get("DEC_TOKENS", 64))
    config = DecoderConfig.llama32_1b(compute_dtype=jnp.bfloat16)

    def prompts(seed, n, base=48):
        r = np.random.default_rng(seed)
        return [list(r.integers(1, 255, base + i)) for i in range(n)]

    results = {}
    for fused in (False, True):
        tag = "fused" if fused else "unfused"
        t0 = time.time()
        gen = TextGenerator(config, max_len=512, fuse_projections=fused)
        print(f"[{tag}] init {time.time()-t0:.0f}s", flush=True)

        t0 = time.time()
        gen.generate_ids_device(prompts(1, 1)[0], max_tokens=max_tokens,
                                speculative=False)
        print(f"[{tag}] b1 warm+compile {time.time()-t0:.0f}s", flush=True)
        rates = []
        for s in (2, 3, 4):
            p = prompts(s, 1)[0]
            t0 = time.time()
            out = gen.generate_ids_device(p, max_tokens=max_tokens,
                                          speculative=False)
            rates.append(max(len(out), 1) / (time.time() - t0))
        r1 = float(np.median(rates))
        print(f"[{tag}] batch-1 greedy: {r1:.0f} tok/s "
              f"({1e3/r1:.2f} ms/step)", flush=True)

        t0 = time.time()
        gen.generate_batch_device(prompts(10, 8), max_tokens=max_tokens,
                                  temperature=0.0)
        print(f"[{tag}] b8 warm+compile {time.time()-t0:.0f}s", flush=True)
        rates = []
        for s in (11, 12):
            t0 = time.time()
            outs = gen.generate_batch_device(
                prompts(s, 8), max_tokens=max_tokens, temperature=0.0)
            rates.append(sum(max(len(o), 1) for o in outs)
                         / (time.time() - t0))
        r8 = float(np.median(rates))
        print(f"[{tag}] batch-8 greedy: {r8:.0f} tok/s aggregate "
              f"({8e3/r8:.2f} ms/step)", flush=True)
        results[tag] = (r1, r8)
        del gen

    u, f = results["unfused"], results["fused"]
    print(f"summary: b1 {u[0]:.0f} -> {f[0]:.0f} tok/s ({f[0]/u[0]:.2f}x), "
          f"b8 {u[1]:.0f} -> {f[1]:.0f} tok/s ({f[1]/u[1]:.2f}x)",
          flush=True)


if __name__ == "__main__":
    main()
