"""Batched-decode step-cost microbench (chip A/B for the KV-write path).

Measures generate_batch_device aggregate tok/s at batch 8 plus batch-1.
DEC_ARCH=1b|3b|8b picks the model family (default Llama-1B bf16); big
archs require DEC_QUANTIZE — their float tree cannot exist on one chip,
so weights come from the on-device random quantized init (which is what
throughput measurement needs). Distinct prompts per timed call (the
relay caches identical dispatches); greedy decoding so every run
generates exactly max_tokens (no EOS variance in the denominator).

Context: the round-3 bench measured 567 tok/s aggregate at batch 8 vs
186 tok/s batch-1 — a 14.1 ms batched step vs 5.4 ms single step. The
suspected cost is the per-row ragged KV-cache write (32 XLA scatters
per step: 16 layers x k,v). Run this before/after the scalar-slot
cache-write change to attribute it.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from persian_rag_tpu.gen.generator import TextGenerator
    from persian_rag_tpu.models.decoder import DecoderConfig

    max_tokens = int(os.environ.get("DEC_TOKENS", 64))
    max_len = int(os.environ.get("DEC_MAXLEN", 512))  # 2048 = real RAG window
    qmode = os.environ.get("DEC_QUANTIZE", "0")  # 0 | 1/int8 | 4/int4
    quantize = {"0": False, "1": "int8", "int8": "int8",
                "4": "int4", "int4": "int4"}[qmode]
    fuse = os.environ.get("DEC_FUSE", "0") == "1"
    quant_kv = os.environ.get("DEC_KV", "0") == "1"  # int8 KV cache
    arch = os.environ.get("DEC_ARCH", "1b")  # 1b | 3b | 8b
    config = {
        "1b": DecoderConfig.llama32_1b,
        "3b": DecoderConfig.llama32_3b,
        "8b": DecoderConfig.llama31_8b,
    }[arch](compute_dtype=jnp.bfloat16)
    t0 = time.time()
    if quantize and arch != "1b":
        # big archs: the f32 init tree alone would blow 16 GB HBM (8B:
        # ~32 GB), and a host-side init can't ship over the relay in
        # reasonable time — generate the quantized tree directly on
        # device instead.
        import dataclasses

        from persian_rag_tpu.models.decoder import random_quantized_params

        config = dataclasses.replace(
            config,
            quantized_weights=True,
            quantized_bits=4 if quantize == "int4" else 8,
            quantized_backend="pallas",
        )
        gen = TextGenerator(
            config, params=random_quantized_params(config),
            max_len=max_len, fuse_projections=fuse, quantize_kv=quant_kv,
        )
    else:
        gen = TextGenerator(config, max_len=max_len, quantize=quantize,
                            fuse_projections=fuse, quantize_kv=quant_kv)
    print(
        f"init {time.time()-t0:.0f}s"
        + (f" [{quantize} weight serving]" if quantize else "")
        + (" [int8 KV cache]" if quant_kv else "")
        + (" [fused projections]" if fuse else ""),
        flush=True,
    )

    def prompts(seed, n, base=48):
        r = np.random.default_rng(seed)
        return [list(r.integers(1, 255, base + i)) for i in range(n)]

    # batch-1 reference (device loop). temperature is a runtime arg and
    # lax.cond executes only the taken branch, so greedy vs sampled
    # share one compile. Per-step cost comes from a TWO-POINT fit
    # (max_tokens 16 vs 64): dividing one run's wall time by its token
    # count folds the ~30 ms fixed dispatch overhead into the quotient
    # — and an early-EOS sampled run then reads 2-4x slower than it is
    # (the round-3 'b1 top-p 7.9 ms/step' artifact).
    short = max(max_tokens // 4, 4)
    for mt in (short, max_tokens):
        p1 = prompts(mt, 1)[0]
        t0 = time.time()
        gen.generate_ids_device(p1, max_tokens=mt, temperature=0.0)
        print(f"b1 mt={mt} warm+compile {time.time()-t0:.0f}s", flush=True)
    for temp, tag in ((0.0, "greedy"), (0.7, "top-p 0.9")):
        med = {}
        for mt in (short, max_tokens):
            runs = []
            for s in (2, 3, 4):
                p = prompts(int(10 * temp) + s, 1)[0]
                t0 = time.time()
                out = gen.generate_ids_device(p, max_tokens=mt,
                                              temperature=temp, seed=s)
                runs.append((time.time() - t0, len(out)))
            runs.sort()
            med[mt] = runs[1]
        (dt_s, n_s), (dt_l, n_l) = med[short], med[max_tokens]
        if n_l > n_s:
            step_ms = (dt_l - dt_s) * 1e3 / (n_l - n_s)
        else:  # early EOS collapsed both runs: fall back to quotient
            step_ms = dt_l * 1e3 / max(n_l, 1)
        print(f"batch-1 {tag}: {1e3/step_ms:.0f} tok/s "
              f"({step_ms:.2f} ms/step, two-point fit "
              f"{n_s}/{n_l} tokens)", flush=True)

    # batched ragged (DEC_BATCHES env, default "8")
    for nb in [int(x) for x in
               os.environ.get("DEC_BATCHES", "8").split(",")]:
        t0 = time.time()
        gen.generate_batch_device(prompts(10, nb), max_tokens=max_tokens,
                                  temperature=0.0)
        print(f"b{nb} warm+compile {time.time()-t0:.0f}s", flush=True)
        for temp, tag in ((0.0, "greedy"), (0.7, "top-p 0.9")):
            rates = []
            for s in (11, 12):
                p = prompts(int(10 * temp) + s, nb)
                t0 = time.time()
                outs = gen.generate_batch_device(
                    p, max_tokens=max_tokens, temperature=temp)
                dt = time.time() - t0
                toks = sum(max(len(o), 1) for o in outs)
                rates.append(toks / dt)
            agg = float(np.median(rates))
            print(f"batch-{nb} {tag}: {agg:.0f} tok/s aggregate "
                  f"({nb*1e3/agg:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
