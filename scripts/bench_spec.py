"""Prompt-lookup speculative decoding chip bench (Llama-1B arch, bf16).

Batch-1 greedy decode is weight-stream-bound (~4.7-5.4 ms/step: every
step reads all ~2.4 GB of bf16 weights), so a (G+1)-token verify
forward should cost nearly the same as a 1-token step and each accepted
draft is a ~free token. Acceptance depends on the model echoing its
prompt, which random weights never do, so this measures BOTH bounds:

* random weights + random prompt  -> acceptance ~0: the spec loop's
  worst case (pure verify overhead per emitted token);
* zeroed layer outputs (residual stream = raw embedding -> greedy
  repeats the last token; the weight stream per forward is unchanged)
  -> acceptance ~1: every draft accepted, the upper bound.

Real RAG answers (quoting retrieved context) sit in between; published
prompt-lookup results on summarization/RAG see 2-3x. The printed
ms/forward numbers let any acceptance rate a be converted:
  tok/s = (1 + a*G) / ms_verify_forward.

Distinct prompts per timed call (the relay caches identical dispatches);
greedy so every run emits exactly max_tokens.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def zero_layer_params(params):
    import jax
    import jax.numpy as jnp

    p = jax.tree.map(lambda x: x, params)
    for name, layer in p.items():
        if not name.startswith("layer_"):
            continue
        for path in (("attention", "o_proj"), ("mlp", "down_proj")):
            node = layer
            for k in path:
                node = node[k]
            # float layout has "kernel"; quantized serving has "values"
            # (zeroed int8/int4 values zero the projection just the same)
            key = "kernel" if "kernel" in node else "values"
            node[key] = jnp.zeros_like(node[key])
    return p


def main():
    import jax.numpy as jnp

    from persian_rag_tpu.gen.generator import TextGenerator
    from persian_rag_tpu.models.decoder import DecoderConfig

    max_tokens = int(os.environ.get("SPEC_TOKENS", 128))
    G = int(os.environ.get("SPEC_G", 7))
    qmode = os.environ.get("SPEC_QUANTIZE", "0")
    quantize = {"0": False, "1": "int8", "int8": "int8",
                "4": "int4", "int4": "int4"}[qmode]
    config = DecoderConfig.llama32_1b(compute_dtype=jnp.bfloat16)
    t0 = time.time()
    gen = TextGenerator(config, max_len=512, quantize=quantize)
    print(
        f"init {time.time()-t0:.0f}s"
        + (f" [{quantize} weight serving]" if quantize else ""),
        flush=True,
    )

    def prompt(seed, base=48):
        r = np.random.default_rng(seed)
        return list(r.integers(1, 255, base))

    def rep_prompt(seed, base=48):
        r = np.random.default_rng(seed)
        cyc = list(r.integers(1, 255, 4))
        return (cyc * (base // 4 + 1))[:base]

    # ---- plain greedy baseline
    t0 = time.time()
    gen.generate_ids_device(prompt(1), max_tokens=max_tokens,
                            speculative=False)
    print(f"plain warm+compile {time.time()-t0:.0f}s", flush=True)
    rates = []
    for s in (2, 3, 4):
        p = prompt(s)
        t0 = time.time()
        out = gen.generate_ids_device(p, max_tokens=max_tokens,
                                      speculative=False)
        rates.append(max(len(out), 1) / (time.time() - t0))
    plain = float(np.median(rates))
    print(f"plain greedy: {plain:.0f} tok/s ({1e3/plain:.2f} ms/step)",
          flush=True)

    # ---- speculative, random weights (acceptance ~0 bound)
    t0 = time.time()
    gen.generate_ids_spec(prompt(1), max_tokens=max_tokens, draft_len=G)
    print(f"spec warm+compile {time.time()-t0:.0f}s", flush=True)
    rates, tpfs = [], []
    for s in (5, 6, 7):
        p = prompt(s)
        t0 = time.time()
        out = gen.generate_ids_spec(p, max_tokens=max_tokens, draft_len=G)
        dt = time.time() - t0
        rates.append(max(len(out), 1) / dt)
        st = gen.last_spec_stats
        tpfs.append(st["tokens_per_forward"])
        ms_fwd = 1e3 * dt / st["forwards"]
        print(f"  seed {s}: {st['tokens']} tok / {st['forwards']} fwd "
              f"(tpf {st['tokens_per_forward']:.2f}), "
              f"{ms_fwd:.2f} ms/forward", flush=True)
    lo = float(np.median(rates))
    print(f"spec G={G} random (acceptance~0): {lo:.0f} tok/s "
          f"(tpf {np.median(tpfs):.2f})", flush=True)

    # ---- speculative, degenerate repetition (acceptance ~1 bound)
    gen.params = zero_layer_params(gen.params)
    rates, tpfs = [], []
    for s in (8, 9, 10):
        p = rep_prompt(s)
        t0 = time.time()
        out = gen.generate_ids_spec(p, max_tokens=max_tokens, draft_len=G)
        dt = time.time() - t0
        rates.append(max(len(out), 1) / dt)
        st = gen.last_spec_stats
        tpfs.append(st["tokens_per_forward"])
        ms_fwd = 1e3 * dt / st["forwards"]
        print(f"  seed {s}: {st['tokens']} tok / {st['forwards']} fwd "
              f"(tpf {st['tokens_per_forward']:.2f}), "
              f"{ms_fwd:.2f} ms/forward", flush=True)
    hi = float(np.median(rates))
    print(f"spec G={G} repetitive (acceptance~1): {hi:.0f} tok/s "
          f"(tpf {np.median(tpfs):.2f})", flush=True)
    print(f"summary: plain {plain:.0f} | spec lo {lo:.0f} | "
          f"spec hi {hi:.0f} tok/s "
          f"({hi/plain:.2f}x upper bound, {lo/plain:.2f}x worst case)",
          flush=True)


if __name__ == "__main__":
    main()
