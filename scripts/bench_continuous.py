"""A/B: static micro-batch serving vs continuous batching (one chip).

Workload: 32 greedy requests, prompt lengths in one 64-token bucket,
ragged budgets uniform in [16, 128] (the shape that hurts the static
group barrier: every row in a group pays the group's longest budget).
Useful tokens are identical both ways (random 128k-vocab weights never
sample EOS), so useful-token throughput isolates the scheduler.

Static serving mirrors the server's group path (generate_batch_device
at the group's max budget, rounded up to 32 so compile count stays
bounded — the real server buckets budgets the same way for the same
reason). Continuous uses ContinuousBatcher(batch=8, segment=32).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from persian_rag_tpu.gen.continuous import ContinuousBatcher
    from persian_rag_tpu.gen.generator import TextGenerator
    from persian_rag_tpu.models.decoder import DecoderConfig

    n_req = int(os.environ.get("CB_REQUESTS", 32))
    batch = int(os.environ.get("CB_BATCH", 8))
    segment = int(os.environ.get("CB_SEGMENT", 32))
    rng = np.random.default_rng(7)

    config = DecoderConfig.llama32_1b(compute_dtype=jnp.bfloat16)
    t0 = time.time()
    gen = TextGenerator(config, max_len=512)
    print(f"init {time.time()-t0:.0f}s", flush=True)

    def make_requests(seed):
        r = np.random.default_rng(seed)
        prompts = [
            list(r.integers(1, 255, int(r.integers(40, 64))))
            for _ in range(n_req)
        ]
        budgets = [int(b) for b in r.integers(16, 129, n_req)]
        return prompts, budgets

    def run_static(prompts, budgets):
        total = 0
        t0 = time.time()
        for g in range(0, n_req, batch):
            gp, gb = prompts[g:g + batch], budgets[g:g + batch]
            mt = -(-max(gb) // 32) * 32
            outs = gen.generate_batch_device(gp, max_tokens=mt,
                                             temperature=0.0)
            total += sum(min(len(o), b) for o, b in zip(outs, gb))
        return total, time.time() - t0

    def run_continuous(prompts, budgets, speculative=False):
        cb = ContinuousBatcher(gen, batch=batch, segment=segment,
                               speculative=speculative)
        t0 = time.time()
        for p, b in zip(prompts, budgets):
            cb.submit(p, max_tokens=b)
        done = cb.run_until_drained()
        dt = time.time() - t0
        s = cb.spec_stats
        tpf = s["tokens"] / max(s["forwards"], 1)
        return sum(len(r.tokens) for r in done), dt, tpf

    # -- warm all compiled shapes (relay compiles are 30s-5min) ------------
    wp, wb = make_requests(1)
    t0 = time.time()
    run_continuous(wp[:batch], wb[:batch])
    print(f"continuous warm {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    run_continuous(wp[:batch], wb[:batch], speculative=True)
    print(f"speculative warm {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    for mt in (32, 64, 96, 128):  # every rounded group max a trial can hit
        gen.generate_batch_device(wp[:batch], max_tokens=mt,
                                  temperature=0.0)
    print(f"static warm {time.time()-t0:.0f}s", flush=True)

    # -- timed runs on fresh prompts ---------------------------------------
    for trial in (2, 3):
        prompts, budgets = make_requests(trial * 100)
        st_tok, st_s = run_static(prompts, budgets)
        ct_tok, ct_s, _ = run_continuous(prompts, budgets)
        sp_tok, sp_s, tpf = run_continuous(prompts, budgets,
                                           speculative=True)
        useful = sum(budgets)
        print(
            f"trial {trial}: useful {useful} tok | "
            f"static {st_tok} tok in {st_s:.2f}s = {useful/st_s:.0f} "
            f"useful tok/s | continuous {ct_tok} tok in {ct_s:.2f}s = "
            f"{useful/ct_s:.0f} useful tok/s ({st_s/ct_s:.2f}x) | "
            f"+speculative {sp_tok} tok in {sp_s:.2f}s = "
            f"{useful/sp_s:.0f} useful tok/s ({st_s/sp_s:.2f}x, "
            f"tpf {tpf:.2f})",
            flush=True,
        )

    # -- long-ragged trial: budgets 32..447, the regime the group
    # barrier actually hurts (a group pays its longest member; mean/max
    # ~0.55). Static rounds budgets to the coarse grid a compile-bounded
    # server would use.
    grid = (128, 256, 384, 447)
    t0 = time.time()
    for mt in grid:
        gen.generate_batch_device(wp[:batch], max_tokens=mt,
                                  temperature=0.0)
    print(f"static long warm {time.time()-t0:.0f}s", flush=True)

    def run_static_long(prompts, budgets):
        total = 0
        t0 = time.time()
        for g in range(0, n_req, batch):
            gp, gb = prompts[g:g + batch], budgets[g:g + batch]
            mt = min(m for m in grid if m >= max(gb))
            outs = gen.generate_batch_device(gp, max_tokens=mt,
                                             temperature=0.0)
            total += sum(min(len(o), b) for o, b in zip(outs, gb))
        return total, time.time() - t0

    r = np.random.default_rng(555)
    prompts = [
        list(r.integers(1, 255, int(r.integers(40, 64))))
        for _ in range(n_req)
    ]
    budgets = [int(b) for b in r.integers(32, 448, n_req)]
    useful = sum(budgets)
    st_tok, st_s = run_static_long(prompts, budgets)
    ct_tok, ct_s, _ = run_continuous(prompts, budgets)
    sp_tok, sp_s, tpf = run_continuous(prompts, budgets, speculative=True)
    print(
        f"long trial: useful {useful} tok | static {useful/st_s:.0f} "
        f"useful tok/s | continuous {useful/ct_s:.0f} ({st_s/ct_s:.2f}x) "
        f"| +speculative {useful/sp_s:.0f} ({st_s/sp_s:.2f}x, tpf "
        f"{tpf:.2f})",
        flush=True,
    )

    # echo-regime trial: prompts that repeat an answer-like pattern (the
    # RAG regime — answers quote retrieved context), where prompt-lookup
    # acceptance should lift the speculative arm well above 1x
    r = np.random.default_rng(999)
    base = list(r.integers(1, 255, 24))
    prompts = [
        (base * 4)[: int(r.integers(48, 64))] for _ in range(n_req)
    ]
    budgets = [int(b) for b in r.integers(16, 129, n_req)]
    ct_tok, ct_s, _ = run_continuous(prompts, budgets)
    sp_tok, sp_s, tpf = run_continuous(prompts, budgets, speculative=True)
    useful = sum(budgets)
    print(
        f"echo trial: useful {useful} tok | continuous "
        f"{useful/ct_s:.0f} tok/s | +speculative {useful/sp_s:.0f} "
        f"tok/s ({ct_s/sp_s:.2f}x, tpf {tpf:.2f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
