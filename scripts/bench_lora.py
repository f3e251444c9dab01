"""Decoder LoRA SFT throughput on chip (the reference notebook's job).

The reference fine-tunes Llama-3.2-1B with unsloth LoRA (r=32, all
projection modules, train-on-responses-only) on a Colab T4
(notebooks/Fine-tuning llama3.2 with unsloth.ipynb). This measures our
train/lora.py LoraTrainer on the same architecture: steady-state
samples/s and tokens/s at the notebook-like shapes.

Methodology per CLAUDE.md: distinct synthetic QA text per step (the
relay caches identical dispatches); steps pipeline asynchronously and
the final loss readback syncs, so wall/steps over >=16 steps is honest.
LORA_BS / LORA_LEN / LORA_STEPS env override the defaults (8, 256, 24).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from persian_rag_tpu.models.decoder import (
        DecoderConfig,
        LlamaDecoder,
        cast_params,
    )
    from persian_rag_tpu.train.lora import LoraTrainer

    bs = int(os.environ.get("LORA_BS", 8))
    max_len = int(os.environ.get("LORA_LEN", 256))
    steps = int(os.environ.get("LORA_STEPS", 24))
    rank = int(os.environ.get("LORA_RANK", 32))

    config = DecoderConfig.llama32_1b(compute_dtype=jnp.bfloat16)
    t0 = time.time()
    model = LlamaDecoder(config)
    params = cast_params(
        model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)
        )["params"],
        jnp.bfloat16,
    )
    print(f"init {time.time() - t0:.0f}s "
          f"(1B-arch bf16 base, LoRA r={rank}, bs={bs}, len={max_len})",
          flush=True)

    trainer = LoraTrainer(config, params, rank=rank)
    rng = np.random.default_rng(0)
    words = ["سلام", "جهان", "پرسش", "پاسخ", "متن", "داده", "مدل", "زبان"]

    def qa(n):
        return [
            {
                "question": " ".join(
                    rng.choice(words, rng.integers(4, 12))
                ),
                "answer": " ".join(
                    rng.choice(words, rng.integers(16, max(17, max_len // 4)))
                ),
            }
            for _ in range(n)
        ]

    # compile + warmup (2 steps)
    t0 = time.time()
    trainer.fit(qa(2 * bs), epochs=1, batch_size=bs, max_len=max_len,
                log_every=1)
    print(f"warm+compile {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    out = trainer.fit(qa(steps * bs), epochs=1, batch_size=bs,
                      max_len=max_len, log_every=steps)
    dt = time.time() - t0
    n_steps = out["steps"]
    sps = n_steps * bs / dt
    # tokens/s counts the full padded sequence (every position runs
    # forward+backward; the notebook's tokens/s metric does the same)
    tps = sps * max_len
    # rough MFU: fwd+bwd ~ 6 FLOPs per (active param, token); embedding
    # lookup excluded, lm_head included via tied vocab matmul
    n_params = 1.24e9
    tfs = 6 * n_params * tps / 1e12
    print(f"LoRA SFT: {n_steps} steps in {dt:.2f}s -> "
          f"{sps:.1f} samples/s, {tps:.0f} tokens/s (~{tfs:.1f} TF/s)",
          flush=True)
    print(f"final logged loss {out['losses'][-1]:.3f}")


if __name__ == "__main__":
    main()
