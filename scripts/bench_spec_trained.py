"""Trained speculative acceptance on non-degenerate text (VERDICT r3 #5).

The round-3 speculative numbers were two unrealistic endpoints: echo
prompts (acceptance ~1, 1689 tok/s bound) and random-weight prompts in
the batched scheduler (acceptance ~0). This measures the middle that
production RAG serving actually lives in:

1. quick full-param LM warmup of a small Llama-arch byte decoder on the
   synthetic Persian QA corpus (the stand-in for a pretrained base —
   LoRA on a purely random base cannot learn byte-level Persian),
2. LoRA-SFT (train/lora.py — the reference notebook's recipe: LoRA on
   all projection modules, train-on-responses-only) on the QA pairs
   until the model reliably completes seen answers,
3. measure prompt-lookup speculative acceptance + throughput in the
   BATCHED continuous scheduler (gen/continuous.py) on RAG-style
   prompts whose context quotes the answer — answers that echo
   retrieved context are the regime prompt-lookup drafting targets.

Reference anchor: the notebook's SFT -> llama.cpp serving loop
(SURVEY.md §2.1 row 18-19); llama.cpp ships the same prompt-lookup
("self-speculative") decoding option.

Usage: python scripts/bench_spec_trained.py [--steps 300] [--qa 192]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rag_question(item) -> str:
    """Context-stuffed question: the SFT prompt template is
    "سوال: {question}\nپاسخ: " (train/lora.py PROMPT_TEMPLATE), so the
    retrieved context rides inside the question field — the SAME format
    trains and serves (a format mismatch here measured completion 0.00
    at SFT loss 0.011)."""
    return f"متن: {item['context']} سوال: {item['question']}"


def train_and_measure(
    steps: int = 300,
    qa_n: int = 192,
    sft_epochs: int = 6,
    batch: int = 8,
    max_tokens: int = 64,
    n_requests: int = 32,
    seed: int = 0,
    log=print,
) -> dict:
    """Returns {tpf, accept_tok_s, plain_tok_s, completion_rate, ...}."""
    import jax
    import jax.numpy as jnp
    import optax

    from persian_rag_tpu.data.loader import synthetic_persian_qa
    from persian_rag_tpu.gen.continuous import ContinuousBatcher
    from persian_rag_tpu.gen.generator import ByteTokenizer, TextGenerator
    from persian_rag_tpu.models.decoder import DecoderConfig, LlamaDecoder
    from persian_rag_tpu.train.lora import (
        LoraTrainer,
        build_sft_example,
        pad_batch,
    )

    tok = ByteTokenizer()
    config = DecoderConfig(
        vocab_size=tok.vocab_size + 2,
        hidden_size=256,
        num_layers=4,
        num_heads=4,
        num_kv_heads=4,
        intermediate_size=1024,
        max_position_embeddings=1024,
        rope_theta=10_000.0,
    )
    model = LlamaDecoder(config)
    qa = synthetic_persian_qa(qa_n, seed=seed)

    # ---- 1) LM warmup (full params) on the corpus text ------------------
    from persian_rag_tpu.train.lora import PROMPT_TEMPLATE

    text_ids = []
    for item in qa:
        text_ids.extend(tok.encode(
            PROMPT_TEMPLATE.format(question=rag_question(item))
            + item["answer"]
        ))
        text_ids.append(tok.eos_id)
    text_ids = np.asarray(text_ids, np.int32)
    seq = 192
    rng = np.random.default_rng(seed)
    params = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 8), jnp.int32)
    )["params"]

    optimizer = optax.adamw(3e-3)
    opt_state = optimizer.init(params)

    def lm_loss(p, ids):
        logits = model.apply({"params": p}, ids)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    @jax.jit
    def lm_step(p, o, ids):
        loss, grads = jax.value_and_grad(lm_loss)(p, ids)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    t0 = time.time()
    loss = float("nan")
    for s in range(steps):
        starts = rng.integers(0, len(text_ids) - seq - 1, batch)
        ids = np.stack([text_ids[st : st + seq] for st in starts])
        params, opt_state, loss = lm_step(params, opt_state,
                                          jnp.asarray(ids))
        if s % 50 == 0:
            log(f"warmup step {s}: loss {float(loss):.3f}")
    log(f"warmup {steps} steps in {time.time()-t0:.0f}s, "
        f"final loss {float(loss):.3f}")

    # ---- 2) LoRA SFT on the QA pairs (train-on-responses-only) ----------
    sft_items = [
        {"question": rag_question(it), "answer": it["answer"]}
        for it in qa
    ]
    trainer = LoraTrainer(config, params, rank=32, tokenizer=tok)
    t0 = time.time()
    # max_len must cover prompt + answer: the context-stuffed prompt
    # alone runs ~430 UTF-8 bytes — a 256 cap truncated away EVERY
    # response token (loss exactly 0.000 over zero valid labels,
    # completion 0.00 — measured)
    out = trainer.fit(
        sft_items, epochs=sft_epochs, batch_size=batch, max_len=512,
        learning_rate=1e-3, log_every=16,
    )
    log(f"LoRA SFT: {out['steps']} steps in {time.time()-t0:.0f}s, "
        f"losses {['%.3f' % l for l in out['losses'][-4:]]}")
    merged = trainer.merged_params()

    # ---- completion check: does greedy complete seen answers? -----------
    gen = TextGenerator(config, params=merged, tokenizer=tok, max_len=640)
    hits = 0
    n_eval = 8
    for item in qa[:n_eval]:
        out_txt = gen.generate_text(
            PROMPT_TEMPLATE.format(question=rag_question(item)),
            max_tokens=max_tokens, temperature=0.0,
        )
        if item["answer"][:20] in out_txt:
            hits += 1
    completion = hits / n_eval
    log(f"greedy completion rate on seen prompts: {completion:.2f}")

    # ---- 3) batched continuous scheduler: plain vs speculative ----------
    def run(speculative: bool, offset: int):
        b = ContinuousBatcher(
            gen, batch=batch, segment=32, speculative=speculative,
        )
        prompts = [
            tok.encode(PROMPT_TEMPLATE.format(
                question=rag_question(qa[(offset + i) % len(qa)])
            ))
            for i in range(n_requests)
        ]
        # warm the compiles with a couple requests
        for p in prompts[:2]:
            b.submit(p, max_tokens=8)
        b.run_until_drained()
        if speculative:
            b.spec_stats = {"tokens": 0, "forwards": 0, "row_forwards": 0}
        t0 = time.time()
        for p in prompts:
            b.submit(p, max_tokens=max_tokens)
        done = b.run_until_drained()
        dt = time.time() - t0
        n_tok = sum(len(r.tokens) for r in done)
        tpf = (
            b.spec_stats["tokens"] / max(b.spec_stats["forwards"], 1)
            if speculative else 1.0
        )
        return n_tok / dt, tpf, n_tok

    plain_tok_s, _, n1 = run(False, 0)
    spec_tok_s, tpf, n2 = run(True, 7)
    log(
        f"continuous batch-{batch}: plain {plain_tok_s:.0f} tok/s, "
        f"speculative {spec_tok_s:.0f} tok/s (accepted tokens/forward "
        f"{tpf:.2f}; {n1}/{n2} tokens)"
    )
    return {
        "tpf": round(tpf, 3),
        "spec_tok_s": round(spec_tok_s, 1),
        "plain_tok_s": round(plain_tok_s, 1),
        "completion_rate": round(completion, 3),
        "warmup_loss": round(float(loss), 4),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--qa", type=int, default=192)
    parser.add_argument("--epochs", type=int, default=6)
    parser.add_argument("--requests", type=int, default=32)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"backend={jax.default_backend()}", flush=True)
    out = train_and_measure(
        steps=args.steps, qa_n=args.qa, sft_epochs=args.epochs,
        n_requests=args.requests,
        log=lambda *a: print(*a, flush=True),
    )
    print(out, flush=True)


if __name__ == "__main__":
    main()
