"""Fine-tune throughput for all three reference backbones on chip.

BASELINE.md's phase1 rows: MiniLM 108-115.6, distiluse 84.5-92.0,
e5-base 26.9-27.2 samples/s on an RTX 3060 (bs 16, identical
example-construction policy). This measures EmbeddingTrainer.fine_tune
end-to-end — host tokenization + dp train step + per-step loss
readback — i.e. the real pipeline throughput, not a bare-step number.

Usage: python scripts/bench_train.py [--batch 64] [--steps 40] [--seq 64]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--steps", type=int, default=40)
    parser.add_argument("--seq", type=int, default=64)
    args = parser.parse_args()

    import jax.numpy as jnp

    from persian_rag_tpu.models.encoder import EncoderConfig
    from persian_rag_tpu.models.sentence_encoder import SentenceEncoder
    from persian_rag_tpu.models.tokenizer import HashTokenizer
    from persian_rag_tpu.train.trainer import EmbeddingTrainer

    archs = [
        ("MiniLM-L12", EncoderConfig.minilm_l12),
        ("distiluse-arch", EncoderConfig.distilbert_base),
        ("e5-base-arch", EncoderConfig.xlmr_base),
    ]
    n = args.batch * args.steps

    def make_qa(tag):
        return [
            {
                "question": f"سوال {tag} شماره {i} {i % 97} {i % 31}",
                "answer": f"پاسخ {tag} شماره {i} {i % 89} {i % 37}",
                "context": f"متن {tag} زمینه {i} {i % 53}",
            }
            for i in range(n)
        ]

    qa, qa2 = make_qa("a"), make_qa("b")
    for name, ctor in archs:
        config = ctor(compute_dtype=jnp.bfloat16)
        encoder = SentenceEncoder(
            config, tokenizer=HashTokenizer(config.vocab_size),
            max_seq_len=args.seq,
        )
        trainer = EmbeddingTrainer(encoder)
        examples = trainer.prepare_training_data(qa)[:n]
        examples2 = trainer.prepare_training_data(qa2)[:n]
        # warm epoch compiles at the SAME total_steps (the optimizer
        # schedule is part of the jitted step's cache key); the timed
        # epoch runs different example VALUES at identical shapes so
        # the relay's (computation, inputs) cache cannot serve it.
        t0 = time.time()
        trainer.fine_tune(
            examples, epochs=1, batch_size=args.batch,
            warmup_steps=1, log_every=10_000,
        )
        warm = time.time() - t0
        t0 = time.time()
        out = trainer.fine_tune(
            examples2, epochs=1, batch_size=args.batch,
            warmup_steps=1, log_every=10_000,
        )
        print(
            f"{name}: {out['samples_per_second']:.0f} samples/s "
            f"(bs {args.batch}, seq {args.seq}, {args.steps} steps, "
            f"loss {out['losses'][-1]:.4f}; warm incl. compile "
            f"{warm:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
