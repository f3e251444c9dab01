"""Sentence-embedding fine-tuning (optax, data-parallel under jit).

Rebuilds the reference's EmbeddingTrainer (reference:
src/embedding_trainer.py) TPU-first:

* example construction policy is identical — (question, answer) pairs at
  label 1.0, (question, context) at 0.8 (:38-45), sampled negatives at
  0.0 capped at min(n/2, 1000) with collision re-draw (:55-76), and the
  100-positive/50-negative eval set (:78-103);
* the loss is sentence-transformers' CosineSimilarityLoss — MSE between
  cosine(u, v) and the label (:117);
* the torch .fit loop becomes a jitted optax AdamW step with linear
  warmup (the reference's WarmupLinear schedule), batches sharded over
  the mesh ``data`` axis so fine-tuning data-parallels across chips.
"""
from __future__ import annotations

import dataclasses
import json
import os
import random
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from persian_rag_tpu.core.mesh import DATA_AXIS
from persian_rag_tpu.models.sentence_encoder import SentenceEncoder


@dataclasses.dataclass
class InputExample:
    """(texts=[a, b], label) — mirrors sentence_transformers.InputExample."""

    texts: List[str]
    label: float


class EmbeddingTrainer:
    def __init__(self, encoder: SentenceEncoder, seed: int = 0):
        self.encoder = encoder
        self.seed = seed
        # jitted train steps cached per schedule signature — rebuilding
        # the closure per fine_tune call would recompile (~60 s on TPU)
        self._step_cache: Dict = {}

    # -- example construction (reference: src/embedding_trainer.py:25-103) -----

    def prepare_training_data(self, qa_data: List[Dict]) -> List[InputExample]:
        examples: List[InputExample] = []
        for item in qa_data:
            question = item.get("question")
            answer = item.get("answer")
            context = item.get("context", "")
            if not question or not answer:
                continue
            examples.append(InputExample([question, answer], 1.0))
            if context and len(str(context).strip()) > 10:
                examples.append(InputExample([question, str(context)], 0.8))
        examples.extend(self._create_negative_examples(qa_data))
        random.Random(self.seed).shuffle(examples)
        return examples

    def _create_negative_examples(
        self, qa_data: List[Dict], num_negatives: Optional[int] = None
    ) -> List[InputExample]:
        if num_negatives is None:
            num_negatives = min(len(qa_data) // 2, 1000)
        rng = random.Random(self.seed + 1)
        questions = [i["question"] for i in qa_data if i.get("question")]
        answers = [i["answer"] for i in qa_data if i.get("answer")]
        if not questions or not answers:
            return []
        answers_by_question: Dict[str, set] = {}
        for item in qa_data:
            answers_by_question.setdefault(item["question"], set()).add(
                item["answer"]
            )
        negatives = []
        for _ in range(num_negatives):
            question = rng.choice(questions)
            wrong = rng.choice(answers)
            attempts = 0
            while wrong in answers_by_question.get(question, ()) and attempts < 10:
                wrong = rng.choice(answers)
                attempts += 1
            negatives.append(InputExample([question, wrong], 0.0))
        return negatives

    def prepare_evaluation_data(self, test_data: List[Dict]) -> List[InputExample]:
        examples = []
        for item in test_data[:100]:
            if item.get("question") and item.get("answer"):
                examples.append(
                    InputExample([item["question"], item["answer"]], 1.0)
                )
        questions = [i["question"] for i in test_data[:50] if i.get("question")]
        answers = [i["answer"] for i in test_data[:50] if i.get("answer")]
        for i in range(min(50, len(questions))):
            wrong = answers[(i + len(answers) // 2) % len(answers)]
            examples.append(InputExample([questions[i], wrong], 0.0))
        return examples

    # -- training loop -----------------------------------------------------------

    def _make_train_step(self, optimizer):
        encoder = self.encoder
        fwd = encoder._forward_fn()

        def loss_fn(params, ids_a, mask_a, ids_b, mask_b, labels):
            emb_a = fwd(params, ids_a, mask_a)
            emb_b = fwd(params, ids_b, mask_b)
            na = jnp.linalg.norm(emb_a, axis=1)
            nb = jnp.linalg.norm(emb_b, axis=1)
            cos = jnp.sum(emb_a * emb_b, axis=1) / jnp.maximum(na * nb, 1e-9)
            return jnp.mean((cos - labels) ** 2)

        def train_step(params, opt_state, ids_a, mask_a, ids_b, mask_b, labels):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, ids_a, mask_a, ids_b, mask_b, labels
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        mesh = encoder.mesh
        if mesh is not None:
            data = NamedSharding(mesh, P(DATA_AXIS))
            repl = NamedSharding(mesh, P())
            return jax.jit(
                train_step,
                in_shardings=(repl, repl, data, data, data, data, data),
                out_shardings=(repl, repl, repl),
            )
        return jax.jit(train_step)

    def save_checkpoint(self, directory: str, params, opt_state, step: int) -> None:
        """Mid-training checkpoint: params + optimizer state + step
        (true checkpoint/resume — the reference only has artifact-file
        idempotency, SURVEY.md §5)."""
        import flax.serialization

        os.makedirs(directory, exist_ok=True)
        payload = {"params": params, "opt_state": opt_state}
        with open(os.path.join(directory, "train_state.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(payload))
        with open(os.path.join(directory, "train_state.json"), "w") as f:
            json.dump({"step": step}, f)

    def _load_checkpoint(self, directory: str, params, opt_state):
        import flax.serialization

        path = os.path.join(directory, "train_state.msgpack")
        if not os.path.exists(path):
            return params, opt_state, 0
        with open(path, "rb") as f:
            payload = flax.serialization.from_bytes(
                {"params": params, "opt_state": opt_state}, f.read()
            )
        with open(os.path.join(directory, "train_state.json")) as f:
            step = json.load(f)["step"]
        return payload["params"], payload["opt_state"], step

    def fine_tune(
        self,
        train_examples: Sequence[InputExample],
        eval_examples: Optional[Sequence[InputExample]] = None,
        epochs: int = 1,
        batch_size: int = 16,
        warmup_steps: int = 50,
        learning_rate: float = 2e-5,
        output_path: Optional[str] = None,
        log_every: int = 100,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 0,
        resume: bool = False,
    ) -> Dict:
        """Returns a summary dict (losses, throughput, save path)."""
        n = len(train_examples)
        steps_per_epoch = max(1, n // batch_size)
        total_steps = steps_per_epoch * epochs
        schedule = optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1)),
                optax.linear_schedule(
                    learning_rate,
                    0.0,
                    max(total_steps - warmup_steps, 1),
                ),
            ],
            [max(warmup_steps, 1)],
        )
        cache_key = (learning_rate, warmup_steps, total_steps)
        if cache_key in self._step_cache:
            optimizer, train_step = self._step_cache[cache_key]
        else:
            optimizer = optax.adamw(schedule, weight_decay=0.01)
            train_step = self._make_train_step(optimizer)
            self._step_cache[cache_key] = (optimizer, train_step)
        params = self.encoder.params
        opt_state = optimizer.init(params)
        start_step = 0
        if resume and checkpoint_dir:
            params, opt_state, start_step = self._load_checkpoint(
                checkpoint_dir, params, opt_state
            )

        rng = random.Random(self.seed + 2)
        order = list(range(n))
        losses: List[float] = []
        t_start = time.time()
        samples_seen = 0
        global_step = 0
        for epoch in range(epochs):
            rng.shuffle(order)
            for step in range(steps_per_epoch):
                global_step += 1
                if global_step <= start_step:
                    continue  # fast-forward to the resume point
                idx = order[step * batch_size : (step + 1) * batch_size]
                if len(idx) < batch_size:  # keep shapes static
                    idx = idx + order[: batch_size - len(idx)]
                batch = [train_examples[i] for i in idx]
                ids_a, mask_a = self.encoder.tokenizer.encode_batch(
                    [b.texts[0] for b in batch], self.encoder.max_seq_len
                )
                ids_b, mask_b = self.encoder.tokenizer.encode_batch(
                    [b.texts[1] for b in batch], self.encoder.max_seq_len
                )
                labels = np.array([b.label for b in batch], np.float32)
                params, opt_state, loss = train_step(
                    params,
                    opt_state,
                    jnp.asarray(ids_a),
                    jnp.asarray(mask_a),
                    jnp.asarray(ids_b),
                    jnp.asarray(mask_b),
                    jnp.asarray(labels),
                )
                samples_seen += batch_size
                if step % log_every == 0:
                    losses.append(float(loss))
                if (
                    checkpoint_dir
                    and checkpoint_every
                    and global_step % checkpoint_every == 0
                ):
                    self.save_checkpoint(
                        checkpoint_dir, params, opt_state, global_step
                    )
        jax.block_until_ready(params)
        elapsed = time.time() - t_start
        self.encoder.params = params
        self.encoder._jit_cache.clear()

        summary = {
            "losses": losses,
            "final_loss": losses[-1] if losses else None,
            "train_samples": n,
            "epochs": epochs,
            "batch_size": batch_size,
            "training_time_s": elapsed,
            "samples_per_second": samples_seen / max(elapsed, 1e-9),
        }
        if eval_examples:
            summary["eval_spearman_proxy"] = self.evaluate(eval_examples)
        if output_path:
            self.save_model(output_path)
            summary["model_path"] = output_path
        return summary

    def evaluate(self, eval_examples: Sequence[InputExample]) -> float:
        """Mean |cos - label| agreement proxy on the eval pairs."""
        a = self.encoder.encode([e.texts[0] for e in eval_examples])
        b = self.encoder.encode([e.texts[1] for e in eval_examples])
        labels = np.array([e.label for e in eval_examples])
        denom = np.maximum(
            np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1), 1e-9
        )
        cos = (a * b).sum(1) / denom
        return float(1.0 - np.mean(np.abs(cos - labels)))

    # -- persistence ---------------------------------------------------------------

    def save_model(self, path: str) -> None:
        import flax.serialization

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "params.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(self.encoder.params))
        config = dataclasses.asdict(self.encoder.config)
        config.pop("compute_dtype", None)
        meta = {
            "encoder_config": config,
            "pooling": self.encoder.head.pooling,
            "projection_dim": self.encoder.head.projection_dim,
            "normalize": self.encoder.head.normalize,
            "max_seq_len": self.encoder.max_seq_len,
        }
        with open(os.path.join(path, "config.json"), "w", encoding="utf-8") as f:
            json.dump(meta, f, indent=2)

    @staticmethod
    def load_model(path: str, tokenizer=None, mesh=None) -> SentenceEncoder:
        import flax.serialization

        from persian_rag_tpu.models.encoder import EncoderConfig

        with open(os.path.join(path, "config.json"), encoding="utf-8") as f:
            meta = json.load(f)
        config = EncoderConfig(**meta["encoder_config"])
        encoder = SentenceEncoder(
            config,
            pooling=meta.get("pooling", "mean"),
            projection_dim=meta.get("projection_dim"),
            normalize=meta.get("normalize", False),
            tokenizer=tokenizer,
            mesh=mesh,
            max_seq_len=meta.get("max_seq_len", 128),
        )
        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            encoder.params = flax.serialization.from_bytes(
                encoder.params, f.read()
            )
        return encoder

    # -- reference-compatible helpers ------------------------------------------------

    def encode_texts(self, texts: Sequence[str], batch_size: int = 32) -> np.ndarray:
        return self.encoder.encode(texts, batch_size=batch_size)

    def get_similarity(self, text1: str, text2: str) -> float:
        return self.encoder.similarity(text1, text2)
