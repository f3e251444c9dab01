"""LoRA fine-tuning of the decoder (SFT, train-on-responses-only).

Rebuilds the capability of the reference's Colab notebook (unsloth LoRA
r=32/alpha=32 on all projection modules of Llama-3.2-1B, SFT on
persian_qa in chat format, training only on response tokens —
reference: notebooks/*.ipynb cell 0) as a functional JAX implementation:

* LoRA is parameter surgery, not module surgery: trainable (A, B) pairs
  live in a separate pytree; `merge_lora` produces effective params
  kernel + (alpha/r) * A @ B, and gradients flow only through the LoRA
  tree. Merge cost is O(in*out*r) per target matrix — negligible next
  to a forward pass.
* SFT loss is next-token cross-entropy masked to response positions
  (labels == -100 are ignored), exactly the train-on-responses-only
  setup.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from persian_rag_tpu.gen.generator import ByteTokenizer
from persian_rag_tpu.models.decoder import DecoderConfig, LlamaDecoder

TARGET_MODULES = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj",
)


def init_lora(
    params: Dict,
    rank: int = 32,
    targets: Sequence[str] = TARGET_MODULES,
    seed: int = 0,
) -> Dict:
    """Create the LoRA tree mirroring every targeted kernel."""
    rng = np.random.default_rng(seed)
    lora: Dict[str, Any] = {}

    def visit(node, out):
        for name, child in node.items():
            if name in targets and "kernel" in child:
                fan_in, fan_out = child["kernel"].shape
                out[name] = {
                    "a": jnp.asarray(
                        rng.standard_normal((fan_in, rank)) / np.sqrt(fan_in),
                        jnp.float32,
                    ),
                    "b": jnp.zeros((rank, fan_out), jnp.float32),
                }
            elif isinstance(child, dict):
                sub: Dict[str, Any] = {}
                visit(child, sub)
                if sub:
                    out[name] = sub

    visit(params, lora)
    return lora


def merge_lora(params: Dict, lora: Dict, alpha: float = 32.0, rank: int = 32) -> Dict:
    """Effective params: kernel + (alpha/rank) * A @ B."""
    scale = alpha / rank

    def visit(p_node, l_node):
        out = {}
        for name, child in p_node.items():
            if name in l_node and "a" in l_node[name]:
                delta = l_node[name]["a"] @ l_node[name]["b"] * scale
                out[name] = {"kernel": child["kernel"] + delta}
            elif isinstance(child, dict) and name in l_node:
                out[name] = visit(child, l_node[name])
            else:
                out[name] = child
        return out

    return visit(params, lora)


# ---------------------------------------------------------------------------
# SFT data prep (chat format, responses-only labels).
# ---------------------------------------------------------------------------

PROMPT_TEMPLATE = "سوال: {question}\nپاسخ: "


def build_sft_example(
    question: str,
    answer: str,
    tokenizer,
    max_len: int = 256,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (input_ids, labels); labels are -100 on prompt positions."""
    prompt_ids = tokenizer.encode(PROMPT_TEMPLATE.format(question=question))
    answer_ids = tokenizer.encode(answer, add_bos=False) + [tokenizer.eos_id]
    ids = (prompt_ids + answer_ids)[:max_len]
    labels = ([-100] * len(prompt_ids) + answer_ids)[:max_len]
    return np.asarray(ids, np.int32), np.asarray(labels, np.int32)


def pad_batch(
    examples: Sequence[Tuple[np.ndarray, np.ndarray]], pad_id: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    max_len = max(len(ids) for ids, _ in examples)
    batch = len(examples)
    ids = np.full((batch, max_len), pad_id, np.int32)
    labels = np.full((batch, max_len), -100, np.int32)
    mask = np.zeros((batch, max_len), np.int32)
    for i, (e_ids, e_labels) in enumerate(examples):
        ids[i, : len(e_ids)] = e_ids
        labels[i, : len(e_labels)] = e_labels
        mask[i, : len(e_ids)] = 1
    return ids, labels, mask


class LoraTrainer:
    def __init__(
        self,
        config: DecoderConfig,
        params: Dict,
        rank: int = 32,
        alpha: float = 32.0,
        tokenizer=None,
        mesh=None,
        seed: int = 0,
    ):
        self.config = config
        self.base_params = params
        self.rank = rank
        self.alpha = alpha
        self.tokenizer = tokenizer or ByteTokenizer()
        self.mesh = mesh
        self.model = LlamaDecoder(config)
        self.lora = init_lora(params, rank=rank, seed=seed)
        self._train_step = None

    def _loss_fn(self, lora, base_params, ids, labels, mask):
        # base_params rides as a jit ARGUMENT, never a closure: captured
        # 1B-scale frozen weights become 3.9 GB of lowering constants,
        # which the relay's remote-compile body limit rejects (HTTP 413
        # territory — CLAUDE.md) and which waste an executable-embedded
        # copy even on directly-attached devices.
        merged = merge_lora(base_params, lora, self.alpha, self.rank)
        logits = self.model.apply(
            {"params": merged}, ids, attention_mask=mask
        )
        # next-token prediction: logits[t] predicts labels[t+1]
        logits = logits[:, :-1]
        targets = labels[:, 1:]
        valid = targets != -100
        safe_targets = jnp.where(valid, targets, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[
            ..., 0
        ]
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

    def fit(
        self,
        qa_data: List[Dict],
        epochs: int = 1,
        batch_size: int = 4,
        learning_rate: float = 3e-4,
        max_len: int = 128,
        log_every: int = 4,
    ) -> Dict:
        examples = [
            build_sft_example(
                item["question"], item["answer"], self.tokenizer, max_len
            )
            for item in qa_data
            if item.get("question") and item.get("answer")
        ]
        optimizer = optax.adamw(learning_rate, weight_decay=0.0)
        opt_state = optimizer.init(self.lora)

        def train_step_fn(lora, base, opt_state, ids, labels, mask):
            loss, grads = jax.value_and_grad(self._loss_fn)(
                lora, base, ids, labels, mask
            )
            updates, opt_state = optimizer.update(grads, opt_state, lora)
            return optax.apply_updates(lora, updates), opt_state, loss

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from persian_rag_tpu.core.mesh import DATA_AXIS

            data = NamedSharding(self.mesh, P(DATA_AXIS))
            repl = NamedSharding(self.mesh, P())
            train_step = jax.jit(
                train_step_fn,
                in_shardings=(repl, repl, repl, data, data, data),
                out_shardings=(repl, repl, repl),
            )
        else:
            train_step = jax.jit(train_step_fn)

        losses: List[float] = []
        step_count = 0
        for _ in range(epochs):
            for start in range(0, len(examples) - batch_size + 1, batch_size):
                batch = examples[start : start + batch_size]
                # bucket to a stable padded length to bound recompiles
                ids, labels, mask = pad_batch(batch)
                pad_to = max_len
                ids = np.pad(ids, ((0, 0), (0, pad_to - ids.shape[1])))
                labels = np.pad(
                    labels,
                    ((0, 0), (0, pad_to - labels.shape[1])),
                    constant_values=-100,
                )
                mask = np.pad(mask, ((0, 0), (0, pad_to - mask.shape[1])))
                self.lora, opt_state, loss = train_step(
                    self.lora,
                    self.base_params,
                    opt_state,
                    jnp.asarray(ids),
                    jnp.asarray(labels),
                    jnp.asarray(mask),
                )
                if step_count % log_every == 0:
                    losses.append(float(loss))
                step_count += 1
        return {"losses": losses, "steps": step_count}

    def merged_params(self) -> Dict:
        return jax.device_get(
            merge_lora(self.base_params, self.lora, self.alpha, self.rank)
        )
