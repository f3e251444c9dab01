"""Continuous batching for decoder serving (llama.cpp "slots" equivalent).

The static micro-batcher (gen/local_server.py) decodes a request group to
completion before admitting new arrivals, so a long answer blocks the
whole batch. This module keeps a fixed-size decode batch RESIDENT on
device and swaps finished rows for queued prompts mid-flight — the
llama.cpp server's slot scheduler (the reference talks to it via
src/llama_client.py), rebuilt on the TPU execution model:

- decode runs in SEGMENTS: one jitted ``lax.while_loop`` advances every
  active row up to ``segment`` tokens per dispatch (per-step dispatch
  would pay the relay's ~25-40 ms host round-trip per token);
- a new request is ADMITTED between segments: a per-length-bucket
  prefill builds the row's KV in a (1, max_len) cache, and a second
  jitted call scatters it into the resident (B, max_len) cache at the
  free row and samples the row's first token — no host readback on the
  admission path;
- every per-row quantity (prompt length, generation-region start, RoPE
  position, cache slot, remaining budget, temperature, top_p) is a
  (B,) device array, so rows at different phases of different requests
  share each weight-stream-bound decode step. Batch-8 decode steps cost
  the same as batch-1 on this chip (scripts/bench_decode.py), which is
  exactly the regime where continuous batching turns idle rows into
  throughput.

Cache layout per row: prompt KV occupies slots [0, plen); the
generation region starts at the row's padded bucket ``bstart`` (pad
slots [plen, bstart) keep prefill garbage and stay masked forever);
RoPE positions remain the true token positions — the same
slot/position decoupling as TextGenerator._batch_loop_fn, made per-row.
Greedy outputs are token-identical to TextGenerator.generate_ids_device
(tests/test_continuous.py).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from persian_rag_tpu.gen.generator import TextGenerator
from persian_rag_tpu.models.decoder import init_cache


@dataclass
class Request:
    """One generation request tracked by the batcher."""

    req_id: int
    prompt_ids: List[int]
    max_tokens: int
    temperature: float
    top_p: float
    tokens: List[int] = field(default_factory=list)
    done: bool = False


class ContinuousBatcher:
    """Fixed-batch continuous decode scheduler over a TextGenerator.

    Single-threaded by design: callers ``submit()`` requests and drive
    ``step()`` (admit + one decode segment) until ``finished()`` drains
    completed requests. The HTTP server wraps this in its worker thread
    (gen/local_server.py); tests and benchmarks drive it directly.

    ``top_k`` is a batcher-level static (it shapes the compiled sampler;
    llama.cpp's default 40 is the serving contract the reference uses).
    temperature/top_p are per-request.
    """

    def __init__(
        self,
        generator: TextGenerator,
        batch: int = 8,
        segment: int = 32,
        top_k: int = 40,
        length_bucket: int = 32,
        seed: int = 0,
    ):
        self.gen = generator
        self.config = generator.config
        self.model = generator.model
        self.params = generator.params
        self.max_len = generator.max_len
        self.batch = batch
        self.segment = segment
        self.top_k = top_k
        self.length_bucket = length_bucket
        self.eos = getattr(generator.tokenizer, "eos_id", -1)
        self.pad_id = getattr(generator.tokenizer, "pad_id", 0)

        self._next_id = 0
        self._pending: List[Request] = []
        self._rows: List[Optional[Request]] = [None] * batch
        self._finished: List[Request] = []
        self._prefill_cache: Dict[int, object] = {}
        self._admit_fn = None
        self._segment_fn = None

        self.state = {
            "cache": init_cache(self.config, batch, self.max_len),
            "token": jnp.zeros((batch,), jnp.int32),
            "plen": jnp.ones((batch,), jnp.int32),
            "bstart": jnp.zeros((batch,), jnp.int32),
            "ngen": jnp.zeros((batch,), jnp.int32),
            "nmax": jnp.zeros((batch,), jnp.int32),
            "done": jnp.ones((batch,), bool),
            "temp": jnp.zeros((batch,), jnp.float32),
            "topp": jnp.ones((batch,), jnp.float32),
            "key": jax.random.PRNGKey(seed),
        }

    # -- public API --------------------------------------------------------

    def submit(
        self,
        prompt_ids: Sequence[int],
        max_tokens: int = 128,
        temperature: float = 0.0,
        top_p: float = 0.9,
    ) -> int:
        req = Request(
            self._next_id, list(prompt_ids), int(max_tokens),
            float(temperature), float(top_p),
        )
        self._next_id += 1
        self._pending.append(req)
        return req.req_id

    def idle(self) -> bool:
        return not self._pending and all(r is None for r in self._rows)

    def step(self) -> None:
        """Admit queued requests into free rows, then run one segment."""
        for row in range(self.batch):
            if self._rows[row] is None and self._pending:
                self._admit(row, self._pending.pop(0))
        if all(r is None for r in self._rows):
            return
        self._run_segment()

    def finished(self) -> List[Request]:
        """Drain and return requests completed since the last call."""
        out, self._finished = self._finished, []
        return out

    def run_until_drained(self) -> List[Request]:
        """Convenience synchronous driver: step until everything queued
        or in flight has completed; returns all finished requests."""
        done: List[Request] = []
        while not self.idle():
            self.step()
            done.extend(self.finished())
        return done

    # -- jitted pieces -------------------------------------------------------

    def _prefill_fn(self, bucket: int):
        fn = self._prefill_cache.get(bucket)
        if fn is None:
            model, config, max_len = self.model, self.config, self.max_len

            @jax.jit
            def prefill(params, ids, length):
                cache = init_cache(config, 1, max_len)
                positions = jnp.arange(bucket, dtype=jnp.int32)[None, :]
                key_valid = (
                    jnp.arange(max_len, dtype=jnp.int32)[None, :] < length
                ).astype(jnp.int32)
                logits, cache = model.apply(
                    {"params": params},
                    ids,
                    positions=positions,
                    attention_mask=key_valid,
                    cache=cache,
                    cache_pos=jnp.int32(0),
                )
                return logits[0, length - 1, :], cache

            self._prefill_cache[bucket] = prefill
            fn = prefill
        return fn

    def _admit_jit(self):
        if self._admit_fn is None:
            sample = functools.partial(
                TextGenerator._sample, top_k=self.top_k
            )

            @functools.partial(jax.jit, donate_argnums=(0,))
            def admit(state, cache1, logits_last, row, plen, bstart,
                      nmax, temp, topp):
                key, sub = jax.random.split(state["key"])
                first = sample(logits_last, sub, temp, topp)
                cache = jax.tree_util.tree_map(
                    lambda big, one: big.at[row].set(one[0]),
                    state["cache"], cache1,
                )
                return {
                    "cache": cache,
                    "token": state["token"].at[row].set(first),
                    "plen": state["plen"].at[row].set(plen),
                    "bstart": state["bstart"].at[row].set(bstart),
                    "ngen": state["ngen"].at[row].set(0),
                    "nmax": state["nmax"].at[row].set(nmax),
                    "done": state["done"]
                    .at[row]
                    .set((first == self.eos) | (nmax <= 0)),
                    "temp": state["temp"].at[row].set(temp),
                    "topp": state["topp"].at[row].set(topp),
                    "key": key,
                }

            self._admit_fn = admit
        return self._admit_fn

    def _segment_jit(self):
        if self._segment_fn is None:
            model, max_len = self.model, self.max_len
            batch, seg, eos = self.batch, self.segment, self.eos
            sample = jax.vmap(
                functools.partial(TextGenerator._sample, top_k=self.top_k),
                in_axes=(0, 0, 0, 0),
            )

            @functools.partial(jax.jit, donate_argnums=(1,))
            def segment(params, state):
                plen, bstart = state["plen"], state["bstart"]
                nmax = state["nmax"]
                temp, topp = state["temp"], state["topp"]
                out0 = jnp.full((batch, seg), -1, jnp.int32)

                def cond(st):
                    i, _, _, done, _, _, _ = st
                    return (i < seg) & jnp.logical_not(jnp.all(done))

                def body(st):
                    i, token, ngen, done, cache, key, out = st
                    out = out.at[:, i].set(jnp.where(done, -1, token))
                    pos = plen + ngen
                    # done rows park their write slot out of bounds; the
                    # scatter drops it (same convention as the decoder's
                    # per-row block write), so idle rows cost compute
                    # but never touch cache state.
                    slot = jnp.where(done, max_len, bstart + ngen)
                    kv_idx = jnp.arange(max_len, dtype=jnp.int32)[None, :]
                    kv_valid = (kv_idx < plen[:, None]) | (
                        (kv_idx >= bstart[:, None])
                        & (kv_idx <= slot[:, None])
                    )
                    logits, cache = model.apply(
                        {"params": params},
                        token[:, None],
                        positions=pos[:, None],
                        cache=cache,
                        cache_pos=slot,
                        kv_valid=kv_valid,
                    )
                    key, sub = jax.random.split(key)
                    nxt = sample(
                        logits[:, -1, :], jax.random.split(sub, batch),
                        temp, topp,
                    )
                    ngen2 = jnp.where(done, ngen, ngen + 1)
                    done2 = done | (nxt == eos) | (ngen2 >= nmax) | (
                        bstart + ngen2 >= max_len - 1
                    )
                    token2 = jnp.where(done, token, nxt)
                    return i + 1, token2, ngen2, done2, cache, key, out

                i, token, ngen, done, cache, key, out = jax.lax.while_loop(
                    cond,
                    body,
                    (
                        jnp.int32(0), state["token"], state["ngen"],
                        state["done"], state["cache"], state["key"], out0,
                    ),
                )
                new_state = dict(state)
                new_state.update(
                    token=token, ngen=ngen, done=done, cache=cache, key=key
                )
                return new_state, out

            self._segment_fn = segment
        return self._segment_fn

    # -- scheduler internals ---------------------------------------------------

    def _admit(self, row: int, req: Request) -> None:
        lb, max_len = self.length_bucket, self.max_len
        clipped = req.prompt_ids[-(max_len - 1 - lb):]
        if not clipped:
            clipped = [self.pad_id]
        bucket = min(-(-len(clipped) // lb) * lb, max_len - 1 - lb)
        clipped = clipped[-bucket:]
        # the generation region is [bstart, max_len): budget caps there
        nmax = min(req.max_tokens, max_len - 1 - bucket)
        ids = np.full((1, bucket), self.pad_id, np.int32)
        ids[0, : len(clipped)] = clipped
        logits_last, cache1 = self._prefill_fn(bucket)(
            self.params, jnp.asarray(ids), jnp.int32(len(clipped))
        )
        self.state = self._admit_jit()(
            self.state, cache1, logits_last, jnp.int32(row),
            jnp.int32(len(clipped)), jnp.int32(bucket), jnp.int32(nmax),
            jnp.float32(req.temperature), jnp.float32(req.top_p),
        )
        self._rows[row] = req

    def _run_segment(self) -> None:
        self.state, out = self._segment_jit()(self.params, self.state)
        out = np.asarray(out)
        done = np.asarray(self.state["done"])
        for row in range(self.batch):
            req = self._rows[row]
            if req is None:
                continue
            req.tokens.extend(
                int(t) for t in out[row] if t >= 0 and t != self.eos
            )
            if bool(done[row]):
                req.done = True
                self._finished.append(req)
                self._rows[row] = None
