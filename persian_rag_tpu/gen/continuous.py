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

from persian_rag_tpu.gen.generator import (
    PENALTY_LAST_N,
    TextGenerator,
    _penalize,
    _recent_window,
)
from persian_rag_tpu.models.decoder import init_cache


@dataclass
class Request:
    """One generation request tracked by the batcher."""

    req_id: int
    prompt_ids: List[int]
    max_tokens: int
    temperature: float
    top_p: float
    repeat_penalty: float = 1.0
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
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

    ``speculative=True`` turns each segment iteration into a
    prompt-lookup draft + multi-token verify forward (the batch-1
    speculative loop of TextGenerator._spec_loop_fn, made per-row):
    greedy rows emit up to ``draft_len + 1`` token-identical tokens per
    forward, sampled rows ride along committing one token per forward
    off the block's first logits. Decode forwards are weight-stream
    bound, so a (B, draft_len+1)-token verify costs about the same as a
    1-token step — accepted drafts are nearly free aggregate
    throughput. RAG answers quote their retrieved context (in the
    prompt), the regime where prompt-lookup acceptance is high.
    """

    def __init__(
        self,
        generator: TextGenerator,
        batch: int = 8,
        segment: int = 32,
        top_k: int = 40,
        length_bucket: int = 32,
        seed: int = 0,
        speculative: bool = False,
        draft_len: int = 5,
        ngram: int = 3,
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

        # speculative: False | True | "auto". "auto" starts on the
        # speculative graphs and DEMOTES to the plain scheduler — at an
        # empty-batch boundary only, where every per-row state resets at
        # admit, so the switch cannot corrupt in-flight token streams —
        # once measured acceptance shows drafting is a net loss
        # (aggregate tokens/forward below SPEC_AUTO_TPF_FLOOR after
        # SPEC_AUTO_MIN_FORWARDS verify forwards). Rationale: at high
        # acceptance the batched verify forward commits ~24 tokens
        # (measured 1.78x on a trained 1B stack), but at acceptance ~0
        # the (G+1)-wide forward commits ~1 — a measured 0.81-0.91x —
        # and the forward width is batch-uniform, so no per-row gate can
        # save it. Sticky, like DenseIndex's stage-1 demotion.
        self._spec_auto = speculative == "auto"
        self.speculative = bool(speculative)
        self.spec_demoted = False
        self.draft_len = draft_len
        self.ngram = ngram
        self._next_id = 0
        self._pending: List[Request] = []
        self._rows: List[Optional[Request]] = [None] * batch
        self._finished: List[Request] = []
        # compiled pieces are cached ON THE GENERATOR, keyed by every
        # static that shapes them: a fresh batcher instance (the server
        # rebuilds one after a failed dispatch; benchmarks build one per
        # run) must reuse the jitted functions — re-tracing the 16-layer
        # decoder three times per instance measured ~40 s per serving
        # run on the relay (scripts/bench_continuous.py round 3)
        if not hasattr(generator, "_continuous_jit_cache"):
            generator._continuous_jit_cache = {}
        self._jit_cache: Dict = generator._continuous_jit_cache
        self._key_base = (
            batch, segment, top_k, self.max_len, self.speculative,
            draft_len, ngram, self.eos,
        )
        # per-row count of tokens already handed to the request (host
        # knowledge; the speculative readout window starts here)
        self._flushed = np.zeros((batch,), np.int32)
        # aggregate speculative telemetry: emitted tokens vs verify
        # forwards (tokens/forward ~ draft acceptance + 1).
        # row_forwards = forwards x active rows at segment start — the
        # per-ROW normalizer the auto policy compares against (a plain
        # step commits exactly 1 token per active row, so aggregate
        # tokens/forward ~ occupancy at acceptance 0 regardless of how
        # badly drafting is doing).
        self.spec_stats = {"tokens": 0, "forwards": 0, "row_forwards": 0}

        self.state = {
            "cache": init_cache(self.config, batch, self.max_len),
            "token": jnp.zeros((batch,), jnp.int32),
            # slot-aligned committed-token buffer (prompt + generation;
            # the speculative drafts look up n-grams in it)
            "seq": jnp.zeros((batch, self.max_len), jnp.int32),
            "plen": jnp.ones((batch,), jnp.int32),
            "bstart": jnp.zeros((batch,), jnp.int32),
            "ngen": jnp.zeros((batch,), jnp.int32),
            "nmax": jnp.zeros((batch,), jnp.int32),
            "done": jnp.ones((batch,), bool),
            "temp": jnp.zeros((batch,), jnp.float32),
            "topp": jnp.ones((batch,), jnp.float32),
            # llama.cpp penalty chain, per row: (repeat, freq, present)
            # + the last-64-context-token window it looks back over.
            # Neutral (1, 0, 0) is an exact identity in _penalize, so
            # the always-threaded state costs nothing semantically and
            # one small scatter+elementwise per step computationally.
            "pen": jnp.tile(
                jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (batch, 1)
            ),
            "recent": jnp.full(
                (batch, PENALTY_LAST_N),
                self.config.vocab_size,
                jnp.int32,
            ),
            "key": jax.random.PRNGKey(seed),
        }

    # -- public API --------------------------------------------------------

    def submit(
        self,
        prompt_ids: Sequence[int],
        max_tokens: int = 128,
        temperature: float = 0.0,
        top_p: float = 0.9,
        repeat_penalty: float = 1.0,
        frequency_penalty: float = 0.0,
        presence_penalty: float = 0.0,
    ) -> int:
        req = Request(
            self._next_id, list(prompt_ids), int(max_tokens),
            float(temperature), float(top_p),
            float(repeat_penalty), float(frequency_penalty),
            float(presence_penalty),
        )
        self._next_id += 1
        self._pending.append(req)
        return req.req_id

    def idle(self) -> bool:
        return not self._pending and all(r is None for r in self._rows)

    # "auto" demotion thresholds: tokens per PER-ROW forward must clear
    # the floor once enough verify forwards have been observed. A plain
    # step commits exactly 1 token per active row; the (G+1)-wide
    # verify costs ~1.1-1.25x a plain step (measured acceptance~0
    # penalty 0.81-0.91x), so 1.3 tokens/row-forward ~ breakeven. The
    # measured high-acceptance regime sits far above it (1.78x at
    # ~3 tokens/row-forward on a trained 1B stack, batch 8).
    SPEC_AUTO_MIN_FORWARDS = 64
    SPEC_AUTO_TPF_FLOOR = 1.3

    def step(self) -> None:
        """Admit queued requests into free rows, then run one segment."""
        if (
            self._spec_auto
            and self.speculative
            and all(r is None for r in self._rows)  # empty-batch boundary
            and self.spec_stats["forwards"] >= self.SPEC_AUTO_MIN_FORWARDS
            and self.spec_stats["tokens"]
            < self.SPEC_AUTO_TPF_FLOOR * self.spec_stats["row_forwards"]
        ):
            # sticky demotion to the plain scheduler; per-row state is
            # empty here, so only the compiled-graph family changes
            self.speculative = False
            self.spec_demoted = True
            self._key_base = self._key_base[:4] + (False,) \
                + self._key_base[5:]
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

    def request(self, req_id: int) -> Optional[Request]:
        """The still-running request with this id, or None (streaming
        front-ends poll row progress between segments)."""
        for req in self._rows:
            if req is not None and req.req_id == req_id:
                return req
        return None

    def cancel(self, req_id: int) -> bool:
        """Free the row serving ``req_id`` (e.g. a stop string matched
        on the host). One small device update marks the row done so the
        next segment skips its decode work and an admit can reuse it."""
        for row, req in enumerate(self._rows):
            if req is not None and req.req_id == req_id:
                self.state["done"] = self.state["done"].at[row].set(True)
                req.done = True
                self._rows[row] = None
                return True
        return False

    def run_until_drained(self) -> List[Request]:
        """Convenience synchronous driver: step until everything queued
        or in flight has completed; returns all finished requests."""
        done: List[Request] = []
        while not self.idle():
            self.step()
            done.extend(self.finished())
        return done

    # -- jitted pieces -------------------------------------------------------

    def _admit_jit(self, bucket: int):
        key = ("admit", bucket) + self._key_base
        fn = self._jit_cache.get(key)
        if fn is None:
            model, config, max_len = self.model, self.config, self.max_len
            eos = self.eos
            spec = self.speculative
            vocab = config.vocab_size
            sample = functools.partial(
                TextGenerator._sample, top_k=self.top_k
            )

            @functools.partial(jax.jit, donate_argnums=(0,))
            def admit(state, params, ids, prompt_row, meta_i, meta_f):
                """Prefill + row insert + first-token sample in ONE
                dispatch (admission is per-request; every extra dispatch
                costs the relay's fixed host round-trip). meta_i packs
                (row, length, nmax), meta_f (temperature, top_p,
                repeat/freq/presence penalties) — one upload each
                instead of eight scalar uploads."""
                row, length, nmax = meta_i[0], meta_i[1], meta_i[2]
                temp, topp = meta_f[0], meta_f[1]
                pen_row = meta_f[2:5]
                bstart = jnp.int32(bucket)
                cache1 = init_cache(config, 1, max_len)
                positions = jnp.arange(bucket, dtype=jnp.int32)[None, :]
                key_valid = (
                    jnp.arange(max_len, dtype=jnp.int32)[None, :] < length
                ).astype(jnp.int32)
                logits, cache1 = model.apply(
                    {"params": params},
                    ids,
                    positions=positions,
                    attention_mask=key_valid,
                    cache=cache1,
                    cache_pos=jnp.int32(0),
                )
                key, sub = jax.random.split(state["key"])
                recent0 = _recent_window(ids[0], length, vocab)
                first = sample(
                    _penalize(logits[0, length - 1, :], recent0, pen_row),
                    sub, temp, topp,
                )
                recent0 = jnp.concatenate([recent0[1:], first[None]])
                cache = jax.tree_util.tree_map(
                    lambda big, one: big.at[row].set(one[0]),
                    state["cache"], cache1,
                )
                done = (first == eos) | (nmax <= 0)
                # plain mode: the first token sits in `token` and is
                # emitted by the next segment (ngen starts at 0).
                # speculative mode: the first token is COMMITTED into
                # seq at bstart (ngen starts at 1) so drafts can match
                # it; the readout window flushes it from seq.
                ngen0 = jnp.where(done, 0, 1) if spec else jnp.int32(0)
                return {
                    "cache": cache,
                    "token": state["token"].at[row].set(first),
                    "seq": state["seq"]
                    .at[row]
                    .set(prompt_row.at[bstart].set(first)),
                    "plen": state["plen"].at[row].set(length),
                    "bstart": state["bstart"].at[row].set(bstart),
                    "ngen": state["ngen"].at[row].set(ngen0),
                    "nmax": state["nmax"].at[row].set(nmax),
                    "done": state["done"].at[row].set(done),
                    "temp": state["temp"].at[row].set(temp),
                    "topp": state["topp"].at[row].set(topp),
                    "pen": state["pen"].at[row].set(pen_row),
                    "recent": state["recent"].at[row].set(recent0),
                    "key": key,
                }

            self._jit_cache[key] = admit
            fn = admit
        return fn

    def _segment_jit(self):
        key = ("segment",) + self._key_base
        if key not in self._jit_cache:
            model, max_len = self.model, self.max_len
            batch, seg, eos = self.batch, self.segment, self.eos
            sample = jax.vmap(
                functools.partial(TextGenerator._sample, top_k=self.top_k),
                in_axes=(0, 0, 0, 0),
            )
            penalize = jax.vmap(_penalize, in_axes=(0, 0, 0))

            @functools.partial(jax.jit, donate_argnums=(1,))
            def segment(params, state):
                plen, bstart = state["plen"], state["bstart"]
                nmax = state["nmax"]
                temp, topp = state["temp"], state["topp"]
                pen = state["pen"]
                out0 = jnp.full((batch, seg), -1, jnp.int32)

                def cond(st):
                    i, _, _, done, _, _, _, _ = st
                    return (i < seg) & jnp.logical_not(jnp.all(done))

                def body(st):
                    i, token, ngen, done, cache, key, out, recent = st
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
                        penalize(logits[:, -1, :], recent, pen),
                        jax.random.split(sub, batch),
                        temp, topp,
                    )
                    # roll the freshly committed token into live rows'
                    # penalty windows; done rows keep their window as-is
                    recent2 = jnp.where(
                        done[:, None],
                        recent,
                        jnp.concatenate(
                            [recent[:, 1:], nxt[:, None]], axis=1
                        ),
                    )
                    ngen2 = jnp.where(done, ngen, ngen + 1)
                    done2 = done | (nxt == eos) | (ngen2 >= nmax) | (
                        bstart + ngen2 >= max_len - 1
                    )
                    token2 = jnp.where(done, token, nxt)
                    return (i + 1, token2, ngen2, done2, cache, key, out,
                            recent2)

                (i, token, ngen, done, cache, key, out,
                 recent) = jax.lax.while_loop(
                    cond,
                    body,
                    (
                        jnp.int32(0), state["token"], state["ngen"],
                        state["done"], state["cache"], state["key"], out0,
                        state["recent"],
                    ),
                )
                new_state = dict(state)
                new_state.update(
                    token=token, ngen=ngen, done=done, cache=cache,
                    key=key, recent=recent,
                )
                # ONE readback array: out and done in separate results
                # would be two device->host transfers on the relay
                # (~25-40 ms each per segment)
                packed = jnp.concatenate(
                    [out, done[:, None].astype(jnp.int32)], axis=1
                )
                return new_state, packed

            self._jit_cache[key] = segment
        return self._jit_cache[key]

    def _spec_segment_jit(self):
        """Speculative segment: each of ``iters`` loop iterations drafts
        ``draft_len`` tokens per row by prompt-lookup over that row's
        slot-aligned ``seq`` and verifies the whole block in one
        (B, draft_len+1)-token forward (per-row block scatter into the
        cache; TextGenerator._spec_loop_fn is the batch-1 original).
        Sampled rows commit exactly one token per iteration from the
        block's first logits — _sample is greedy at temp<=0, so greedy
        rows' first token is the argmax either way and acceptance
        compares drafts against pure argmax continuations
        (token-identical to plain greedy decoding)."""
        key = ("spec",) + self._key_base
        if key not in self._jit_cache:
            model, max_len = self.model, self.max_len
            batch, eos = self.batch, self.eos
            G, ng = self.draft_len, self.ngram
            iters = max(1, self.segment // 2)
            wmax = iters * (G + 1) + 1  # +1: admission-sampled token
            n_win = max_len - ng
            sample = jax.vmap(
                functools.partial(TextGenerator._sample, top_k=self.top_k),
                in_axes=(0, 0, 0, 0),
            )

            penalize = jax.vmap(_penalize, in_axes=(0, 0, 0))

            @functools.partial(jax.jit, donate_argnums=(1,))
            def segment(params, state, flushed):
                plen, bstart = state["plen"], state["bstart"]
                nmax = state["nmax"]
                temp, topp = state["temp"], state["topp"]
                pen = state["pen"]
                key_slot = jnp.arange(max_len, dtype=jnp.int32)
                win_idx = jnp.arange(n_win, dtype=jnp.int32)
                rows = jnp.arange(batch)
                offs = jnp.arange(G + 1, dtype=jnp.int32)
                is_greedy = temp <= 0.0
                # draft acceptance verifies against PLAIN argmax;
                # penalties change the argmax per position (each
                # accepted token shifts the window), so penalized rows
                # commit exactly one penalized token per iteration from
                # the block's first logits — like sampled rows.
                neutral = (
                    (pen[:, 0] == 1.0)
                    & (pen[:, 1] == 0.0)
                    & (pen[:, 2] == 0.0)
                )

                def cond(st):
                    i, _, _, done, _, _, _ = st
                    return (i < iters) & jnp.logical_not(jnp.all(done))

                def body(st):
                    i, seq, ngen, done, cache, key, recent = st
                    end = bstart + ngen  # slot after last committed
                    # -- draft: per-row most recent committed occurrence
                    # of the row's last `ng` tokens; junk drafts (misses,
                    # gap-region matches) are sound — verification only
                    # commits argmax-matching tokens.
                    last = jax.vmap(
                        lambda s, e: jax.lax.dynamic_slice(
                            s, (e - ng,), (ng,)
                        )
                    )(seq, end)
                    win = jnp.stack(
                        [seq[:, l:l + n_win] for l in range(ng)], axis=2
                    )
                    match = jnp.all(win == last[:, None, :], axis=2)
                    in_prompt = win_idx[None, :] + ng <= plen[:, None]
                    in_gen = (win_idx[None, :] >= bstart[:, None]) & (
                        win_idx[None, :] + ng <= end[:, None]
                    )
                    not_self = win_idx[None, :] < (end - ng)[:, None]
                    hit = match & (in_prompt | in_gen) & not_self
                    cont_full = (
                        win_idx[None, :] + ng + G <= plen[:, None]
                    ) | (
                        in_gen
                        & (win_idx[None, :] + ng + G <= end[:, None])
                    )
                    i_full = jnp.max(
                        jnp.where(hit & cont_full, win_idx[None, :], -1),
                        axis=1,
                    )
                    i_any = jnp.max(
                        jnp.where(hit, win_idx[None, :], -1), axis=1
                    )
                    i_best = jnp.where(i_full >= 0, i_full, i_any)
                    start = jnp.where(i_best >= 0, i_best + ng, 0)
                    drafts = jax.vmap(
                        lambda s, st_: jax.lax.dynamic_slice(
                            s, (st_,), (G,)
                        )
                    )(seq, start)

                    # -- verify block [cur, d0..d_{G-1}] at slots
                    # end-1 .. end-1+G (per-row; done rows park OOB)
                    cur = jax.vmap(
                        lambda s, e: jax.lax.dynamic_slice(
                            s, (e - 1,), (1,)
                        )
                    )(seq, end)
                    block = jnp.concatenate([cur, drafts], axis=1)
                    slots_q = (end - 1)[:, None] + offs[None, :]
                    kv_valid = (
                        key_slot[None, None, :] < plen[:, None, None]
                    ) | (
                        (key_slot[None, None, :] >= bstart[:, None, None])
                        & (key_slot[None, None, :] <= slots_q[:, :, None])
                    )
                    positions = (plen + ngen - 1)[:, None] + offs[None, :]
                    logits, cache = model.apply(
                        {"params": params},
                        block,
                        positions=positions,
                        cache=cache,
                        cache_pos=jnp.where(done, max_len, end - 1),
                        kv_valid=kv_valid,
                    )
                    g = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    key, sub = jax.random.split(key)
                    first = sample(
                        penalize(logits[:, 0, :], recent, pen),
                        jax.random.split(sub, batch),
                        temp, topp,
                    )
                    g = jnp.concatenate([first[:, None], g[:, 1:]], axis=1)
                    m = jnp.sum(
                        jnp.cumprod(
                            (drafts == g[:, :G]).astype(jnp.int32), axis=1
                        ),
                        axis=1,
                    )
                    m = jnp.where(is_greedy & neutral, m, 0)
                    hit_eos = (offs[None, :] <= m[:, None]) & (g == eos)
                    c = jnp.where(
                        jnp.any(hit_eos, axis=1),
                        jnp.min(
                            jnp.where(hit_eos, offs[None, :], G + 1),
                            axis=1,
                        ),
                        m + 1,
                    )
                    c = jnp.minimum(c, nmax - ngen)
                    c = jnp.where(done, 0, c)
                    w_start = jnp.where(done, max_len, end)
                    seq = seq.at[
                        rows[:, None], w_start[:, None] + offs[None, :]
                    ].set(g)
                    # shift the c committed tokens into each row's
                    # penalty window (variable per-row shift via gather;
                    # positions past c hold uncommitted argmax garbage
                    # and stay outside the gathered range)
                    cat = jnp.concatenate([recent, g], axis=1)
                    recent2 = jnp.take_along_axis(
                        cat,
                        c[:, None]
                        + jnp.arange(recent.shape[1], dtype=jnp.int32)[
                            None, :
                        ],
                        axis=1,
                    )
                    ngen2 = ngen + c
                    done2 = (
                        done
                        | jnp.any(hit_eos, axis=1)
                        | (ngen2 >= nmax)
                        | (bstart + ngen2 > max_len - G - 1)
                    )
                    return i + 1, seq, ngen2, done2, cache, key, recent2

                (i, seq, ngen, done, cache, key,
                 recent) = jax.lax.while_loop(
                    cond,
                    body,
                    (
                        jnp.int32(0), state["seq"], state["ngen"],
                        state["done"], state["cache"], state["key"],
                        state["recent"],
                    ),
                )
                # unflushed readout window; pad the gather source so the
                # fixed-width slice never clamps (clamping would shift
                # the window and misalign the host's token accounting)
                padded = jnp.concatenate(
                    [seq, jnp.zeros((batch, wmax), jnp.int32)], axis=1
                )
                window = jax.vmap(
                    lambda s, st_: jax.lax.dynamic_slice(
                        s, (st_,), (wmax,)
                    )
                )(padded, bstart + flushed)
                packed = jnp.concatenate(
                    [
                        window,
                        ngen[:, None],
                        done.astype(jnp.int32)[:, None],
                        jnp.broadcast_to(i, (batch,))[:, None],
                    ],
                    axis=1,
                )
                new_state = dict(state)
                new_state.update(
                    seq=seq, ngen=ngen, done=done, cache=cache, key=key,
                    recent=recent,
                )
                return new_state, packed

            self._jit_cache[key] = segment
        return self._jit_cache[key]

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
        prompt_row = np.zeros((self.max_len,), np.int32)
        prompt_row[: len(clipped)] = clipped
        self.state = self._admit_jit(bucket)(
            self.state, self.params, jnp.asarray(ids),
            jnp.asarray(prompt_row),
            jnp.asarray([row, len(clipped), nmax], np.int32),
            jnp.asarray(
                [req.temperature, req.top_p, req.repeat_penalty,
                 req.frequency_penalty, req.presence_penalty],
                np.float32,
            ),
        )
        self._rows[row] = req
        self._flushed[row] = 0

    def _run_segment(self) -> None:
        if self.speculative:
            active = sum(r is not None for r in self._rows)
            self.state, packed = self._spec_segment_jit()(
                self.params, self.state, jnp.asarray(self._flushed)
            )
            packed = np.asarray(packed)
            window, ngen = packed[:, :-3], packed[:, -3]
            done = packed[:, -2].astype(bool)
            self.spec_stats["forwards"] += int(packed[0, -1])
            self.spec_stats["row_forwards"] += int(packed[0, -1]) * active
            self.spec_stats["tokens"] += int(
                sum(
                    int(ngen[r]) - int(self._flushed[r])
                    for r in range(self.batch)
                    if self._rows[r] is not None
                )
            )
            for row in range(self.batch):
                req = self._rows[row]
                if req is None:
                    continue
                fresh = int(ngen[row]) - int(self._flushed[row])
                req.tokens.extend(int(t) for t in window[row, :fresh])
                self._flushed[row] = ngen[row]
                if bool(done[row]):
                    req.done = True
                    self._finished.append(req)
                    self._rows[row] = None
            return
        self.state, packed = self._segment_jit()(self.params, self.state)
        packed = np.asarray(packed)
        out, done = packed[:, :-1], packed[:, -1].astype(bool)
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
