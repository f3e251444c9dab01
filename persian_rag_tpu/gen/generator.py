"""Text generation on top of the Flax Llama decoder.

Prefill + incremental KV-cache decoding with greedy or temperature/top-p
sampling. Tokenization is pluggable: a real HF tokenizer for imported
checkpoints, or the self-contained ByteTokenizer (UTF-8 bytes + specials)
which makes generation fully trainable/runnable offline.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from persian_rag_tpu.models.decoder import (
    DecoderConfig,
    LlamaDecoder,
    cast_params,
    fuse_params,
    init_cache,
    quantize_decoder_params,
)


def _is_quantized_tree(params) -> bool:
    embed = params.get("embed_tokens", {})
    return isinstance(embed, dict) and "values" in embed


# llama.cpp's repeat_last_n default — the window of context tokens the
# penalty chain looks back over. Fixed (not per-request): a traced
# window length would be a dynamic shape, and one compiled variant per
# requested value would invite relay compile storms (30s-5min each).
PENALTY_LAST_N = 64


def _recent_window(ids: jnp.ndarray, length, vocab_size: int):
    """Last PENALTY_LAST_N context tokens of a right-padded id row.

    ids (L,) int32, length scalar = number of valid tokens. Slots
    before the start of a short prompt read the ``vocab_size`` sentinel,
    which the penalty scatter drops as out-of-bounds (-1 would WRAP to
    the last vocab id under NumPy indexing semantics and wrongly
    penalize it)."""
    idx = length - PENALTY_LAST_N + jnp.arange(
        PENALTY_LAST_N, dtype=jnp.int32
    )
    return jnp.where(
        idx >= 0,
        ids[jnp.clip(idx, 0, ids.shape[0] - 1)],
        jnp.int32(vocab_size),
    )


def _penalize(logits: jnp.ndarray, recent: jnp.ndarray, pen: jnp.ndarray):
    """llama.cpp sampler-chain penalties (applied BEFORE top-k/top-p,
    and before greedy argmax — llama.cpp's chain runs them even at
    temperature 0). pen = (repeat, frequency, presence):

    - repeat (llama.cpp default 1.1 server-side): binary presence over
      the last-64 window; positive logits divide, negative multiply
      (llama-sampling.cpp llama_sampler_penalties_apply).
    - frequency/presence (OpenAI-style, llama.cpp defaults 0):
      logit -= count*freq + (count>0)*present.

    Neutral pen (1, 0, 0) is an exact identity (x/1.0 and x*0.0 are
    exact), so a penalized compiled variant serves neutral requests
    with bit-identical results."""
    counts = jnp.zeros(logits.shape[-1], jnp.float32).at[recent].add(
        1.0, mode="drop"
    )
    out = logits.astype(jnp.float32)
    seen = counts > 0
    out = jnp.where(seen, jnp.where(out > 0, out / pen[0], out * pen[0]), out)
    return out - counts * pen[1] - seen.astype(jnp.float32) * pen[2]


class ByteTokenizer:
    """UTF-8 byte-level tokenizer: ids 0..255 bytes, 256=BOS, 257=EOS."""

    vocab_size = 258
    bos_id = 256
    eos_id = 257

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        ids = list(text.encode("utf-8"))
        return ([self.bos_id] if add_bos else []) + ids

    def decode(self, ids: Sequence[int]) -> str:
        data = bytes(i for i in ids if 0 <= i < 256)
        return data.decode("utf-8", errors="ignore")


class TextGenerator:
    def __init__(
        self,
        config: DecoderConfig,
        params: Optional[Dict] = None,
        tokenizer=None,
        max_len: int = 512,
        seed: int = 0,
        mesh=None,
        tp_axis: str = "corpus",
        fuse_projections: bool = False,
        quantize=False,  # False | True/'int8' | 'int4'
        quantize_kv: bool = False,
    ):
        if quantize_kv and config.kv_cache_dtype != "int8":
            # int8 KV cache (llama.cpp --cache-type-k/-v q8_0 parity):
            # halves the per-step KV read and the cache HBM footprint;
            # orthogonal to weight quantization.
            config = dataclasses.replace(config, kv_cache_dtype="int8")
        if quantize and not config.quantized_weights:
            # quantized weight serving (llama.cpp GGUF parity — the
            # reference serves Q8_0, BASELINE.md). quantize=True/"int8"
            # halves the HBM weight stream per decode step; "int4"
            # nibble-packs the layer projections for another ~1.3x
            # (coarser per-channel quantization; embedding/lm_head stay
            # int8). Single chip uses the Pallas dequant kernels; on a
            # TP mesh the XLA convert-in-dot backend serves instead —
            # GSPMD can partition a plain dot+convert but treats a
            # pallas_call as opaque.
            config = dataclasses.replace(
                config,
                quantized_weights=True,
                quantized_bits=4 if quantize == "int4" else 8,
                quantized_backend="xla" if mesh is not None else "pallas",
            )
        if fuse_projections and mesh is None and not config.fused_projections:
            # serving-time fused q/k/v + gate/up projections (see
            # DecoderConfig.fused_projections). Params, when supplied in
            # the canonical unfused layout, are converted below; the TP
            # mesh path keeps the unfused Megatron-shardable layout.
            config = dataclasses.replace(config, fused_projections=True)
            if params is not None:
                params = fuse_params(params)
        self.config = config
        self.tokenizer = tokenizer or ByteTokenizer()
        self.max_len = min(max_len, config.max_position_embeddings)
        self.model = LlamaDecoder(config)
        if params is None:
            rng = jax.random.PRNGKey(seed)
            init_config = config
            if config.quantized_weights:
                # random-weight serving: init the FLOAT model and
                # quantize, so the int8 values aren't all-zero
                init_config = dataclasses.replace(
                    config, quantized_weights=False
                )
            params = LlamaDecoder(init_config).init(
                jax.random.PRNGKey(seed), jnp.zeros((1, 8), jnp.int32)
            )["params"]
        # Serve weights in the compute dtype: flax init yields f32 params
        # regardless of compute_dtype, and batch-1 decode is bound by the
        # weight stream (f32 params = 2x the HBM bytes per step).
        self.params = cast_params(params, config.compute_dtype)
        if config.quantized_weights and not _is_quantized_tree(self.params):
            self.params = quantize_decoder_params(
                self.params, bits=config.quantized_bits
            )
        if mesh is not None:
            # tensor-parallel serving: Megatron column/row placement;
            # the jitted loops below are unchanged — XLA's SPMD
            # partitioner inserts the collectives and propagates the
            # KV-cache sharding from the k/v projection outputs.
            from persian_rag_tpu.parallel.tp_decoder import (
                shard_decoder_params_tp,
            )

            self.params = shard_decoder_params_tp(
                self.params, mesh, axis=tp_axis
            )
        self._prefill_cache: Dict[int, object] = {}
        self._step = None

    @classmethod
    def from_gguf(
        cls,
        path: str,
        max_len: int = 512,
        quantize=None,
        mesh=None,
        **kw,
    ) -> "TextGenerator":
        """Serve a llama.cpp GGUF file directly (the reference's serving
        artifact is a Llama-3.2-1B Q8_0 GGUF — BASELINE.md): weights
        dequantize to float on import and re-quantize for the TPU
        per-channel int8 kernels; the embedded BPE tokenizer is rebuilt
        from the file's metadata. ``quantize`` defaults to int8 when the
        source file was quantized (parity with what llama.cpp would
        serve) and to False for f16/f32 files.
        """
        from persian_rag_tpu.models.gguf import (
            GGUFFile,
            GGML_F32,
            GGML_F16,
            GGML_BF16,
            params_from_gguf,
            tokenizer_from_gguf,
        )

        gf = GGUFFile(path)
        try:
            config, params = params_from_gguf(
                gf, compute_dtype=jnp.bfloat16
            )
            tokenizer = tokenizer_from_gguf(gf)
            if quantize is None:
                float_types = (GGML_F32, GGML_F16, GGML_BF16)
                quantize = any(
                    t.ggml_type not in float_types
                    for t in gf.tensors.values()
                )
        finally:
            gf.close()
        return cls(
            config,
            params=params,
            tokenizer=tokenizer,
            max_len=max_len,
            mesh=mesh,
            quantize=quantize,
            **kw,
        )

    # -- jitted pieces ---------------------------------------------------------

    def _prefill_fn(self, length: int):
        if length not in self._prefill_cache:
            model, max_len = self.model, self.max_len

            @jax.jit
            def prefill(params, ids):
                cache = init_cache(self.config, 1, max_len)
                positions = jnp.arange(length, dtype=jnp.int32)[None, :]
                logits, cache = model.apply(
                    {"params": params},
                    ids,
                    positions=positions,
                    cache=cache,
                    cache_pos=jnp.int32(0),
                )
                return logits[:, -1, :], cache

            self._prefill_cache[length] = prefill
        return self._prefill_cache[length]

    def _step_fn(self):
        if self._step is None:
            model = self.model

            @jax.jit
            def step(params, token, pos, cache):
                positions = pos[None, None]
                logits, cache = model.apply(
                    {"params": params},
                    token[None, None],
                    positions=positions,
                    cache=cache,
                    cache_pos=pos,
                )
                return logits[0, -1, :], cache

            self._step = step
        return self._step

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("top_k",))
    def _sample(logits, key, temperature, top_p, top_k=40):
        def greedy(_):
            return jnp.argmax(logits).astype(jnp.int32)

        def sampled(_):
            scaled = logits / jnp.maximum(temperature, 1e-6)
            if 0 < top_k < scaled.shape[-1]:
                # llama.cpp's sampler chain applies top-k (default 40)
                # BEFORE top-p, so truncating here matches the serving
                # contract the reference runs against — and the exact
                # full-vocab argsort it replaces measured +10.6 ms/step
                # at batch 8 x 128k vocab on chip (scripts/
                # bench_decode.py). lax.top_k returns candidates already
                # sorted descending.
                vals, idx = jax.lax.top_k(scaled, top_k)
            else:
                # top_k=0: exact nucleus sampling over the full vocab
                idx = jnp.argsort(-scaled)
                vals = scaled[idx]
            probs = jax.nn.softmax(vals)
            cum = jnp.cumsum(probs)
            cut = cum - probs > top_p  # keep tokens until mass > top_p
            masked = jnp.where(cut, -jnp.inf, vals)
            choice = jax.random.categorical(key, masked)
            return idx[choice].astype(jnp.int32)

        return jax.lax.cond(temperature <= 0.0, greedy, sampled, None)

    def _device_loop_fn(self, prompt_len: int, max_tokens: int,
                        top_k: int = 40, penalized: bool = False):
        """Whole-generation jitted function: prefill + lax.while_loop
        decode on device — ONE dispatch per request (the per-step Python
        loop pays host<->device latency per token; this pays it once).

        ``penalized`` is a STATIC variant flag: the default graphs stay
        byte-identical to the penalty-free compile (no recompiles, no
        per-step scatter cost) and only requests that actually carry
        llama.cpp penalties pay for the penalized variant."""
        cache_key = ("loop", prompt_len, max_tokens, top_k, penalized)
        if cache_key in self._prefill_cache:
            return self._prefill_cache[cache_key]
        model, config, max_len = self.model, self.config, self.max_len
        eos = getattr(self.tokenizer, "eos_id", -1)
        vocab = config.vocab_size

        @jax.jit
        def run(params, prompt_ids, key, temperature, top_p, pen):
            cache = init_cache(config, 1, max_len)
            positions = jnp.arange(prompt_len, dtype=jnp.int32)[None, :]
            logits, cache = model.apply(
                {"params": params},
                prompt_ids,
                positions=positions,
                cache=cache,
                cache_pos=jnp.int32(0),
            )
            last = logits[0, -1, :]
            recent = None
            if penalized:
                recent = _recent_window(
                    prompt_ids[0], jnp.int32(prompt_len), vocab
                )
                last = _penalize(last, recent, pen)
            first = TextGenerator._sample(
                last, key, temperature, top_p, top_k=top_k
            )
            if penalized:
                recent = jnp.concatenate([recent[1:], first[None]])
            out = jnp.full((max_tokens,), -1, jnp.int32)

            def cond(state):
                i, token, *_ = state
                return (i < max_tokens) & (token != eos)

            def body(state):
                i, token, pos, cache, key, out, recent = state
                out = out.at[i].set(token)
                logits, cache = model.apply(
                    {"params": params},
                    token[None, None],
                    positions=pos[None, None],
                    cache=cache,
                    cache_pos=pos,
                )
                key, sub = jax.random.split(key)
                last = logits[0, -1, :]
                if penalized:
                    last = _penalize(last, recent, pen)
                nxt = TextGenerator._sample(
                    last, sub, temperature, top_p, top_k=top_k
                )
                if penalized:
                    recent = jnp.concatenate([recent[1:], nxt[None]])
                return i + 1, nxt, pos + 1, cache, key, out, recent

            if recent is None:  # keep the state pytree static-shaped
                recent = jnp.zeros((0,), jnp.int32)
            i, token, pos, cache, key, out, recent = jax.lax.while_loop(
                cond,
                body,
                (jnp.int32(0), first, jnp.int32(prompt_len), cache, key,
                 out, recent),
            )
            return out, i

        self._prefill_cache[cache_key] = run
        return run

    def _batch_loop_fn(self, bucket: int, max_tokens: int, batch: int,
                       top_k: int = 40, penalized: bool = False):
        """Batched whole-generation function: ragged prompts right-padded
        to one bucket, per-row positions/EOS masking, one dispatch for
        the entire batch's decode.

        ``penalized`` (static) compiles the llama.cpp penalty-chain
        variant — see _device_loop_fn; pen is one (3,) vector for the
        whole group (the server batches only same-sampler requests)."""
        cache_key = ("batch", bucket, max_tokens, batch, top_k, penalized)
        if cache_key in self._prefill_cache:
            return self._prefill_cache[cache_key]
        model, config, max_len = self.model, self.config, self.max_len
        eos = getattr(self.tokenizer, "eos_id", -1)
        vocab = config.vocab_size
        sample = jax.vmap(
            functools.partial(TextGenerator._sample, top_k=top_k),
            in_axes=(0, 0, None, None),
        )
        penalize = jax.vmap(_penalize, in_axes=(0, 0, None))

        @jax.jit
        def run(params, ids, lengths, key, temperature, top_p, pen):
            cache = init_cache(config, batch, max_len)
            positions = jnp.broadcast_to(
                jnp.arange(bucket, dtype=jnp.int32)[None, :], (batch, bucket)
            )
            key_valid = (
                jnp.arange(max_len, dtype=jnp.int32)[None, :]
                < lengths[:, None]
            ).astype(jnp.int32)
            logits, cache = model.apply(
                {"params": params},
                ids,
                positions=positions,
                attention_mask=key_valid,
                cache=cache,
                cache_pos=jnp.int32(0),
            )
            rows = jnp.arange(batch)
            last = logits[rows, lengths - 1, :]
            recent = None
            if penalized:
                recent = jax.vmap(_recent_window, in_axes=(0, 0, None))(
                    ids, lengths, vocab
                )
                last = penalize(last, recent, pen)
            key, sub = jax.random.split(key)
            token = sample(last, jax.random.split(sub, batch), temperature, top_p)
            if penalized:
                recent = jnp.concatenate(
                    [recent[:, 1:], token[:, None]], axis=1
                )
            done = token == eos
            out = jnp.full((batch, max_tokens), -1, jnp.int32)

            def cond(state):
                t, _, done, *_ = state
                return (t < max_tokens) & jnp.logical_not(jnp.all(done))

            def body(state):
                t, token, done, cache, key, out, recent = state
                out = out.at[:, t].set(jnp.where(done, -1, token))
                # RoPE/true position is per-row (ragged prompts), but the
                # CACHE SLOT is the scalar bucket+t — every row's step-t
                # token lands in the same generation-region slot, so the
                # KV write is one dynamic_update_slice per tensor instead
                # of a per-row scatter. (On this chip XLA lowers the
                # 8-row scatter about as well — greedy steps measured
                # ~parity — but DUS is guaranteed-cheap lowering and
                # keeps the generation region contiguous.) Pad slots
                # [len_i, bucket) keep their prefill garbage and stay
                # masked forever; attention output is bitwise-identical
                # (RoPE values and the visible key SET are unchanged;
                # masked keys contribute exact zeros).
                pos = jnp.minimum(lengths + t, max_len - 1)
                slot = jnp.minimum(bucket + t, max_len - 1)
                key_slot = jnp.arange(max_len, dtype=jnp.int32)[None, :]
                kv_valid = (key_slot < lengths[:, None]) | (
                    (key_slot >= bucket) & (key_slot <= bucket + t)
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
                last = logits[:, -1, :]
                if penalized:
                    last = penalize(last, recent, pen)
                nxt = sample(
                    last, jax.random.split(sub, batch),
                    temperature, top_p,
                )
                if penalized:
                    recent = jnp.concatenate(
                        [recent[:, 1:], nxt[:, None]], axis=1
                    )
                done = done | (nxt == eos) | (lengths + t + 1 >= max_len - 1)
                return t + 1, nxt, done, cache, key, out, recent

            if recent is None:  # keep the state pytree static-shaped
                recent = jnp.zeros((batch, 0), jnp.int32)
            t, token, done, cache, key, out, recent = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), token, done, cache, key, out, recent),
            )
            return out

        self._prefill_cache[cache_key] = run
        return run

    def _spec_loop_fn(self, bucket: int, max_tokens: int, draft_len: int,
                      ngram: int):
        """Greedy speculative decoding via prompt-lookup drafting.

        Each loop iteration drafts `draft_len` tokens by finding the most
        recent prior occurrence of the last `ngram` generated tokens in
        the (prompt + generated) sequence and proposing its continuation,
        then VERIFIES the whole block in one (draft_len+1)-token forward.
        The batch-1 decode step is weight-stream-bound (every step reads
        all ~2.4 GB of bf16 weights; scripts/bench_decode.py), so the
        multi-token verify forward costs nearly the same as a 1-token
        step — each accepted draft is a free token. Greedy verification
        is lossless: every emitted token is the argmax continuation, so
        output is identical to plain greedy decoding token-for-token.
        RAG answers quote their retrieved context (which sits in the
        prompt), which is exactly the regime where prompt-lookup
        acceptance is high. (llama.cpp ships the same idea as its
        --spec-type lookup / self-speculation serving mode.)

        The prompt is LEFT-padded to `bucket` so cache slots stay
        contiguous with generation (slot = true position + pad); pads are
        masked via the per-query-position kv_valid mask and RoPE uses
        true positions. Compiled once per (bucket, max_tokens, draft_len,
        ngram) — same 32-wide-bucket compile keying as the batched route.
        """
        cache_key = ("spec", bucket, max_tokens, draft_len, ngram)
        if cache_key in self._prefill_cache:
            return self._prefill_cache[cache_key]
        model, config, max_len = self.model, self.config, self.max_len
        eos = getattr(self.tokenizer, "eos_id", -1)
        G, ng = draft_len, ngram
        n_win = max_len - ng  # candidate n-gram start slots

        @jax.jit
        def run(params, ids, pad):
            key_slot = jnp.arange(max_len, dtype=jnp.int32)
            win_idx = jnp.arange(n_win, dtype=jnp.int32)

            # -- prefill (left-padded): query at slot q sees keys [pad, q]
            cache = init_cache(config, 1, max_len)
            slots = jnp.arange(bucket, dtype=jnp.int32)
            kv_valid = (key_slot[None, None, :] >= pad) & (
                key_slot[None, None, :] <= slots[None, :, None]
            )
            logits, cache = model.apply(
                {"params": params},
                ids,
                positions=jnp.maximum(slots - pad, 0)[None, :],
                cache=cache,
                cache_pos=jnp.int32(0),
                kv_valid=kv_valid,
            )
            first = jnp.argmax(logits[0, -1, :]).astype(jnp.int32)

            # seq: slot-aligned token buffer, committed on [0, end);
            # the token at end-1 is committed but not yet in the cache.
            seq = jnp.zeros((max_len,), jnp.int32)
            seq = jax.lax.dynamic_update_slice(seq, ids[0], (0,))
            seq = seq.at[bucket].set(first)
            out = jnp.full((max_tokens + G + 1,), -1, jnp.int32)
            out = out.at[0].set(first)
            done = first == eos
            n = jnp.where(done, 0, 1).astype(jnp.int32)
            end = jnp.int32(bucket + 1)

            def cond(state):
                n, end, done, *_ = state
                return (n < max_tokens) & jnp.logical_not(done) & (
                    end <= max_len - G - 1
                )

            def body(state):
                n, end, done, seq, cache, out, iters = state
                # -- draft: most recent occurrence of the last `ng`
                # tokens, strictly before the suffix itself; its
                # continuation is the draft. A miss drafts junk from
                # slot 0 — still sound (verification only ever commits
                # argmax-matching tokens).
                last = jax.lax.dynamic_slice(seq, (end - ng,), (ng,))
                win = jnp.stack(
                    [seq[l:l + n_win] for l in range(ng)], axis=1
                )
                match = jnp.all(win == last[None, :], axis=1)
                valid = (win_idx >= pad) & (win_idx < end - ng)
                hit = match & valid
                # prefer the most recent match whose G-token continuation
                # is fully committed (real text); the most recent partial
                # match otherwise (its tail reads last block's unverified
                # predictions — often right on repetitive text, and junk
                # is sound: verification only commits argmax matches)
                i_full = jnp.max(
                    jnp.where(hit & (win_idx + ng + G <= end), win_idx, -1)
                )
                i_any = jnp.max(jnp.where(hit, win_idx, -1))
                i_best = jnp.where(i_full >= 0, i_full, i_any)
                start = jnp.where(i_best >= 0, i_best + ng, 0)
                drafts = jax.lax.dynamic_slice(seq, (start,), (G,))

                # -- verify block: [cur, d0..d_{G-1}] at slots
                # end-1 .. end-1+G. Stale draft K/V from the previous
                # iteration lives at slots >= this block's start, so the
                # block write overwrites it before any query can see it.
                block = jnp.concatenate(
                    [jax.lax.dynamic_slice(seq, (end - 1,), (1,)), drafts]
                )
                slots_b = end - 1 + jnp.arange(G + 1, dtype=jnp.int32)
                kv_valid = (key_slot[None, None, :] >= pad) & (
                    key_slot[None, None, :] <= slots_b[None, :, None]
                )
                logits, cache = model.apply(
                    {"params": params},
                    block[None, :],
                    positions=(slots_b - pad)[None, :],
                    cache=cache,
                    cache_pos=end - 1,
                    kv_valid=kv_valid,
                )
                g = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
                # accept the longest prefix of drafts matching argmax;
                # emitted tokens are g[0..m] (m accepted + 1 correction)
                m = jnp.sum(jnp.cumprod((drafts == g[:G]).astype(jnp.int32)))
                offs = jnp.arange(G + 1, dtype=jnp.int32)
                hit_eos = (offs <= m) & (g == eos)
                c = jnp.where(
                    jnp.any(hit_eos),
                    jnp.min(jnp.where(hit_eos, offs, G + 1)),
                    m + 1,
                )
                c = jnp.minimum(c, max_tokens - n)
                seq = jax.lax.dynamic_update_slice(seq, g, (end,))
                out = jax.lax.dynamic_update_slice(out, g, (n,))
                return (
                    n + c, end + c, jnp.any(hit_eos), seq, cache, out,
                    iters + 1,
                )

            n, end, done, seq, cache, out, iters = jax.lax.while_loop(
                cond, body, (n, end, done, seq, cache, out, jnp.int32(0))
            )
            # ONE result array: every extra return value is a separate
            # device->host transfer on the relay (~25-40 ms each) —
            # returning (out, n, iters) measured ~70 ms of extra fixed
            # cost per call (scripts/bench_spec.py)
            return jnp.concatenate([out, jnp.stack([n, iters])])

        self._prefill_cache[cache_key] = run
        return run

    # -- public API ---------------------------------------------------------------

    def generate_ids_spec(
        self,
        prompt_ids: Sequence[int],
        max_tokens: int = 128,
        draft_len: int = 7,
        ngram: int = 3,
        length_bucket: int = 32,
    ) -> List[int]:
        """Greedy generation with prompt-lookup speculative decoding —
        token-identical to plain greedy, typically 2-4x faster on RAG
        prompts whose answers quote the retrieved context."""
        clip = self.max_len - max_tokens - draft_len - 2
        prompt_ids = list(prompt_ids)[-clip:]
        bucket = min(
            -(-len(prompt_ids) // length_bucket) * length_bucket, clip
        )
        pad = bucket - len(prompt_ids)
        pad_id = getattr(self.tokenizer, "pad_id", 0)
        ids = np.full((1, bucket), pad_id, np.int32)
        ids[0, pad:] = prompt_ids
        run = self._spec_loop_fn(bucket, max_tokens, draft_len, ngram)
        buf = np.asarray(run(self.params, jnp.asarray(ids), jnp.int32(pad)))
        out, n, iters = buf[:-2], int(buf[-2]), int(buf[-1])
        # +1 forward for the prefill-sampled first token
        self.last_spec_stats = {
            "tokens": n,
            "forwards": iters + 1,
            "tokens_per_forward": n / max(iters + 1, 1),
        }
        out = out[:n]
        eos = getattr(self.tokenizer, "eos_id", None)
        return [int(t) for t in out if eos is None or t != eos]

    def generate_batch_device(
        self,
        prompts_ids: Sequence[Sequence[int]],
        max_tokens: int = 128,
        temperature: float = 0.0,
        top_p: float = 0.9,
        seed: int = 0,
        length_bucket: int = 32,
        top_k: int = 40,
        repeat_penalty: float = 1.0,
        frequency_penalty: float = 0.0,
        presence_penalty: float = 0.0,
    ) -> List[List[int]]:
        """Generate for a batch of (ragged) prompts in one device loop.

        llama.cpp penalty-chain parity: ``repeat_penalty`` (llama.cpp
        server default 1.1 — the reference's client never sets it, so
        llama.cpp's default silently shapes every reference answer),
        plus OpenAI-style frequency/presence penalties, all over the
        last PENALTY_LAST_N (=64) context tokens, applied before top-k
        and before greedy argmax. One value per call — the serving
        front-end groups same-sampler requests.

        The batch dimension is padded to the next power of two (pad rows
        replicate row 0 and are dropped from the result) so a serving
        front-end with variable group sizes compiles one loop per
        power-of-two bucket instead of one per exact size — decoder
        compiles cost minutes on relay-attached devices. Greedy outputs
        are unaffected; sampled rows draw from per-row keys split by the
        PADDED batch size, so a sampled call's stream depends on the
        bucket (any batch-size change already reseeded rows before).
        """
        batch = len(prompts_ids)
        if batch == 0:
            return []
        bpad = 1
        while bpad < batch:
            bpad *= 2
        clipped = [
            list(p)[-(self.max_len - max_tokens - 1):] for p in prompts_ids
        ]
        clipped += [clipped[0]] * (bpad - batch)
        longest = max(len(p) for p in clipped)
        bucket = min(
            -(-longest // length_bucket) * length_bucket,
            self.max_len - max_tokens - 1,
        )
        pad_id = getattr(self.tokenizer, "pad_id", 0)
        ids = np.full((bpad, bucket), pad_id, np.int32)
        lengths = np.zeros((bpad,), np.int32)
        for i, p in enumerate(clipped):
            ids[i, : len(p)] = p
            lengths[i] = len(p)
        penalized = (
            repeat_penalty != 1.0
            or frequency_penalty != 0.0
            or presence_penalty != 0.0
        )
        run = self._batch_loop_fn(bucket, max_tokens, bpad, top_k=top_k,
                                  penalized=penalized)
        out = np.asarray(
            run(
                self.params,
                jnp.asarray(ids),
                jnp.asarray(lengths),
                jax.random.PRNGKey(seed),
                jnp.float32(temperature),
                jnp.float32(top_p),
                jnp.asarray(
                    [repeat_penalty, frequency_penalty, presence_penalty],
                    jnp.float32,
                ),
            )
        )
        eos = getattr(self.tokenizer, "eos_id", None)
        results = []
        for row in out[:batch]:  # drop the batch-bucket pad rows
            tokens = [int(t) for t in row if t >= 0]
            if eos is not None:
                tokens = [t for t in tokens if t != eos]
            results.append(tokens)
        return results

    def _embed_fn(self, bucket: int, batch: int):
        """Jitted hidden-state embedding forward: (B, S) ids + mask ->
        L2-normalized mean-pooled final-norm hidden states (B, H).
        Compiled once per (length bucket, padded batch)."""
        cache_key = ("embed", bucket, batch)
        if cache_key in self._prefill_cache:
            return self._prefill_cache[cache_key]
        model = self.model

        @jax.jit
        def run(params, ids, mask):
            hidden = model.apply(
                {"params": params},
                ids,
                attention_mask=mask,
                return_hidden=True,
            ).astype(jnp.float32)
            m = mask.astype(jnp.float32)[:, :, None]
            pooled = (hidden * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
            norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
            return pooled / jnp.maximum(norm, 1e-12)

        self._prefill_cache[cache_key] = run
        return run

    def embed_batch(
        self,
        prompts_ids: Sequence[Sequence[int]],
        length_bucket: int = 32,
    ) -> np.ndarray:
        """Decoder-hidden-state embeddings for ragged token prompts.

        llama.cpp ``--embedding`` serving parity (the /embedding and
        /v1/embeddings endpoints): mean pooling over the prompt tokens
        of the final-norm hidden states, L2-normalized (llama.cpp's
        default --embd-normalize 2). Same compile-bounding conventions
        as generate_batch_device: power-of-two batch pad + 32-wide
        length buckets."""
        batch = len(prompts_ids)
        if batch == 0:
            return np.zeros((0, self.config.hidden_size), np.float32)
        bpad = 1
        while bpad < batch:
            bpad *= 2
        clipped = [list(p)[: self.max_len] or [0] for p in prompts_ids]
        clipped += [clipped[0]] * (bpad - batch)
        longest = max(len(p) for p in clipped)
        bucket = min(
            -(-longest // length_bucket) * length_bucket, self.max_len
        )
        pad_id = getattr(self.tokenizer, "pad_id", 0)
        ids = np.full((bpad, bucket), pad_id, np.int32)
        mask = np.zeros((bpad, bucket), np.int32)
        for i, p in enumerate(clipped):
            ids[i, : len(p)] = p
            mask[i, : len(p)] = 1
        run = self._embed_fn(bucket, bpad)
        out = np.asarray(
            run(self.params, jnp.asarray(ids), jnp.asarray(mask))
        )
        return out[:batch]

    def embed_text(self, texts: Sequence[str]) -> np.ndarray:
        """Tokenize + embed_batch (llama.cpp /embedding contract)."""
        return self.embed_batch(
            [self.tokenizer.encode(t) for t in texts]
        )

    def generate_ids_device(
        self,
        prompt_ids: Sequence[int],
        max_tokens: int = 128,
        temperature: float = 0.0,
        top_p: float = 0.9,
        seed: int = 0,
        top_k: int = 40,
        bucket_lengths: bool = True,
        speculative: Optional[bool] = None,
        repeat_penalty: float = 1.0,
        frequency_penalty: float = 0.0,
        presence_penalty: float = 0.0,
    ) -> List[int]:
        """Whole-generation device loop in one jitted call. Stops at EOS.

        By default the prompt routes through the ragged BATCH machinery
        at batch 1, so the compiled function is keyed by the 32-wide
        LENGTH BUCKET — serving mixed prompt lengths costs one compile
        per bucket instead of one per exact length (each new shape is a
        30s-5min remote compile on the relay). bucket_lengths=False
        keeps the independent exact-length loop (same outputs — the
        batched-vs-single parity test runs both implementations).

        Greedy requests (temperature <= 0) default to the prompt-lookup
        SPECULATIVE loop — token-identical output, one multi-token
        verify forward per several emitted tokens (decode is
        weight-stream-bound, so accepted drafts are ~free). Pass
        speculative=False to force the plain one-token-per-step loop.
        """
        penalized = (
            repeat_penalty != 1.0
            or frequency_penalty != 0.0
            or presence_penalty != 0.0
        )
        if speculative is None:
            # prompt-lookup speculation verifies against PLAIN argmax;
            # penalties change the argmax, so penalized greedy requests
            # take the one-token-per-step loop instead.
            speculative = temperature <= 0.0 and not penalized
        if speculative and temperature <= 0.0 and not penalized:
            return self.generate_ids_spec(
                prompt_ids, max_tokens=max_tokens
            )
        if bucket_lengths:
            return self.generate_batch_device(
                [prompt_ids], max_tokens=max_tokens,
                temperature=temperature, top_p=top_p, seed=seed,
                top_k=top_k, repeat_penalty=repeat_penalty,
                frequency_penalty=frequency_penalty,
                presence_penalty=presence_penalty,
            )[0]
        prompt_ids = list(prompt_ids)[-(self.max_len - max_tokens - 1):]
        run = self._device_loop_fn(len(prompt_ids), max_tokens, top_k=top_k,
                                   penalized=penalized)
        out, count = run(
            self.params,
            jnp.asarray([prompt_ids], jnp.int32),
            jax.random.PRNGKey(seed),
            jnp.float32(temperature),
            jnp.float32(top_p),
            jnp.asarray(
                [repeat_penalty, frequency_penalty, presence_penalty],
                jnp.float32,
            ),
        )
        out = np.asarray(out)[: int(count)]
        eos = getattr(self.tokenizer, "eos_id", None)
        return [int(t) for t in out if eos is None or t != eos]

    def generate_ids(
        self,
        prompt_ids: Sequence[int],
        max_tokens: int = 128,
        temperature: float = 0.0,
        top_p: float = 0.9,
        stop_ids: Optional[Sequence[int]] = None,
        seed: int = 0,
        top_k: int = 40,
    ) -> List[int]:
        stop = set(stop_ids or [])
        eos = getattr(self.tokenizer, "eos_id", None)
        if eos is not None:
            stop.add(eos)
        prompt_ids = list(prompt_ids)[-(self.max_len - max_tokens - 1):]
        ids = jnp.asarray([prompt_ids], jnp.int32)
        logits, cache = self._prefill_fn(len(prompt_ids))(self.params, ids)
        step = self._step_fn()
        key = jax.random.PRNGKey(seed)
        out: List[int] = []
        pos = len(prompt_ids)
        key, sub = jax.random.split(key)
        token = int(
            self._sample(
                logits[0], sub, jnp.float32(temperature),
                jnp.float32(top_p), top_k=top_k,
            )
        )
        for _ in range(max_tokens):
            if token in stop or pos >= self.max_len - 1:
                break
            out.append(token)
            logits, cache = step(
                self.params, jnp.int32(token), jnp.int32(pos), cache
            )
            pos += 1
            key, sub = jax.random.split(key)
            token = int(
                self._sample(
                    logits, sub, jnp.float32(temperature),
                    jnp.float32(top_p), top_k=top_k,
                )
            )
        return out

    def generate_text(
        self,
        prompt: str,
        max_tokens: int = 128,
        temperature: float = 0.0,
        top_p: float = 0.9,
        stop: Optional[Sequence[str]] = None,
        seed: int = 0,
        top_k: int = 40,
    ) -> str:
        prompt_ids = self.tokenizer.encode(prompt)
        out_ids = self.generate_ids(
            prompt_ids,
            max_tokens=max_tokens,
            temperature=temperature,
            top_p=top_p,
            seed=seed,
            top_k=top_k,
        )
        text = self.tokenizer.decode(out_ids)
        for marker in stop or []:
            idx = text.find(marker)
            if idx >= 0:
                text = text[:idx]
        return text
