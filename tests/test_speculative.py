"""Prompt-lookup speculative decoding: lossless greedy parity + real
acceptance.

Greedy speculative decoding must emit EXACTLY the plain greedy token
stream (every committed token is an argmax continuation); the win is
fewer forwards. The reference serves generation through llama.cpp
(reference: src/llama_client.py:10), whose sampler this path matches at
temperature 0.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from persian_rag_tpu.models.decoder import DecoderConfig
from persian_rag_tpu.gen.generator import ByteTokenizer, TextGenerator


def _tiny_gen(max_len=192, seed=0):
    return TextGenerator(
        DecoderConfig.tiny(
            vocab_size=ByteTokenizer.vocab_size, max_position_embeddings=256
        ),
        tokenizer=ByteTokenizer(),
        max_len=max_len,
        seed=seed,
    )


def _zero_layer_params(params):
    """Zero every layer's output projections so the residual stream is
    the raw embedding: greedy then repeats the last token forever
    (self-similarity wins the tied-embedding logit), giving a
    deterministic high-acceptance regime for the lookup drafter."""
    p = jax.tree.map(lambda x: x, params)  # shallow-ish copy via rebuild
    for name, layer in p.items():
        if not name.startswith("layer_"):
            continue
        for path in (("attention", "o_proj"), ("mlp", "down_proj")):
            node = layer
            for k in path:
                node = node[k]
            node["kernel"] = jnp.zeros_like(node["kernel"])
    return p


def test_spec_matches_plain_greedy_random_model():
    # random weights: drafts almost never accepted -> exercises the
    # m=0 correction path; output must still be identical
    gen = _tiny_gen()
    prompt = gen.tokenizer.encode("درمان بیماری قلبی چیست؟")
    plain = gen.generate_ids_device(
        prompt, max_tokens=24, speculative=False
    )
    spec = gen.generate_ids_spec(prompt, max_tokens=24)
    assert spec == plain
    assert gen.last_spec_stats["tokens"] == len(spec)


def test_spec_accepts_drafts_on_repetitive_continuation():
    gen = _tiny_gen()
    gen.params = _zero_layer_params(gen.params)
    prompt = gen.tokenizer.encode("abcabc")
    plain = gen.generate_ids_device(
        prompt, max_tokens=40, speculative=False
    )
    spec = gen.generate_ids_spec(prompt, max_tokens=40, draft_len=7)
    assert spec == plain
    stats = gen.last_spec_stats
    # the degenerate model repeats one token; after the first few steps
    # every 7-token draft is accepted, so forwards << tokens
    assert stats["tokens"] == 40
    assert stats["forwards"] <= 12, stats
    assert stats["tokens_per_forward"] > 3.0


def test_spec_is_default_for_greedy_single_prompt():
    gen = _tiny_gen()
    prompt = gen.tokenizer.encode("سلام")
    out = gen.generate_ids_device(prompt, max_tokens=8)  # temperature 0
    assert hasattr(gen, "last_spec_stats")  # routed through the spec loop
    assert out == gen.generate_ids_device(
        prompt, max_tokens=8, speculative=False
    )


def test_spec_eos_handling_matches_plain():
    # force a model that reaches EOS quickly: bias the embedding so EOS
    # has a huge norm -> argmax lands on EOS after the first step
    gen = _tiny_gen()
    emb = np.array(gen.params["embed_tokens"]["embedding"])
    emb[gen.tokenizer.eos_id] *= 50.0
    gen.params["embed_tokens"]["embedding"] = jnp.asarray(emb)
    prompt = gen.tokenizer.encode("hi")
    plain = gen.generate_ids_device(
        prompt, max_tokens=16, speculative=False
    )
    spec = gen.generate_ids_spec(prompt, max_tokens=16)
    assert spec == plain
    assert len(spec) < 16  # EOS actually fired


@pytest.mark.slow
def test_spec_respects_max_tokens_budget_mid_block():
    # budget that is NOT a multiple of the (draft+1) block size, on the
    # high-acceptance model: the final block must truncate exactly
    gen = _tiny_gen()
    gen.params = _zero_layer_params(gen.params)
    prompt = gen.tokenizer.encode("xyxyxy")
    for budget in (5, 13, 17):
        plain = gen.generate_ids_device(
            prompt, max_tokens=budget, speculative=False
        )
        spec = gen.generate_ids_spec(prompt, max_tokens=budget)
        assert spec == plain
        assert len(spec) <= budget


def test_spec_batched_prompt_lengths_share_bucket_compile():
    gen = _tiny_gen()
    a = gen.tokenizer.encode("ab")
    b = gen.tokenizer.encode("abcdefgh")
    gen.generate_ids_spec(a, max_tokens=4)
    keys = [k for k in gen._prefill_cache if k[0] == "spec"]
    gen.generate_ids_spec(b, max_tokens=4)
    keys2 = [k for k in gen._prefill_cache if k[0] == "spec"]
    assert keys == keys2  # same 32-wide bucket -> no new compile key
