"""Speculation routing contract (VERDICT r4 #8).

Prompt-lookup speculative decoding verifies drafts against PLAIN greedy
argmax, so only NEUTRAL greedy requests ride it; any llama.cpp
penalty-chain setting (repeat_penalty != 1.0, frequency/presence != 0)
or sampling temperature routes to the one-token-per-step loop. This is
a silent perf cliff for clients that copy OLD llama.cpp server defaults
(repeat_penalty 1.1) — these tests pin the routing decision so a change
is a deliberate act, and MIGRATION.md documents which request shapes
keep speculation. The reference's own client always samples
(temperature=0.05, top_p=0.85 — reference: src/llama_client.py:204-247)
and never sets penalties, so reference-shaped requests never ride
speculation either way; modern llama.cpp defaults (repeat_penalty 1.0)
DO keep greedy requests on the speculative path.
"""
import numpy as np
import pytest

from persian_rag_tpu.gen.generator import ByteTokenizer, TextGenerator
from persian_rag_tpu.models.decoder import DecoderConfig


@pytest.fixture(scope="module")
def gen():
    return TextGenerator(
        DecoderConfig.tiny(
            vocab_size=ByteTokenizer.vocab_size,
            max_position_embeddings=256,
        ),
        tokenizer=ByteTokenizer(),
        max_len=192,
        seed=0,
    )


def _route(gen, monkeypatch, **kwargs):
    """Returns 'spec' when generate_ids_device takes the speculative
    loop, 'plain' otherwise (both stubbed — routing only, no device
    work beyond what the stubs skip)."""
    calls = []
    monkeypatch.setattr(
        gen, "generate_ids_spec",
        lambda *a, **k: calls.append("spec") or [1],
    )
    monkeypatch.setattr(
        gen, "generate_batch_device",
        lambda *a, **k: calls.append("plain") or [[1]],
    )
    gen.generate_ids_device([65, 66, 67], max_tokens=4, **kwargs)
    assert len(calls) == 1
    return calls[0]


def test_neutral_greedy_rides_speculation(gen, monkeypatch):
    assert _route(gen, monkeypatch, temperature=0.0) == "spec"


def test_modern_llamacpp_defaults_keep_speculation(gen, monkeypatch):
    # modern llama.cpp server default: repeat_penalty 1.0 (neutral)
    assert _route(
        gen, monkeypatch, temperature=0.0, repeat_penalty=1.0,
        frequency_penalty=0.0, presence_penalty=0.0,
    ) == "spec"


@pytest.mark.parametrize("pen", [
    {"repeat_penalty": 1.1},        # OLD llama.cpp server default
    {"frequency_penalty": 0.5},
    {"presence_penalty": 0.25},
])
def test_penalized_greedy_routes_off_speculation(gen, monkeypatch, pen):
    assert _route(gen, monkeypatch, temperature=0.0, **pen) == "plain"


def test_sampled_requests_route_off_speculation(gen, monkeypatch):
    # the reference client's own shape: temperature 0.05, top_p 0.85
    assert _route(
        gen, monkeypatch, temperature=0.05, top_p=0.85
    ) == "plain"


def test_explicit_flag_overrides_default(gen, monkeypatch):
    assert _route(gen, monkeypatch, temperature=0.0,
                  speculative=False) == "plain"
    # speculative=True on a penalized request must NOT force the spec
    # loop (it would change the token stream); the guard keeps it plain
    assert _route(gen, monkeypatch, temperature=0.0,
                  repeat_penalty=1.1, speculative=True) == "plain"


def test_penalized_greedy_output_matches_plain_loop(gen):
    """The routed-to path itself: penalized greedy through
    generate_ids_device equals the explicit plain loop with the same
    penalties (no silent speculation sneaking in)."""
    prompt = gen.tokenizer.encode("سلام دارو")
    via_route = gen.generate_ids_device(
        prompt, max_tokens=8, temperature=0.0, repeat_penalty=1.3,
    )
    explicit = gen.generate_ids_device(
        prompt, max_tokens=8, temperature=0.0, repeat_penalty=1.3,
        speculative=False,
    )
    assert via_route == explicit
    # penalty semantics themselves are pinned in tests/test_penalties.py
