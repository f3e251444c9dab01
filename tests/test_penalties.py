"""llama.cpp sampler-chain penalty parity (repeat/frequency/presence).

Reference behavior: the reference's client never sets repeat_penalty
(src/llama_client.py:83-90), so the llama.cpp SERVER default applies to
every reference answer (1.1 on older builds, 1.0 on modern ones). The
chain runs penalties over the last repeat_last_n(=64) context tokens
BEFORE top-k/top-p and before greedy argmax (llama-sampling.cpp,
llama_sampler_penalties_apply): positive logits divide by the repeat
penalty, negative multiply; frequency/presence subtract OpenAI-style.
"""
import json
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from persian_rag_tpu.gen.continuous import ContinuousBatcher
from persian_rag_tpu.gen.generator import (
    PENALTY_LAST_N,
    TextGenerator,
    _penalize,
    _recent_window,
)
from persian_rag_tpu.models.decoder import DecoderConfig

PROMPT = [5, 9, 200, 31, 7, 88]


@pytest.fixture(scope="module")
def gen():
    return TextGenerator(
        DecoderConfig.tiny(compute_dtype=jnp.bfloat16), max_len=64, seed=0
    )


def test_penalize_semantics():
    logits = jnp.array([2.0, -1.0, 0.5, 3.0], jnp.float32)
    recent = jnp.array([0, 1, 1, 99], jnp.int32)  # 99 OOB -> dropped
    pen = jnp.array([2.0, 0.5, 0.25], jnp.float32)
    out = np.asarray(_penalize(logits, recent, pen))
    # id0 seen once, positive: 2/2 - 1*0.5 - 0.25
    # id1 seen twice, negative: -1*2 - 2*0.5 - 0.25
    assert np.allclose(out, [0.25, -3.25, 0.5, 3.0])


def test_penalize_neutral_is_exact_identity():
    logits = jnp.array([2.0, -1.0, 0.5, 3.0], jnp.float32)
    recent = jnp.array([0, 1, 1, 3], jnp.int32)
    out = _penalize(logits, recent, jnp.array([1.0, 0.0, 0.0]))
    assert np.array_equal(np.asarray(out), np.asarray(logits))


def test_recent_window_short_prompt_sentinel():
    w = np.asarray(
        _recent_window(jnp.array([7, 8, 9, 0, 0], jnp.int32),
                       jnp.int32(3), 50)
    )
    assert w.shape == (PENALTY_LAST_N,)
    assert list(w[-3:]) == [7, 8, 9]
    # out-of-window slots hold the vocab-size sentinel, NOT -1 (which
    # would wrap to the last vocab id in the penalty scatter)
    assert all(x == 50 for x in w[:-3])


def test_neutral_penalties_keep_greedy_output(gen):
    base = gen.generate_ids_device(
        PROMPT, max_tokens=12, temperature=0.0, speculative=False
    )
    same = gen.generate_batch_device(
        [PROMPT], max_tokens=12, temperature=0.0, repeat_penalty=1.0
    )[0]
    assert base == same


def test_repeat_penalty_breaks_greedy_loop(gen):
    base = gen.generate_ids_device(
        PROMPT, max_tokens=12, temperature=0.0, speculative=False
    )
    # random tiny models greedily fall into short repetition cycles;
    # a strong repeat penalty must change the trajectory
    pen = gen.generate_ids_device(
        PROMPT, max_tokens=12, temperature=0.0, repeat_penalty=5.0
    )
    assert pen != base
    # presence=100 makes any repeat within the 64-token window
    # impossible (every seen token's logit drops by 100)
    nodup = gen.generate_ids_device(
        PROMPT, max_tokens=12, temperature=0.0, presence_penalty=100.0
    )
    assert len(set(nodup)) == len(nodup)


@pytest.mark.slow
def test_unbucketed_loop_matches_bucketed(gen):
    a = gen.generate_ids_device(
        PROMPT, max_tokens=10, temperature=0.0, repeat_penalty=2.0,
        bucket_lengths=True,
    )
    b = gen.generate_ids_device(
        PROMPT, max_tokens=10, temperature=0.0, repeat_penalty=2.0,
        bucket_lengths=False, speculative=False,
    )
    assert a == b


@pytest.mark.slow
def test_continuous_penalized_matches_device_loop(gen):
    # greedy + penalties is key-independent (penalized argmax), so the
    # batcher must reproduce the device-loop output exactly — while a
    # neutral row in the same batch keeps plain-greedy parity.
    want_pen = gen.generate_ids_device(
        PROMPT, max_tokens=10, temperature=0.0, repeat_penalty=3.0
    )
    want_plain = gen.generate_ids_device(
        [9, 8, 7, 6], max_tokens=10, temperature=0.0, speculative=False
    )
    b = ContinuousBatcher(gen, batch=2, segment=8)
    r_pen = b.submit(PROMPT, max_tokens=10, repeat_penalty=3.0)
    r_plain = b.submit([9, 8, 7, 6], max_tokens=10)
    done = {r.req_id: r for r in b.run_until_drained()}
    assert done[r_pen].tokens == want_pen
    assert done[r_plain].tokens == want_plain


@pytest.mark.slow
def test_continuous_spec_penalized_row(gen):
    # speculative scheduler: penalized greedy rows disable draft
    # acceptance (one penalized token per verify forward) but must stay
    # token-identical to the plain penalized device loop
    want = gen.generate_ids_device(
        PROMPT, max_tokens=10, temperature=0.0, repeat_penalty=3.0
    )
    b = ContinuousBatcher(gen, batch=2, segment=8, speculative=True)
    rid = b.submit(PROMPT, max_tokens=10, repeat_penalty=3.0)
    done = {r.req_id: r for r in b.run_until_drained()}
    got = [t for t in done[rid].tokens if t != b.eos]
    assert got == want


@pytest.mark.slow
def test_server_penalty_and_n_predict():
    from persian_rag_tpu.gen.local_server import LocalGenerationServer

    cfg = DecoderConfig.tiny(compute_dtype=jnp.bfloat16)
    g = TextGenerator(cfg, max_len=64, seed=0)
    srv = LocalGenerationServer(g, port=0).start()
    try:
        def post(payload):
            req = urllib.request.Request(
                srv.url + "/completion",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                return json.loads(r.read())["content"]

        base = post({"prompt": "hi", "n_predict": 8})
        pen = post({"prompt": "hi", "n_predict": 8,
                    "repeat_penalty": 5.0})
        # n_predict (llama.cpp's native field) caps the emission
        assert len(g.tokenizer.encode(base, add_bos=False)) <= 8 + 2
        assert pen != base
    finally:
        srv.stop()


# ---------------------------------------------------------------------------
# SSE streaming (llama.cpp "stream": true / OpenAI chat chunks)
# ---------------------------------------------------------------------------


def _read_sse(resp):
    frames = []
    buf = b""
    while True:
        chunk = resp.read(1)
        if not chunk:
            break
        buf += chunk
        while b"\n\n" in buf:
            frame, buf = buf.split(b"\n\n", 1)
            if frame.startswith(b"data: "):
                frames.append(frame[6:].decode())
    return frames


def _stream_request(url, path, payload):
    req = urllib.request.Request(
        url + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        return _read_sse(r)


@pytest.mark.parametrize("continuous", [False, True])
def test_streaming_completion(continuous):
    from persian_rag_tpu.gen.local_server import LocalGenerationServer

    cfg = DecoderConfig.tiny(compute_dtype=jnp.bfloat16)
    g = TextGenerator(cfg, max_len=64, seed=0)
    srv = LocalGenerationServer(g, port=0, continuous=continuous).start()
    try:
        # non-streamed reference for the same request
        req = urllib.request.Request(
            srv.url + "/completion",
            data=json.dumps({"prompt": "hi", "n_predict": 12}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            want = json.loads(r.read())["content"]

        frames = _stream_request(
            srv.url, "/completion",
            {"prompt": "hi", "n_predict": 12, "stream": True},
        )
        objs = [json.loads(f) for f in frames]
        assert objs, "no SSE frames"
        assert objs[-1]["stop"] is True
        assert all(o["stop"] is False for o in objs[:-1])
        got = "".join(o["content"] for o in objs)
        assert got == want  # greedy: streamed == non-streamed

        # OpenAI chat chunk format with the [DONE] sentinel
        frames = _stream_request(
            srv.url, "/v1/chat/completions",
            {"messages": [{"role": "user", "content": "hi"}],
             "max_tokens": 8, "stream": True},
        )
        assert frames[-1] == "[DONE]"
        chunks = [json.loads(f) for f in frames[:-1]]
        assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
        assert all(
            c["object"] == "chat.completion.chunk" for c in chunks
        )
    finally:
        srv.stop()


def test_streaming_stop_marker_frees_slot():
    from persian_rag_tpu.gen.local_server import LocalGenerationServer

    cfg = DecoderConfig.tiny(compute_dtype=jnp.bfloat16)
    g = TextGenerator(cfg, max_len=64, seed=0)
    srv = LocalGenerationServer(g, port=0, continuous=True).start()
    try:
        # find what greedy emits, then stop on an early substring
        req = urllib.request.Request(
            srv.url + "/completion",
            data=json.dumps({"prompt": "hi", "n_predict": 16}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            full = json.loads(r.read())["content"]
        if len(full) < 3:
            pytest.skip("tiny model answered too short to split")
        marker = full[2:4]
        frames = _stream_request(
            srv.url, "/completion",
            {"prompt": "hi", "n_predict": 16, "stream": True,
             "stop": [marker]},
        )
        got = "".join(json.loads(f)["content"] for f in frames)
        assert got == full[: full.find(marker)]
    finally:
        srv.stop()
