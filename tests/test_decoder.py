"""Decoder parity vs torch LlamaForCausalLM, KV-cache consistency,
generation, LoRA SFT, and the local generation server."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from persian_rag_tpu.models.decoder import (
    DecoderConfig,
    LlamaDecoder,
    init_cache,
    params_from_llama,
)

TINY = DecoderConfig.tiny()


@pytest.mark.slow
def test_llama_parity_vs_torch(rng):
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_config = LlamaConfig(
        vocab_size=256,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=64,
        max_position_embeddings=64,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=True,
        attention_dropout=0.0,
    )
    model = LlamaForCausalLM(hf_config).eval()
    ids = rng.integers(1, 256, size=(2, 11)).astype(np.int64)
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids)).logits.numpy()

    config = DecoderConfig(
        vocab_size=256, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, max_position_embeddings=64,
        rope_theta=10000.0,
    )
    params = params_from_llama(model.state_dict(), config)
    got = np.asarray(
        LlamaDecoder(config).apply({"params": params}, jnp.asarray(ids))
    )
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


@pytest.mark.slow
def test_kv_cache_matches_full_forward(rng):
    decoder = LlamaDecoder(TINY)
    ids = jnp.asarray(rng.integers(1, 512, size=(1, 9)), jnp.int32)
    params = decoder.init(jax.random.PRNGKey(0), ids)["params"]
    full_logits = decoder.apply({"params": params}, ids)

    # prefill first 5 tokens, then decode 4 single steps through the cache
    cache = init_cache(TINY, 1, 16)
    positions = jnp.arange(5, dtype=jnp.int32)[None, :]
    logits, cache = decoder.apply(
        {"params": params},
        ids[:, :5],
        positions=positions,
        cache=cache,
        cache_pos=jnp.int32(0),
    )
    np.testing.assert_allclose(
        np.asarray(logits[0, -1]), np.asarray(full_logits[0, 4]),
        rtol=2e-4, atol=2e-4,
    )
    for t in range(5, 9):
        logits, cache = decoder.apply(
            {"params": params},
            ids[:, t : t + 1],
            positions=jnp.full((1, 1), t, jnp.int32),
            cache=cache,
            cache_pos=jnp.int32(t),
        )
        np.testing.assert_allclose(
            np.asarray(logits[0, -1]), np.asarray(full_logits[0, t]),
            rtol=2e-4, atol=2e-4,
        )


def test_generate_greedy_deterministic():
    from persian_rag_tpu.gen.generator import ByteTokenizer, TextGenerator

    gen = TextGenerator(
        DecoderConfig.tiny(vocab_size=ByteTokenizer.vocab_size),
        tokenizer=ByteTokenizer(),
        max_len=64,
    )
    out1 = gen.generate_ids(gen.tokenizer.encode("سلام"), max_tokens=8)
    out2 = gen.generate_ids(gen.tokenizer.encode("سلام"), max_tokens=8)
    assert out1 == out2
    assert len(out1) <= 8


def test_generate_sampling_seeded():
    from persian_rag_tpu.gen.generator import ByteTokenizer, TextGenerator

    gen = TextGenerator(
        DecoderConfig.tiny(vocab_size=ByteTokenizer.vocab_size),
        tokenizer=ByteTokenizer(),
        max_len=64,
    )
    ids = gen.tokenizer.encode("test")
    a = gen.generate_ids(ids, max_tokens=8, temperature=1.0, seed=1)
    b = gen.generate_ids(ids, max_tokens=8, temperature=1.0, seed=1)
    assert a == b  # same seed, same draw


@pytest.mark.slow
def test_lora_sft_reduces_loss():
    from persian_rag_tpu.gen.generator import ByteTokenizer
    from persian_rag_tpu.train.lora import LoraTrainer, init_lora, merge_lora

    config = DecoderConfig.tiny(vocab_size=ByteTokenizer.vocab_size)
    decoder = LlamaDecoder(config)
    params = decoder.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)
    )["params"]

    qa = [
        {"question": "دارو چیست؟", "answer": "ماده درمانی"},
        {"question": "قلب چیست؟", "answer": "عضو پمپاژ"},
    ] * 8
    trainer = LoraTrainer(config, params, rank=4, alpha=4.0)
    summary = trainer.fit(qa, epochs=3, batch_size=4, max_len=48, log_every=1)
    losses = summary["losses"]
    assert np.mean(losses[-3:]) < np.mean(losses[:3])

    # LoRA B starts at zero -> merged == base before training
    fresh = init_lora(params, rank=4)
    merged0 = merge_lora(params, fresh, alpha=4.0, rank=4)
    k0 = merged0["layer_0"]["attention"]["q_proj"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(k0),
        np.asarray(params["layer_0"]["attention"]["q_proj"]["kernel"]),
    )
    # after training the merged kernels differ
    merged = trainer.merged_params()
    k1 = merged["layer_0"]["attention"]["q_proj"]["kernel"]
    assert not np.allclose(np.asarray(k1), np.asarray(k0))


@pytest.mark.slow
def test_local_server_speaks_llamacpp_contract():
    from persian_rag_tpu.gen.client import LlamaClient
    from persian_rag_tpu.gen.generator import ByteTokenizer, TextGenerator
    from persian_rag_tpu.gen.local_server import LocalGenerationServer

    gen = TextGenerator(
        DecoderConfig.tiny(vocab_size=ByteTokenizer.vocab_size),
        tokenizer=ByteTokenizer(),
        max_len=96,
    )
    with LocalGenerationServer(gen) as url:
        client = LlamaClient(url)
        assert client.connected
        info = client.get_server_info()
        assert "/completion" in info["endpoints"]
        # raw contract check (random weights may emit an instant EOS, so
        # assert the HTTP shape rather than non-empty text)
        import requests

        r = requests.post(
            url + "/completion",
            json={"prompt": "دارو چیست؟", "max_tokens": 8},
            timeout=60,
        )
        assert r.status_code == 200 and "content" in r.json()
        r = requests.post(
            url + "/v1/chat/completions",
            json={
                "messages": [{"role": "user", "content": "سلام"}],
                "max_tokens": 4,
            },
            timeout=60,
        )
        assert r.status_code == 200
        assert "content" in r.json()["choices"][0]["message"]


def test_local_server_extended_llamacpp_surface():
    """/tokenize, /detokenize, /embedding, /v1/embeddings, /props and
    /slots — the rest of the llama.cpp server contract beyond what the
    reference's client touches."""
    import requests

    from persian_rag_tpu.gen.generator import ByteTokenizer, TextGenerator
    from persian_rag_tpu.gen.local_server import LocalGenerationServer

    gen = TextGenerator(
        DecoderConfig.tiny(vocab_size=ByteTokenizer.vocab_size),
        tokenizer=ByteTokenizer(),
        max_len=96,
    )
    with LocalGenerationServer(gen, max_batch=3) as url:
        # tokenize: llama.cpp's add_special defaults to false (no BOS)
        r = requests.post(
            url + "/tokenize", json={"content": "دارو"}, timeout=30
        )
        toks = r.json()["tokens"]
        assert r.status_code == 200
        assert toks == gen.tokenizer.encode("دارو", add_bos=False)
        r2 = requests.post(
            url + "/tokenize",
            json={"content": "دارو", "add_special": True},
            timeout=30,
        )
        assert r2.json()["tokens"] == gen.tokenizer.encode("دارو")

        # detokenize roundtrip
        r = requests.post(
            url + "/detokenize", json={"tokens": toks}, timeout=30
        )
        assert r.json()["content"] == "دارو"

        # embedding: hidden-size vector, L2-normalized
        r = requests.post(
            url + "/embedding", json={"content": "دارو چیست؟"}, timeout=60
        )
        emb = np.asarray(r.json()["embedding"])
        assert emb.shape == (gen.config.hidden_size,)
        assert abs(np.linalg.norm(emb) - 1.0) < 1e-4

        # OpenAI-style batch embeddings
        r = requests.post(
            url + "/v1/embeddings",
            json={"input": ["دارو چیست؟", "هوا آفتابی است"]},
            timeout=60,
        )
        data = r.json()["data"]
        assert [d["index"] for d in data] == [0, 1]
        # same text through both endpoints -> same vector (and batch
        # padding does not perturb row 0)
        np.testing.assert_allclose(
            np.asarray(data[0]["embedding"]), emb, atol=1e-5
        )
        assert not np.allclose(
            np.asarray(data[1]["embedding"]), emb, atol=1e-3
        )

        # props + slots observability
        props = requests.get(url + "/props", timeout=30).json()
        assert props["total_slots"] == 3
        assert props["default_generation_settings"]["n_ctx"] == 96
        slots = requests.get(url + "/slots", timeout=30).json()
        assert len(slots) == 3
        assert all(s["state"] == 0 for s in slots)

        # POST-only endpoints 405 GET probes (llama.cpp behavior)
        assert requests.get(url + "/tokenize").status_code == 405
        assert requests.get(url + "/embedding").status_code == 405


def test_embed_batch_mask_and_bucket_invariance():
    """Mean-pool masking: a text's embedding is identical alone vs
    padded into a batch with a longer text (and across length buckets)."""
    from persian_rag_tpu.gen.generator import ByteTokenizer, TextGenerator

    gen = TextGenerator(
        DecoderConfig.tiny(vocab_size=ByteTokenizer.vocab_size),
        tokenizer=ByteTokenizer(),
        max_len=96,
    )
    short = gen.tokenizer.encode("دارو")
    long = gen.tokenizer.encode(
        "a deliberately much longer prompt that lands in a wider bucket"
    )
    alone = gen.embed_batch([short])
    together = gen.embed_batch([short, long])
    np.testing.assert_allclose(together[0], alone[0], atol=1e-5)
    assert together.shape == (2, gen.config.hidden_size)
    # empty input edge
    assert gen.embed_batch([]).shape == (0, gen.config.hidden_size)


@pytest.mark.slow
def test_device_loop_matches_host_loop_greedy():
    from persian_rag_tpu.gen.generator import ByteTokenizer, TextGenerator

    gen = TextGenerator(
        DecoderConfig.tiny(vocab_size=ByteTokenizer.vocab_size),
        tokenizer=ByteTokenizer(),
        max_len=96,
    )
    prompt = gen.tokenizer.encode("سوال: دارو چیست؟\nپاسخ: ")
    host = gen.generate_ids(prompt, max_tokens=12)
    # exact-length loop AND the default bucketed (batch-1) route must
    # both match the host loop
    device = gen.generate_ids_device(prompt, max_tokens=12,
                                     bucket_lengths=False)
    bucketed = gen.generate_ids_device(prompt, max_tokens=12)
    assert host == device == bucketed


@pytest.mark.slow
def test_lora_dp_matches_single_device():
    from persian_rag_tpu.core.mesh import build_mesh
    from persian_rag_tpu.gen.generator import ByteTokenizer
    from persian_rag_tpu.train.lora import LoraTrainer

    config = DecoderConfig.tiny(vocab_size=ByteTokenizer.vocab_size)
    decoder = LlamaDecoder(config)
    params = decoder.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)
    )["params"]
    qa = [
        {"question": f"سوال {i}", "answer": f"پاسخ {i}"} for i in range(8)
    ]
    t1 = LoraTrainer(config, params, rank=2, alpha=2.0, seed=1)
    s1 = t1.fit(qa, epochs=1, batch_size=8, max_len=32, log_every=1)
    mesh = build_mesh(corpus_axis=1, data_axis=8)
    t2 = LoraTrainer(config, params, rank=2, alpha=2.0, mesh=mesh, seed=1)
    s2 = t2.fit(qa, epochs=1, batch_size=8, max_len=32, log_every=1)
    np.testing.assert_allclose(s1["losses"], s2["losses"], rtol=1e-4)


@pytest.mark.slow
def test_batched_generation_matches_per_prompt_greedy():
    from persian_rag_tpu.gen.generator import ByteTokenizer, TextGenerator

    gen = TextGenerator(
        DecoderConfig.tiny(vocab_size=ByteTokenizer.vocab_size),
        tokenizer=ByteTokenizer(),
        max_len=128,
    )
    prompts = [
        gen.tokenizer.encode("سوال: دارو چیست؟\nپاسخ: "),
        gen.tokenizer.encode("short"),
        gen.tokenizer.encode("a much longer prompt with many more tokens in it"),
    ]
    batched = gen.generate_batch_device(prompts, max_tokens=10)
    for prompt, got in zip(prompts, batched):
        # bucket_lengths=False keeps this comparing two INDEPENDENT
        # implementations (the default single-prompt route shares the
        # batch machinery)
        want = gen.generate_ids_device(prompt, max_tokens=10,
                                       bucket_lengths=False)
        assert got == want, (got, want)


@pytest.mark.slow
def test_local_server_microbatches_concurrent_requests():
    import threading

    import requests

    from persian_rag_tpu.gen.generator import ByteTokenizer, TextGenerator
    from persian_rag_tpu.gen.local_server import LocalGenerationServer

    gen = TextGenerator(
        DecoderConfig.tiny(vocab_size=ByteTokenizer.vocab_size),
        tokenizer=ByteTokenizer(),
        max_len=128,
    )
    with LocalGenerationServer(gen, max_wait_ms=50) as url:
        results = [None] * 4
        def hit(i):
            r = requests.post(
                url + "/completion",
                json={"prompt": f"سوال {i}", "max_tokens": 6},
                timeout=120,
            )
            results[i] = r.json()
        threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r is not None and "content" in r for r in results)
        # batched greedy must equal the single-prompt result
        single = requests.post(
            url + "/completion",
            json={"prompt": "سوال 2", "max_tokens": 6},
            timeout=120,
        ).json()
        assert results[2]["content"] == single["content"]


def test_decoder_config_from_hf_maps_llama_fields():
    """from_hf consumes the HF LlamaForCausalLM config.json schema (the
    format gen-serve --checkpoint loads; reference fine-tunes exactly
    this architecture in its notebook)."""
    from persian_rag_tpu.models.decoder import DecoderConfig

    hf = {
        "vocab_size": 128_256,
        "hidden_size": 2048,
        "num_hidden_layers": 16,
        "num_attention_heads": 32,
        "num_key_value_heads": 8,
        "intermediate_size": 8192,
        "max_position_embeddings": 131_072,
        "rms_norm_eps": 1e-5,
        "rope_theta": 500_000.0,
        "tie_word_embeddings": True,
    }
    cfg = DecoderConfig.from_hf(hf, compute_dtype=jnp.bfloat16)
    assert cfg.num_layers == 16 and cfg.num_kv_heads == 8
    assert cfg.compute_dtype == jnp.bfloat16
    # GQA fallback: no num_key_value_heads -> MHA
    hf2 = dict(hf)
    del hf2["num_key_value_heads"]
    assert DecoderConfig.from_hf(hf2).num_kv_heads == 32


@pytest.mark.slow
def test_fused_projections_match_unfused():
    """fuse_params + fused_projections must reproduce the unfused model:
    output-dim concatenation keeps each column's reduction intact, so logits
    agree to float tolerance and greedy generation token-for-token."""
    import dataclasses

    from persian_rag_tpu.gen.generator import ByteTokenizer, TextGenerator
    from persian_rag_tpu.models.decoder import fuse_params

    config = DecoderConfig.tiny(vocab_size=ByteTokenizer.vocab_size)
    base = LlamaDecoder(config)
    params = base.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)
    )["params"]
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)
    ref = base.apply({"params": params}, ids)

    fused_cfg = dataclasses.replace(config, fused_projections=True)
    fused = LlamaDecoder(fused_cfg).apply(
        {"params": fuse_params(params)}, ids
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=2e-5, atol=2e-5
    )

    # end-to-end through TextGenerator: greedy outputs identical
    tok = ByteTokenizer()
    g0 = TextGenerator(config, params=params, tokenizer=tok, max_len=64)
    g1 = TextGenerator(
        config, params=params, tokenizer=tok, max_len=64,
        fuse_projections=True,
    )
    assert g1.config.fused_projections
    assert "qkv_proj" in g1.params["layer_0"]["attention"]
    p = tok.encode("سلام")
    assert g1.generate_ids_device(p, max_tokens=12) == \
        g0.generate_ids_device(p, max_tokens=12)


@pytest.mark.slow
def test_batch_device_power_of_two_batch_buckets():
    """Variable serving group sizes must not multiply decoder compiles:
    sizes 3 and 4 share one power-of-two batch bucket (pad rows
    replicate row 0 and are dropped), and each real row still matches
    its standalone greedy generation."""
    from persian_rag_tpu.gen.generator import ByteTokenizer, TextGenerator

    gen = TextGenerator(
        DecoderConfig.tiny(vocab_size=ByteTokenizer.vocab_size),
        tokenizer=ByteTokenizer(),
        max_len=128,
    )
    prompts = [gen.tokenizer.encode(f"prompt number {i}") for i in range(4)]
    out3 = gen.generate_batch_device(prompts[:3], max_tokens=8)
    out4 = gen.generate_batch_device(prompts, max_tokens=8)
    assert len(out3) == 3 and len(out4) == 4
    assert out3 == out4[:3]  # same bucket, same rows
    batch_keys = {
        k for k in gen._prefill_cache if k[0] == "batch"
    }
    assert len(batch_keys) == 1, batch_keys  # one compile for both sizes
    for prompt, got in zip(prompts[:3], out3):
        want = gen.generate_ids_device(prompt, max_tokens=8,
                                       bucket_lengths=False)
        assert got == want, (got, want)
