"""GGUF interop (llama.cpp serving-artifact parity).

The reference's serving model is a Llama-3.2-1B Q8_0 GGUF exported by
its fine-tuning notebook and served through llama.cpp (BASELINE.md;
reference src/llama_client.py:10). models/gguf.py reads and writes that
format first-party; these tests cover the block codecs against scalar
references, the rotary-half permutation, full write->read round trips
through the decoder, tokenizer embedding, and the serving entry points.
"""
import json

import jax.numpy as jnp
import numpy as np
import pytest

from persian_rag_tpu.gen.generator import ByteTokenizer, TextGenerator
from persian_rag_tpu.models import gguf as G
from persian_rag_tpu.models.decoder import DecoderConfig, LlamaDecoder


# ---------------------------------------------------------------------------
# block codecs
# ---------------------------------------------------------------------------


def _dequant_q8_0_scalar(raw: np.ndarray) -> np.ndarray:
    out = []
    for b in range(len(raw) // 34):
        block = raw[b * 34 : (b + 1) * 34]
        d = float(block[:2].copy().view(np.float16)[0])
        for q in block[2:].view(np.int8):
            out.append(d * float(q))
    return np.asarray(out, np.float32)


def test_q8_0_roundtrip_vs_scalar():
    rng = np.random.default_rng(0)
    x = rng.normal(size=256).astype(np.float32) * 3.0
    raw = G.quantize_q8_0(x)
    assert raw.shape == (34 * 8,)
    y = G.dequantize_q8_0(raw, 256)
    np.testing.assert_array_equal(y, _dequant_q8_0_scalar(raw))
    # quantization error bounded by half a step: step = amax/127
    steps = np.abs(x).reshape(-1, 32).max(axis=1) / 127.0
    err = np.abs(y - x).reshape(-1, 32)
    assert (err <= 0.51 * steps[:, None] + 1e-3).all()


def test_q8_0_zero_block():
    raw = G.quantize_q8_0(np.zeros(32, np.float32))
    np.testing.assert_array_equal(G.dequantize_q8_0(raw, 32), 0.0)


def test_q4_0_dequant_hand_built():
    # one block: d = 0.5, nibble byte i holds weight i (low) and
    # weight i+16 (high); w = d * (q - 8)
    d = np.float16(0.5)
    qs = np.arange(16, dtype=np.uint8)  # low nibbles 0..15, high 0
    qs = qs | (np.uint8(15 - np.arange(16)) << 4)
    raw = np.concatenate([np.frombuffer(d.tobytes(), np.uint8), qs])
    y = G.dequantize_q4_0(raw, 32)
    expect_lo = 0.5 * (np.arange(16) - 8)
    expect_hi = 0.5 * ((15 - np.arange(16)) - 8)
    np.testing.assert_allclose(y[:16], expect_lo)
    np.testing.assert_allclose(y[16:], expect_hi)


def test_permute_inverse():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(64, 48)).astype(np.float32)  # 4 heads x 16 dim
    fwd = G.permute_hf_to_gguf(w, 4)
    assert not np.array_equal(fwd, w)
    np.testing.assert_array_equal(G.permute_gguf_to_hf(fwd, 4), w)


# ---------------------------------------------------------------------------
# file round trips through the decoder param tree
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_float():
    cfg = DecoderConfig.tiny(compute_dtype=jnp.bfloat16)
    gen = TextGenerator(cfg, max_len=64, seed=7)
    return cfg, gen


def _tree_leaves(tree, prefix=""):
    for key, sub in tree.items():
        if isinstance(sub, dict):
            yield from _tree_leaves(sub, f"{prefix}{key}.")
        else:
            yield f"{prefix}{key}", sub


def test_f32_write_read_roundtrip(tiny_float, tmp_path):
    cfg, gen = tiny_float
    path = str(tmp_path / "tiny_f32.gguf")
    G.write_decoder_gguf(path, cfg, gen.params, quant="f32")
    gf = G.GGUFFile(path)
    assert gf.metadata["general.architecture"] == "llama"
    assert gf.metadata["general.file_type"] == 0
    cfg2, params2 = G.params_from_gguf(gf)
    gf.close()
    assert cfg2.vocab_size == cfg.vocab_size
    assert cfg2.num_layers == cfg.num_layers
    assert cfg2.num_heads == cfg.num_heads
    assert cfg2.num_kv_heads == cfg.num_kv_heads
    assert cfg2.intermediate_size == cfg.intermediate_size
    assert cfg2.tie_word_embeddings == cfg.tie_word_embeddings
    assert abs(cfg2.rope_theta - cfg.rope_theta) < 1e-3
    orig = dict(_tree_leaves(gen.params))
    got = dict(_tree_leaves(params2))
    assert set(orig) == set(got)
    for name, leaf in orig.items():
        # bf16 params -> f32 file -> read back: exact
        np.testing.assert_array_equal(
            np.asarray(leaf, np.float32), got[name], err_msg=name
        )


def test_q8_0_write_read_within_quant_error(tiny_float, tmp_path):
    cfg, gen = tiny_float
    path = str(tmp_path / "tiny_q8.gguf")
    G.write_decoder_gguf(path, cfg, gen.params, quant="q8_0")
    gf = G.GGUFFile(path)
    assert gf.metadata["general.file_type"] == 7
    # norms stay f32 (llama.cpp convention)
    assert gf.tensors["output_norm.weight"].ggml_type == G.GGML_F32
    assert gf.tensors["token_embd.weight"].ggml_type == G.GGML_Q8_0
    _, params2 = G.params_from_gguf(gf)
    gf.close()
    orig = dict(_tree_leaves(gen.params))
    got = dict(_tree_leaves(params2))
    for name, leaf in orig.items():
        a = np.asarray(leaf, np.float32)
        b = got[name]
        if "norm" in name:
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            denom = max(np.abs(a).max(), 1e-6)
            assert np.abs(a - b).max() / denom < 0.02, name


def test_forward_parity_after_f32_roundtrip(tiny_float, tmp_path):
    cfg, gen = tiny_float
    path = str(tmp_path / "parity.gguf")
    G.write_decoder_gguf(path, cfg, gen.params, quant="f32")
    _, params2 = G.params_from_gguf(path)
    model = LlamaDecoder(cfg)
    ids = jnp.asarray([[1, 5, 9, 2, 7, 3, 8, 4]], jnp.int32)
    from persian_rag_tpu.models.decoder import cast_params

    a = model.apply({"params": gen.params}, ids)
    b = model.apply(
        {"params": cast_params(params2, cfg.compute_dtype)}, ids
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_untied_lm_head_roundtrip(tmp_path):
    cfg = DecoderConfig.tiny(
        tie_word_embeddings=False, compute_dtype=jnp.bfloat16
    )
    gen = TextGenerator(cfg, max_len=32, seed=11)
    path = str(tmp_path / "untied.gguf")
    G.write_decoder_gguf(path, cfg, gen.params, quant="f32")
    cfg2, params2 = G.params_from_gguf(path)
    assert not cfg2.tie_word_embeddings
    np.testing.assert_array_equal(
        np.asarray(gen.params["lm_head"]["kernel"], np.float32),
        params2["lm_head"]["kernel"],
    )


def test_writer_refuses_quantized_tree(tiny_float, tmp_path):
    cfg, gen = tiny_float
    genq = TextGenerator(cfg, params=gen.params, max_len=32, quantize=True)
    with pytest.raises(ValueError, match="FLOAT param tree"):
        G.write_decoder_gguf(
            str(tmp_path / "bad.gguf"), genq.config, genq.params
        )


def test_bad_magic_rejected(tmp_path):
    path = tmp_path / "not.gguf"
    path.write_bytes(b"XXXX" + b"\x00" * 64)
    with pytest.raises(ValueError, match="bad magic"):
        G.GGUFFile(str(path))


def test_non_llama_arch_rejected(tmp_path):
    path = str(tmp_path / "arch.gguf")
    G.write_gguf(
        path,
        {"general.architecture": "gptneox"},
        {"w": (np.zeros((4, 4), np.float32), G.GGML_F32)},
    )
    gf = G.GGUFFile(path)
    with pytest.raises(ValueError, match="architecture=llama"):
        G.config_from_gguf(gf)
    gf.close()


# ---------------------------------------------------------------------------
# serving entry points
# ---------------------------------------------------------------------------


def test_from_gguf_greedy_parity(tiny_float, tmp_path):
    cfg, gen = tiny_float
    path = str(tmp_path / "serve_f32.gguf")
    G.write_decoder_gguf(path, cfg, gen.params, quant="f32")
    gen2 = TextGenerator.from_gguf(path, max_len=64)
    # float file -> serving stays unquantized by default
    assert not gen2.config.quantized_weights
    prompt = [1, 4, 7, 2, 9]
    a = gen.generate_ids_device(prompt, max_tokens=12, speculative=False)
    b = gen2.generate_ids_device(prompt, max_tokens=12, speculative=False)
    assert a == b


def test_from_gguf_q8_serves_quantized(tiny_float, tmp_path):
    cfg, gen = tiny_float
    path = str(tmp_path / "serve_q8.gguf")
    G.write_decoder_gguf(path, cfg, gen.params, quant="q8_0")
    gen2 = TextGenerator.from_gguf(path, max_len=64)
    # quantized file -> quantized serving by default (llama.cpp parity)
    assert gen2.config.quantized_weights
    assert "values" in gen2.params["embed_tokens"]
    out = gen2.generate_ids_device([3, 1, 4], max_tokens=8,
                                   speculative=False)
    assert isinstance(out, list)


# ---------------------------------------------------------------------------
# embedded tokenizer
# ---------------------------------------------------------------------------


def _byte_level_tokenizer_metadata():
    from tokenizers import pre_tokenizers

    alphabet = sorted(pre_tokenizers.ByteLevel.alphabet())
    tokens = ["<|begin_of_text|>", "<|end_of_text|>"] + alphabet
    token_type = np.asarray([3, 3] + [1] * len(alphabet), np.int32)
    return {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.token_type": token_type,
        "tokenizer.ggml.merges": [],
        "tokenizer.ggml.bos_token_id": 0,
        "tokenizer.ggml.eos_token_id": 1,
    }


def test_gguf_tokenizer_roundtrip(tiny_float, tmp_path):
    cfg, gen = tiny_float
    path = str(tmp_path / "tok.gguf")
    G.write_decoder_gguf(
        path, cfg, gen.params, quant="f32",
        extra_metadata=_byte_level_tokenizer_metadata(),
    )
    gf = G.GGUFFile(path)
    tok = G.tokenizer_from_gguf(gf)
    gf.close()
    assert tok is not None
    assert tok.bos_id == 0 and tok.eos_id == 1
    ids = tok.encode("hello, world! 123")
    assert ids[0] == 0  # BOS prepended
    assert tok.decode(ids) == "hello, world! 123"
    # specials never leak into decoded text
    assert tok.decode([0, 1] + ids[1:3]) == tok.decode(ids[1:3])


def test_from_gguf_uses_embedded_tokenizer(tiny_float, tmp_path):
    cfg, gen = tiny_float
    path = str(tmp_path / "tok_serve.gguf")
    G.write_decoder_gguf(
        path, cfg, gen.params, quant="f32",
        extra_metadata=_byte_level_tokenizer_metadata(),
    )
    gen2 = TextGenerator.from_gguf(path, max_len=64)
    assert not isinstance(gen2.tokenizer, ByteTokenizer)
    assert gen2.tokenizer.eos_id == 1
    text = gen2.generate_text("hi", max_tokens=6)
    assert isinstance(text, str)


def test_tokenizer_missing_gives_byte_fallback(tiny_float, tmp_path):
    cfg, gen = tiny_float
    path = str(tmp_path / "notok.gguf")
    G.write_decoder_gguf(path, cfg, gen.params, quant="f32")
    gf = G.GGUFFile(path)
    assert G.tokenizer_from_gguf(gf) is None
    gf.close()
    gen2 = TextGenerator.from_gguf(path, max_len=64)
    assert isinstance(gen2.tokenizer, ByteTokenizer)


def test_tokenizer_metadata_from_hf(tmp_path):
    from tokenizers import pre_tokenizers

    alphabet = sorted(pre_tokenizers.ByteLevel.alphabet())
    vocab = {ch: i for i, ch in enumerate(alphabet)}
    tj = {
        "added_tokens": [
            {"id": len(alphabet), "content": "<|begin_of_text|>",
             "special": True},
            {"id": len(alphabet) + 1, "content": "<|end_of_text|>",
             "special": True},
        ],
        "model": {"type": "BPE", "vocab": vocab, "merges": []},
    }
    path = tmp_path / "tokenizer.json"
    path.write_text(json.dumps(tj), encoding="utf-8")
    meta = G.tokenizer_metadata_from_hf(str(path))
    assert meta["tokenizer.ggml.model"] == "gpt2"
    assert meta["tokenizer.ggml.tokens"][len(alphabet)] == "<|begin_of_text|>"
    assert meta["tokenizer.ggml.bos_token_id"] == len(alphabet)
    assert meta["tokenizer.ggml.eos_token_id"] == len(alphabet) + 1
    assert meta["tokenizer.ggml.token_type"][len(alphabet)] == 3
    tok = G.GGUFTokenizer(meta)
    ids = tok.encode("persian rag", add_bos=False)
    assert tok.decode(ids) == "persian rag"


# ---------------------------------------------------------------------------
# HFTokenizer generation contract (gen-serve --checkpoint path)
# ---------------------------------------------------------------------------


def test_hf_tokenizer_generation_contract(tmp_path):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    from persian_rag_tpu.models.tokenizer import HFTokenizer

    alphabet = sorted(pre_tokenizers.ByteLevel.alphabet())
    vocab = {ch: i for i, ch in enumerate(alphabet)}
    vocab["</s>"] = len(vocab)
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    path = str(tmp_path / "tokenizer.json")
    tok.save(path)

    hft = HFTokenizer(path)
    # the generation server calls encode/decode/eos_id on the
    # generator's tokenizer (gen/local_server.py) — HFTokenizer must
    # satisfy that contract, not only encode_batch
    assert hft.eos_id == vocab["</s>"]
    ids = hft.encode("salam dunya", add_bos=False)
    assert isinstance(ids, list) and ids
    assert hft.decode(ids) == "salam dunya"
