"""Quantized decoder serving (config.quantized_weights).

The reference serves a quantized GGUF export through llama.cpp
(notebooks cell 7); this is the TPU-native equivalent: int8 params via
quantize_decoder_params + Pallas weight-streaming kernels (XLA
reference math on CPU). Random-weight tolerance tests only — real-
checkpoint quality is env-gated (tests/test_real_assets.py pattern).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from persian_rag_tpu.gen.generator import TextGenerator
from persian_rag_tpu.models.decoder import (
    DecoderConfig,
    LlamaDecoder,
    quantize_decoder_params,
)


@pytest.fixture(scope="module")
def tiny_pair():
    cfg = DecoderConfig.tiny(compute_dtype=jnp.bfloat16)
    gen_f = TextGenerator(cfg, max_len=64, seed=3)
    gen_q = TextGenerator(
        cfg, params=gen_f.params, max_len=64, seed=3, quantize=True
    )
    return gen_f, gen_q


def test_quantized_param_tree_layout(tiny_pair):
    gen_f, gen_q = tiny_pair
    p = gen_q.params
    assert p["embed_tokens"]["values"].dtype == jnp.int8
    assert p["embed_tokens"]["scale"].dtype == jnp.float32
    att = p["layer_0"]["attention"]["q_proj"]
    assert set(att) == {"values", "scale"}
    assert att["values"].dtype == jnp.int8
    # norm scales untouched
    assert "scale" in p["layer_0"]["input_norm"]


def test_quantized_logits_close_to_float(tiny_pair):
    gen_f, gen_q = tiny_pair
    ids = jnp.array([[5, 9, 200, 31, 7, 88]], jnp.int32)
    lf = gen_f.model.apply({"params": gen_f.params}, ids)
    lq = gen_q.model.apply({"params": gen_q.params}, ids)
    rel = float(jnp.max(jnp.abs(lf - lq)) / jnp.max(jnp.abs(lf)))
    assert rel < 0.06  # int8 per-channel on a 2-layer model


def test_quantized_generation_runs(tiny_pair):
    _, gen_q = tiny_pair
    out = gen_q.generate_ids([5, 9, 200, 31], max_tokens=12)
    assert 0 < len(out) <= 12
    batched = gen_q.generate_batch_device(
        [[5, 9, 200], [7, 8, 9, 10]], max_tokens=8
    )
    assert len(batched) == 2 and all(len(r) <= 8 for r in batched)


def test_quantize_then_fuse_projections():
    cfg = DecoderConfig.tiny(compute_dtype=jnp.bfloat16)
    gen_f = TextGenerator(cfg, max_len=64, seed=3)
    gen_qf = TextGenerator(
        cfg, params=gen_f.params, max_len=64, seed=3,
        quantize=True, fuse_projections=True,
    )
    assert gen_qf.config.quantized_weights
    assert gen_qf.config.fused_projections
    att = gen_qf.params["layer_0"]["attention"]
    assert set(att) == {"qkv_proj", "o_proj"}
    assert att["qkv_proj"]["values"].dtype == jnp.int8
    out = gen_qf.generate_ids([5, 9, 200, 31], max_tokens=6)
    assert len(out) > 0


def test_quantize_on_mesh_uses_xla_backend():
    # GSPMD cannot partition a pallas_call; mesh serving must route the
    # quantized matmuls through the XLA dequant backend (full parity
    # covered in tests/test_tp_decoder.py)
    from persian_rag_tpu.core.mesh import build_mesh

    cfg = DecoderConfig.tiny(compute_dtype=jnp.bfloat16)
    mesh = build_mesh(corpus_axis=2, data_axis=1)
    gen = TextGenerator(cfg, max_len=64, mesh=mesh, quantize=True)
    assert gen.config.quantized_backend == "xla"
    assert gen.config.quantized_weights


def test_quantized_non_tied_lm_head():
    cfg = DecoderConfig.tiny(
        compute_dtype=jnp.bfloat16, tie_word_embeddings=False
    )
    fgen = TextGenerator(cfg, max_len=64, seed=1)
    qgen = TextGenerator(
        cfg, params=fgen.params, max_len=64, seed=1, quantize=True
    )
    assert qgen.params["lm_head"]["values"].dtype == jnp.int8
    ids = jnp.array([[3, 4, 5]], jnp.int32)
    lf = fgen.model.apply({"params": fgen.params}, ids)
    lq = qgen.model.apply({"params": qgen.params}, ids)
    assert lq.dtype == jnp.float32
    rel = float(jnp.max(jnp.abs(lf - lq)) / jnp.max(jnp.abs(lf)))
    assert rel < 0.06


def test_quantized_composes_with_continuous_batching(tiny_pair):
    import json
    import urllib.request

    from persian_rag_tpu.gen.local_server import LocalGenerationServer

    _, gen_q = tiny_pair
    srv = LocalGenerationServer(gen_q, port=0, continuous=True).start()
    try:
        req = urllib.request.Request(
            srv.url + "/completion",
            data=json.dumps({"prompt": "hello", "n_predict": 6}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            body = json.loads(r.read())
        assert "content" in body
    finally:
        srv.stop()


def test_quantized_speculative_route(tiny_pair):
    _, gen_q = tiny_pair
    out = gen_q.generate_ids_spec([5, 9, 200, 31, 5, 9, 200, 31],
                                  max_tokens=8)
    assert len(out) <= 8


@pytest.mark.slow
def test_int4_param_tree_and_generation(tiny_pair):
    gen_f, _ = tiny_pair
    gen4 = TextGenerator(
        gen_f.config, params=gen_f.params, max_len=64, quantize="int4"
    )
    assert gen4.config.quantized_bits == 4
    p = gen4.params
    q = p["layer_0"]["attention"]["q_proj"]
    # tiny config: hidden 64 -> packed K/2 = 32 rows
    assert q["values"].shape[0] == 32 and q["values"].dtype == jnp.int8
    # embedding stays int8 (full-K rows, per-vocab-row scale)
    assert p["embed_tokens"]["values"].shape == (512, 64)
    out = gen4.generate_ids([5, 9, 200, 31], max_tokens=8)
    assert len(out) <= 8
    batched = gen4.generate_batch_device([[5, 9, 200], [7, 8, 9]],
                                         max_tokens=6)
    assert len(batched) == 2


def test_int4_logits_tolerance(tiny_pair):
    # per-channel int4 is coarse by construction; the envelope is
    # documented, not hidden (quantize_decoder_params docstring)
    gen_f, _ = tiny_pair
    gen4 = TextGenerator(
        gen_f.config, params=gen_f.params, max_len=64, quantize="int4"
    )
    ids = jnp.array([[5, 9, 200, 31, 7, 88]], jnp.int32)
    lf = gen_f.model.apply({"params": gen_f.params}, ids)
    lq = gen4.model.apply({"params": gen4.params}, ids)
    rel = float(jnp.max(jnp.abs(lf - lq)) / jnp.max(jnp.abs(lf)))
    assert rel < 0.5


def test_int4_untied_lm_head_stays_int8():
    cfg = DecoderConfig.tiny(
        compute_dtype=jnp.bfloat16, tie_word_embeddings=False
    )
    fgen = TextGenerator(cfg, max_len=64, seed=1)
    qgen = TextGenerator(cfg, params=fgen.params, max_len=64,
                         quantize="int4")
    # full-K rows = int8 layout (int4 would be K/2 = 32)
    assert qgen.params["lm_head"]["values"].shape[0] == 64
    out = qgen.generate_ids([3, 4, 5], max_tokens=4)
    assert len(out) <= 4


def test_quantize_idempotent_detection(tiny_pair):
    _, gen_q = tiny_pair
    # constructing from an ALREADY-quantized tree must not re-quantize
    gen_q2 = TextGenerator(
        gen_q.config, params=gen_q.params, max_len=64, quantize=True
    )
    np.testing.assert_array_equal(
        np.asarray(gen_q2.params["embed_tokens"]["values"]),
        np.asarray(gen_q.params["embed_tokens"]["values"]),
    )


@pytest.mark.slow
def test_random_quantized_params_matches_quantize_layout(tiny_pair):
    """random_quantized_params (on-device init for model sizes whose
    float tree cannot exist, e.g. 8B-arch on one 16 GB chip) must emit
    exactly the tree the float-init -> cast -> quantize path does."""
    import jax.tree_util as jtu

    from persian_rag_tpu.models.decoder import (
        cast_params,
        random_quantized_params,
    )

    gen_f, _ = tiny_pair
    cfg = DecoderConfig.tiny(
        compute_dtype=jnp.bfloat16, quantized_weights=True
    )
    rq = random_quantized_params(cfg, seed=0)
    ref = quantize_decoder_params(
        cast_params(gen_f.params, jnp.bfloat16), bits=8
    )
    spec = lambda t: jtu.tree_map(  # noqa: E731
        lambda x: (x.shape, str(x.dtype)), t
    )
    assert jtu.tree_structure(spec(rq)) == jtu.tree_structure(spec(ref))
    assert jtu.tree_leaves(spec(rq)) == jtu.tree_leaves(spec(ref))


def test_random_quantized_generation_and_cast_passthrough():
    from persian_rag_tpu.models.decoder import (
        cast_params,
        random_quantized_params,
    )

    cfg = DecoderConfig.tiny(
        compute_dtype=jnp.bfloat16, quantized_weights=True
    )
    rq = random_quantized_params(cfg, seed=1)
    # the serving cast must NOT touch quantized pairs (scales stay f32)
    cast = cast_params(rq, jnp.bfloat16)
    assert cast["embed_tokens"]["scale"].dtype == jnp.float32
    assert (
        cast["layer_0"]["mlp"]["down_proj"]["values"].dtype == jnp.int8
    )
    gen = TextGenerator(cfg, params=rq, max_len=64)
    out = gen.generate_ids([5, 9, 200, 31], max_tokens=8)
    assert 0 < len(out) <= 8


def test_random_quantized_int4_layout():
    from persian_rag_tpu.models.decoder import random_quantized_params

    cfg = DecoderConfig.tiny(
        compute_dtype=jnp.bfloat16,
        quantized_weights=True,
        quantized_bits=4,
        tie_word_embeddings=False,
    )
    rq = random_quantized_params(cfg)
    # layer projections nibble-pack K/2; embedding + lm_head stay int8
    assert rq["layer_0"]["attention"]["q_proj"]["values"].shape[0] == 32
    assert rq["embed_tokens"]["values"].shape == (512, 64)
    assert rq["lm_head"]["values"].shape[0] == 64
    gen = TextGenerator(cfg, params=rq, max_len=64)
    assert len(gen.generate_ids([1, 2, 3], max_tokens=6)) > 0


def test_big_model_configs():
    """Arch constants per the HF config.json of each checkpoint family
    (the reference fine-tunes Llama-3.2-1B, notebooks cell 7; 3B/8B are
    the in-family scale-ups the quantized serving path exists for)."""
    c3 = DecoderConfig.llama32_3b()
    assert (c3.hidden_size, c3.num_layers, c3.num_heads) == (3072, 28, 24)
    assert (c3.num_kv_heads, c3.intermediate_size) == (8, 8192)
    assert c3.tie_word_embeddings
    c8 = DecoderConfig.llama31_8b()
    assert (c8.hidden_size, c8.num_layers, c8.num_heads) == (4096, 32, 32)
    assert (c8.num_kv_heads, c8.intermediate_size) == (8, 14336)
    assert not c8.tie_word_embeddings


# ---------------------------------------------------------------------------
# int8 KV cache (llama.cpp --cache-type-k/-v q8_0 parity)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def kv_pair(tiny_pair):
    gen_f, _ = tiny_pair
    gen_kv = TextGenerator(
        gen_f.config, params=gen_f.params, max_len=64, seed=3,
        quantize_kv=True,
    )
    return gen_f, gen_kv


def test_int8_kv_cache_layout(kv_pair):
    from persian_rag_tpu.models.decoder import init_cache

    _, gen_kv = kv_pair
    assert gen_kv.config.kv_cache_dtype == "int8"
    c = init_cache(gen_kv.config, 2, 32)
    assert sorted(c) == ["k", "k_scale", "v", "v_scale"]
    assert c["k"][0].dtype == jnp.int8
    # per-(token, kv-head) f32 scales
    assert c["k_scale"][0].shape == (2, 32, 2)
    assert c["k_scale"][0].dtype == jnp.float32


def test_int8_kv_decode_logits_close(kv_pair):
    """The cached-decode forward with int8 KV must track the float-
    cache forward (per-token amax scaling: ~0.4% per element)."""
    from persian_rag_tpu.models.decoder import init_cache

    gen_f, gen_kv = kv_pair
    ids = jnp.array([[5, 9, 200, 31, 7, 88]], jnp.int32)
    outs = {}
    for gen in (gen_f, gen_kv):
        cache = init_cache(gen.config, 1, 16)
        logits, _ = gen.model.apply(
            {"params": gen.params}, ids, cache=cache,
            cache_pos=jnp.int32(0),
        )
        outs[gen.config.kv_cache_dtype] = logits[:, -1]
    rel = float(
        jnp.max(jnp.abs(outs["compute"] - outs["int8"]))
        / jnp.max(jnp.abs(outs["compute"]))
    )
    assert rel < 0.05


@pytest.mark.slow
def test_int8_kv_generation_routes(kv_pair):
    gen_f, gen_kv = kv_pair
    ids = [5, 9, 200, 31, 7, 88]
    # batch-1 device loop: greedy parity with the float cache on this
    # seed (near-ties can flip under quantization; this seed is stable)
    of = gen_f.generate_ids_device(ids, max_tokens=12, temperature=0.0)
    oq = gen_kv.generate_ids_device(ids, max_tokens=12, temperature=0.0)
    assert of == oq
    batched = gen_kv.generate_batch_device(
        [[5, 9, 200], [7, 8, 9, 10]], max_tokens=8, temperature=0.0
    )
    assert len(batched) == 2 and all(len(r) <= 8 for r in batched)
    spec = gen_kv.generate_ids_spec([5, 9, 200, 31, 5, 9, 200, 31],
                                    max_tokens=8)
    assert len(spec) <= 8


@pytest.mark.slow
def test_int8_kv_composes_with_int8_weights_and_continuous():
    import json
    import urllib.request

    from persian_rag_tpu.gen.local_server import LocalGenerationServer

    cfg = DecoderConfig.tiny(compute_dtype=jnp.bfloat16)
    gen = TextGenerator(cfg, max_len=64, quantize=True, quantize_kv=True)
    assert gen.config.quantized_weights
    assert gen.config.kv_cache_dtype == "int8"
    srv = LocalGenerationServer(gen, port=0, continuous=True).start()
    try:
        req = urllib.request.Request(
            srv.url + "/completion",
            data=json.dumps({"prompt": "hi", "n_predict": 6}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            assert "content" in json.loads(r.read())
    finally:
        srv.stop()
