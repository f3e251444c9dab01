"""Tensor-parallel decoder serving on the virtual 8-device mesh.

The decoder params shard Megatron-style (parallel/tp_decoder.py) and
the UNCHANGED jitted generation loops run under GSPMD — outputs must
match the single-device path. Reference scope note: the reference
serves Llama-3.2-1B on one GPU via llama.cpp (src/llama_client.py:10);
TP is the beyond-reference scaling path for larger decoder families.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from persian_rag_tpu.core.mesh import build_mesh
from persian_rag_tpu.gen.generator import TextGenerator
from persian_rag_tpu.models.decoder import DecoderConfig, LlamaDecoder
from persian_rag_tpu.parallel.tp_decoder import shard_decoder_params_tp

# every shardable dim divides 8: heads 8 (head_dim 16), kv heads 8,
# intermediate 256, vocab 512
CONFIG = DecoderConfig(
    vocab_size=512, hidden_size=128, num_layers=2, num_heads=8,
    num_kv_heads=8, intermediate_size=256, max_position_embeddings=128,
    rope_theta=10_000.0,
)


def _init_params(seed=0):
    model = LlamaDecoder(CONFIG)
    return model, model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 8), jnp.int32)
    )["params"]


@pytest.mark.slow
def test_tp_forward_matches_single_device():
    model, params = _init_params()
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 512)
    want = np.asarray(
        jax.jit(lambda p, i: model.apply({"params": p}, i))(params, ids),
        np.float32,
    )
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    tp_params = shard_decoder_params_tp(params, mesh, axis="corpus")
    # placement really sharded: a column-parallel kernel lives in 8 pieces
    qk = tp_params["layer_0"]["attention"]["q_proj"]["kernel"]
    assert len(qk.sharding.device_set) == 8
    assert qk.addressable_shards[0].data.shape == (128, 128 // 8)
    emb = tp_params["embed_tokens"]["embedding"]
    assert emb.addressable_shards[0].data.shape == (512 // 8, 128)
    got = np.asarray(
        jax.jit(lambda p, i: model.apply({"params": p}, i))(tp_params, ids),
        np.float32,
    )
    np.testing.assert_allclose(want, got, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_tp_generation_matches_single_device():
    _, params = _init_params()
    single = TextGenerator(CONFIG, params=params, max_len=64)
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    tp = TextGenerator(CONFIG, params=params, max_len=64, mesh=mesh)
    prompts = [
        list(np.random.default_rng(7).integers(1, 250, 9)),
        list(np.random.default_rng(8).integers(1, 250, 21)),
        list(np.random.default_rng(9).integers(1, 250, 4)),
    ]
    want = single.generate_batch_device(prompts, max_tokens=8)
    got = tp.generate_batch_device(prompts, max_tokens=8)
    assert want == got
    # single-prompt device loop too
    w1 = single.generate_ids_device(prompts[0], max_tokens=8)
    g1 = tp.generate_ids_device(prompts[0], max_tokens=8)
    assert w1 == g1


def test_tp_mid_head_split_matches_single_device():
    # Llama-1B-like ratios where the k/v output dim (2 kv heads x 16 =
    # 32) DOES divide the 8-way axis but NOT on head boundaries — each
    # device holds a 4-wide sub-head slice. GSPMD must reshard through
    # the attention einsum and still match the single-device forward.
    config = DecoderConfig(
        vocab_size=512, hidden_size=128, num_layers=1, num_heads=8,
        num_kv_heads=2, intermediate_size=256,
        max_position_embeddings=64, rope_theta=10_000.0,
    )
    model = LlamaDecoder(config)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)
    )["params"]
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    tp_params = shard_decoder_params_tp(params, mesh, axis="corpus")
    kv = tp_params["layer_0"]["attention"]["k_proj"]["kernel"]
    assert kv.addressable_shards[0].data.shape == (128, 32 // 8)
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 12), 0, 512)
    want = np.asarray(
        jax.jit(lambda p, i: model.apply({"params": p}, i))(params, ids),
        np.float32,
    )
    got = np.asarray(
        jax.jit(lambda p, i: model.apply({"params": p}, i))(tp_params, ids),
        np.float32,
    )
    np.testing.assert_allclose(want, got, rtol=2e-5, atol=2e-5)


def test_tp_indivisible_dims_replicate():
    # force the replication fallback via the vocab: 510 % 8 != 0
    config2 = DecoderConfig(
        vocab_size=510, hidden_size=128, num_layers=1, num_heads=8,
        num_kv_heads=8, intermediate_size=256,
        max_position_embeddings=64, rope_theta=10_000.0,
    )
    model2 = LlamaDecoder(config2)
    params2 = model2.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)
    )["params"]
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    tp2 = shard_decoder_params_tp(params2, mesh, axis="corpus")
    emb = tp2["embed_tokens"]["embedding"]
    assert emb.addressable_shards[0].data.shape == (510, 128)  # replicated
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, 510)
    want = np.asarray(
        model2.apply({"params": params2}, ids), np.float32
    )
    got = np.asarray(model2.apply({"params": tp2}, ids), np.float32)
    np.testing.assert_allclose(want, got, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_tp_quantized_generation_matches_single_chip_quantized():
    # int8 weight serving on the TP mesh: same quantized params, the
    # XLA dequant backend under GSPMD must produce the same greedy
    # tokens as the single-device quantized path (the Pallas kernels
    # gate themselves off on CPU, so both sides run identical math).
    _, params = _init_params()
    single = TextGenerator(CONFIG, params=params, max_len=64,
                           quantize=True)
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    tp = TextGenerator(CONFIG, params=params, max_len=64, mesh=mesh,
                       quantize=True)
    assert tp.config.quantized_backend == "xla"
    # quantized leaves really sharded Megatron-style
    q = tp.params["layer_0"]["attention"]["q_proj"]
    assert q["values"].addressable_shards[0].data.shape == (128, 128 // 8)
    assert q["scale"].addressable_shards[0].data.shape == (1, 128 // 8)
    down = tp.params["layer_0"]["mlp"]["down_proj"]
    assert down["values"].addressable_shards[0].data.shape == (256 // 8, 128)
    emb = tp.params["embed_tokens"]
    assert emb["values"].addressable_shards[0].data.shape == (512 // 8, 128)
    # norm scales replicated (their parent is the norm layer, not a
    # projection — the "scale" leaf-name overlap must not shard them)
    norm = tp.params["layer_0"]["input_norm"]["scale"]
    assert norm.addressable_shards[0].data.shape == (128,)

    prompts = [
        list(np.random.default_rng(7).integers(1, 250, 9)),
        list(np.random.default_rng(8).integers(1, 250, 21)),
    ]
    want = single.generate_batch_device(prompts, max_tokens=8)
    got = tp.generate_batch_device(prompts, max_tokens=8)
    assert want == got
    w1 = single.generate_ids_device(prompts[0], max_tokens=8)
    g1 = tp.generate_ids_device(prompts[0], max_tokens=8)
    assert w1 == g1


def test_tp_int8_kv_generation_matches_single_chip():
    # int8 KV cache on the TP mesh: the cache pytree gains
    # k_scale/v_scale leaves, which flow through GSPMD as ordinary
    # traced values (tp_decoder places only params). Greedy tokens must
    # match the single-device int8-KV path exactly.
    _, params = _init_params()
    single = TextGenerator(CONFIG, params=params, max_len=64,
                           quantize=True, quantize_kv=True)
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    tp = TextGenerator(CONFIG, params=params, max_len=64, mesh=mesh,
                       quantize=True, quantize_kv=True)
    assert tp.config.kv_cache_dtype == "int8"
    prompts = [
        list(np.random.default_rng(9).integers(1, 250, 11)),
        list(np.random.default_rng(10).integers(1, 250, 17)),
    ]
    want = single.generate_batch_device(prompts, max_tokens=8)
    got = tp.generate_batch_device(prompts, max_tokens=8)
    assert want == got
