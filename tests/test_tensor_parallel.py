"""Tensor-parallel encoder: sharded params produce identical embeddings."""
import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from persian_rag_tpu.core.mesh import build_mesh
from persian_rag_tpu.models.encoder import EncoderConfig
from persian_rag_tpu.models.sentence_encoder import SentenceEncoder
from persian_rag_tpu.models.tokenizer import HashTokenizer
from persian_rag_tpu.parallel.tp import shard_params_tensor_parallel

TINY = EncoderConfig(
    vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
    intermediate_size=128, max_position_embeddings=64,
)

TEXTS = ["دارو برای درمان", "a test sentence", "short"]


def test_tp_sharding_specs_applied():
    mesh = build_mesh(corpus_axis=4, data_axis=2)
    enc = SentenceEncoder(TINY, tokenizer=HashTokenizer(512), seed=1)
    sharded = shard_params_tensor_parallel(
        enc.params["encoder"], mesh, axis="corpus"
    )
    q_kernel = sharded["layer_0"]["attention"]["query"]["kernel"]
    spec = q_kernel.sharding.spec
    assert spec == P(None, "corpus")
    out_kernel = sharded["layer_0"]["attention"]["output"]["kernel"]
    assert out_kernel.sharding.spec == P("corpus", None)
    # layer norms stay replicated
    ln = sharded["layer_0"]["attention_norm"]["scale"]
    assert ln.sharding.spec == P()


def test_tp_embeddings_match_replicated():
    single = SentenceEncoder(TINY, tokenizer=HashTokenizer(512), seed=2)
    want = single.encode(TEXTS, batch_size=4)

    mesh = build_mesh(corpus_axis=8, data_axis=1)
    tp = SentenceEncoder(TINY, tokenizer=HashTokenizer(512), seed=2)
    tp.params = {
        "encoder": shard_params_tensor_parallel(
            tp.params["encoder"], mesh, axis="corpus"
        ),
        "head": tp.params["head"],
    }
    tp._jit_cache.clear()
    got = tp.encode(TEXTS, batch_size=4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_tp_indivisible_dims_fall_back_to_replication():
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    config = EncoderConfig(
        vocab_size=128, hidden_size=36, num_layers=1, num_heads=4,
        intermediate_size=52, max_position_embeddings=32,
    )
    enc = SentenceEncoder(config, tokenizer=HashTokenizer(128))
    sharded = shard_params_tensor_parallel(
        enc.params["encoder"], mesh, axis="corpus"
    )
    # 36 and 52 are not divisible by 8 -> replicated
    q = sharded["layer_0"]["attention"]["query"]["kernel"]
    assert q.sharding.spec == P()
