"""Numerical parity of the Flax encoder vs HuggingFace torch models.

Random-weight tiny configs (no network needed): the same state dict must
produce the same hidden states through both stacks, which pins down every
architectural detail (LN placement/eps, gelu flavor, position-id scheme,
attention masking) of the three reference backbones.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from persian_rag_tpu.models.encoder import EncoderConfig, TransformerEncoder
from persian_rag_tpu.models.hf_loader import (
    params_from_bert,
    params_from_distilbert,
)

TOL = dict(rtol=2e-4, atol=2e-4)


def random_inputs(rng, batch, seq, vocab, pad_id=0):
    ids = rng.integers(pad_id + 1, vocab, size=(batch, seq)).astype(np.int64)
    mask = np.ones((batch, seq), np.int64)
    # ragged lengths
    for i in range(batch):
        keep = rng.integers(2, seq + 1)
        mask[i, keep:] = 0
        ids[i, keep:] = pad_id
    return ids, mask


def test_bert_parity(rng):
    from transformers import BertConfig, BertModel

    hf_config = BertConfig(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=40,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = BertModel(hf_config).eval()
    ids, mask = random_inputs(rng, 3, 11, 120)
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    config = EncoderConfig(
        vocab_size=120,
        hidden_size=32,
        num_layers=3,
        num_heads=4,
        intermediate_size=64,
        max_position_embeddings=40,
    )
    params = params_from_bert(model.state_dict(), 3)
    got = TransformerEncoder(config).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask)
    )
    got = np.asarray(got)
    # only compare non-padded positions (HF computes garbage on pads too,
    # but identical garbage is not required)
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], want[m], **TOL)


def test_distilbert_parity(rng):
    from transformers import DistilBertConfig, DistilBertModel

    hf_config = DistilBertConfig(
        vocab_size=130,
        dim=32,
        n_layers=2,
        n_heads=4,
        hidden_dim=64,
        max_position_embeddings=48,
        dropout=0.0,
        attention_dropout=0.0,
    )
    model = DistilBertModel(hf_config).eval()
    ids, mask = random_inputs(rng, 2, 9, 130)
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    config = EncoderConfig(
        vocab_size=130,
        hidden_size=32,
        num_layers=2,
        num_heads=4,
        intermediate_size=64,
        max_position_embeddings=48,
        type_vocab_size=0,
    )
    params = params_from_distilbert(model.state_dict(), 2)
    got = np.asarray(
        TransformerEncoder(config).apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask)
        )
    )
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], want[m], **TOL)


def test_xlm_roberta_parity(rng):
    from transformers import XLMRobertaConfig, XLMRobertaModel

    hf_config = XLMRobertaConfig(
        vocab_size=140,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=50,
        pad_token_id=1,
        type_vocab_size=1,  # real xlm-roberta-base checkpoints use 1
        layer_norm_eps=1e-5,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = XLMRobertaModel(hf_config).eval()
    ids, mask = random_inputs(rng, 3, 13, 140, pad_id=1)
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    config = EncoderConfig(
        vocab_size=140,
        hidden_size=32,
        num_layers=2,
        num_heads=4,
        intermediate_size=64,
        max_position_embeddings=50,
        type_vocab_size=1,
        layer_norm_eps=1e-5,
        position_offset=2,
        pad_token_id=1,
    )
    params = params_from_bert(model.state_dict(), 2)
    got = np.asarray(
        TransformerEncoder(config).apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask)
        )
    )
    m = mask.astype(bool)
    np.testing.assert_allclose(got[m], want[m], **TOL)


def test_mean_pooling_matches_sentence_transformers_formula(rng):
    from persian_rag_tpu.models.pooling import mean_pool

    hidden = rng.standard_normal((2, 7, 5)).astype(np.float32)
    mask = np.array(
        [[1, 1, 1, 0, 0, 0, 0], [1, 1, 1, 1, 1, 1, 1]], np.int32
    )
    got = np.asarray(mean_pool(jnp.asarray(hidden), jnp.asarray(mask)))
    want0 = hidden[0, :3].mean(axis=0)
    want1 = hidden[1].mean(axis=0)
    np.testing.assert_allclose(got[0], want0, rtol=1e-5)
    np.testing.assert_allclose(got[1], want1, rtol=1e-5)
