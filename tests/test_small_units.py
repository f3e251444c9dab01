"""Small-unit coverage: config, tokenizer buckets, byte tokenizer, mesh."""
import numpy as np
import pytest

from persian_rag_tpu.core.config import Config, load_config
from persian_rag_tpu.core.mesh import build_mesh, pad_to_multiple
from persian_rag_tpu.gen.generator import ByteTokenizer
from persian_rag_tpu.models.tokenizer import HashTokenizer, bucket_length


def test_load_config_overlays_defaults(tmp_path):
    path = tmp_path / "c.yaml"
    path.write_text(
        "chunking: {word_chunk_size: 99}\nmodels: ['only-one']\n",
        encoding="utf-8",
    )
    config = load_config(str(path))
    assert config.chunking.word_chunk_size == 99
    assert config.chunking.word_overlap == 25  # default preserved
    assert config.models == ["only-one"]
    # missing file -> pure defaults
    assert load_config(str(tmp_path / "missing.yaml")).chunking.word_chunk_size == 150


def test_config_dict_access():
    config = Config()
    assert config["chunking"]["word_chunk_size"] == 150
    assert isinstance(config["models"], list)


def test_bucket_length():
    assert bucket_length(1) == 16
    assert bucket_length(16) == 16
    assert bucket_length(17) == 32
    assert bucket_length(9999) == 256


def test_hash_tokenizer_stability_and_mask():
    tok = HashTokenizer(1000)
    ids1, mask1 = tok.encode_batch(["hello world", "x"], max_len=32)
    ids2, _ = tok.encode_batch(["hello world", "x"], max_len=32)
    np.testing.assert_array_equal(ids1, ids2)  # deterministic
    assert mask1[0].sum() == 4  # cls + 2 words + sep
    assert mask1[1].sum() == 3
    assert ids1[0, 0] == tok.cls_id
    # same word -> same id across positions/batches
    ids3, _ = tok.encode_batch(["world hello"], max_len=32)
    assert set(ids1[0][:4]) == set(ids3[0][:4])


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    text = "سلام world 123"
    ids = tok.encode(text)
    assert ids[0] == tok.bos_id
    assert tok.decode(ids) == text
    # invalid bytes degrade gracefully
    assert tok.decode([0xFF, 0xFE]) == ""


def test_mesh_validation_and_padding():
    mesh = build_mesh(corpus_axis=-1, data_axis=2)
    assert mesh.shape["corpus"] * mesh.shape["data"] <= 8
    assert mesh.shape["data"] == 2
    with pytest.raises(ValueError):
        build_mesh(corpus_axis=100, data_axis=100)
    assert pad_to_multiple(5, 8) == 8
    assert pad_to_multiple(8, 8) == 8
