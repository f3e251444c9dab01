"""CLI smoke tests, logging setup, remat equivalence, sharded get_scores."""
import numpy as np
import pytest

from persian_rag_tpu.__main__ import main as cli_main
from persian_rag_tpu.core.config import Config, save_results
from persian_rag_tpu.utils.logging import setup_logging


@pytest.fixture
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # minimal config the CLI will pick up
    (tmp_path / "config.yaml").write_text(
        "models: ['tiny-model']\n"
        "training: {epochs: 1, batch_size: 8, warmup_steps: 1, "
        "max_train_samples: 24}\n"
        "evaluation: {sample_size: 3}\n"
        "chunking: {word_chunk_size: 30, word_overlap: 5, "
        "sentences_per_chunk: 5}\n",
        encoding="utf-8",
    )
    return tmp_path


def test_cli_phase3_and_status(workdir, capsys):
    assert cli_main(["phase3", "--tiny"]) == 0
    out = capsys.readouterr().out
    assert '"success": true' in out
    assert cli_main(["status"]) == 0
    out = capsys.readouterr().out
    assert "drugs_word_chunks.csv" in out


def test_cli_phase2(workdir, capsys):
    assert cli_main(["phase2", "--tiny"]) == 0
    assert "retrieval_accuracy" in capsys.readouterr().out


def test_save_results_csv_and_json(tmp_path):
    path = save_results({"a": [1, 2]}, "r.json", str(tmp_path))
    assert path.endswith("r.json")
    path = save_results([{"a": 1}, {"a": 2}], "r.csv", str(tmp_path))
    assert path.endswith("r.csv")
    with pytest.raises(ValueError):
        save_results({}, "r.txt", str(tmp_path))


def test_setup_logging_idempotent(tmp_path):
    logger = setup_logging("persian_rag_tpu.test", log_dir=str(tmp_path))
    again = setup_logging("persian_rag_tpu.test", log_dir=str(tmp_path))
    assert logger is again
    logger.info("سلام")
    assert (tmp_path / "test.log").exists()


def test_remat_forward_matches_plain():
    import jax.numpy as jnp

    from persian_rag_tpu.models.encoder import EncoderConfig, TransformerEncoder
    import dataclasses
    import jax

    plain_config = EncoderConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=32,
    )
    remat_config = dataclasses.replace(plain_config, remat=True)
    ids = jnp.arange(24, dtype=jnp.int32).reshape(2, 12) % 127 + 1
    mask = jnp.ones_like(ids)
    params = TransformerEncoder(plain_config).init(
        jax.random.PRNGKey(0), ids, mask
    )["params"]
    out_plain = TransformerEncoder(plain_config).apply(
        {"params": params}, ids, mask
    )
    out_remat = TransformerEncoder(remat_config).apply(
        {"params": params}, ids, mask
    )
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_remat), rtol=1e-6
    )
    # gradients flow through the remat path
    def loss(p):
        return jnp.sum(
            TransformerEncoder(remat_config).apply({"params": p}, ids, mask)
            ** 2
        )

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)


def test_sharded_get_scores_matches_plain():
    from persian_rag_tpu.core.mesh import build_mesh
    from persian_rag_tpu.index.lexical import BM25Index

    corpus = [f"doc {i} token{i % 5} word{i % 3}" for i in range(50)]
    plain = BM25Index().build(corpus)
    mesh = build_mesh(corpus_axis=8, data_axis=1)
    sharded = BM25Index(mesh=mesh).build(corpus)
    q = "token2 word1"
    np.testing.assert_allclose(
        sharded.get_scores(q)[:50], plain.get_scores(q), rtol=1e-5
    )
