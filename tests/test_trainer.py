"""Fine-tuning loop: example policy, loss descent, DP equality, save/load."""
import pytest
import numpy as np

from persian_rag_tpu.core.mesh import build_mesh
from persian_rag_tpu.data.loader import synthetic_persian_qa
from persian_rag_tpu.models.encoder import EncoderConfig
from persian_rag_tpu.models.sentence_encoder import SentenceEncoder
from persian_rag_tpu.models.tokenizer import HashTokenizer
from persian_rag_tpu.train.trainer import EmbeddingTrainer

TINY = EncoderConfig(
    vocab_size=512, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, max_position_embeddings=64,
)


def make_trainer(mesh=None, seed=0):
    enc = SentenceEncoder(
        TINY, tokenizer=HashTokenizer(512), mesh=mesh, max_seq_len=32, seed=seed
    )
    return EmbeddingTrainer(enc, seed=seed)


def test_training_example_policy():
    qa = [
        {"question": "q1 long enough", "answer": "a1 good", "context": "ctx long enough here"},
        {"question": "q2 long enough", "answer": "a2 good", "context": ""},
        {"question": "", "answer": "dropped", "context": ""},
    ]
    trainer = make_trainer()
    examples = trainer.prepare_training_data(qa)
    labels = sorted(set(e.label for e in examples))
    # positives 1.0, context pairs 0.8, negatives 0.0
    assert 1.0 in labels and 0.8 in labels and 0.0 in labels
    n_pos = sum(1 for e in examples if e.label == 1.0)
    n_ctx = sum(1 for e in examples if e.label == 0.8)
    n_neg = sum(1 for e in examples if e.label == 0.0)
    assert n_pos == 2 and n_ctx == 1
    assert n_neg == min(len(qa) // 2, 1000)


def test_eval_example_policy():
    qa = [{"question": f"q{i} text", "answer": f"a{i} text"} for i in range(120)]
    trainer = make_trainer()
    examples = trainer.prepare_evaluation_data(qa)
    n_pos = sum(1 for e in examples if e.label == 1.0)
    n_neg = sum(1 for e in examples if e.label == 0.0)
    assert n_pos == 100 and n_neg == 50


def test_fine_tune_reduces_loss():
    qa = synthetic_persian_qa(60, seed=1)
    trainer = make_trainer()
    examples = trainer.prepare_training_data(qa)
    summary = trainer.fine_tune(
        examples, epochs=2, batch_size=8, warmup_steps=2,
        learning_rate=1e-3, log_every=1,
    )
    losses = summary["losses"]
    assert len(losses) > 4
    # averaged late loss must improve on averaged early loss
    early = np.mean(losses[:3])
    late = np.mean(losses[-3:])
    assert late < early, (early, late)
    assert summary["samples_per_second"] > 0


@pytest.mark.slow
def test_dp_train_step_matches_single_device():
    qa = synthetic_persian_qa(16, seed=2)
    t_single = make_trainer(seed=5)
    examples = t_single.prepare_training_data(qa)[:16]
    s1 = t_single.fine_tune(examples, epochs=1, batch_size=8, warmup_steps=1,
                            learning_rate=1e-3, log_every=1)

    mesh = build_mesh(corpus_axis=1, data_axis=8)
    t_dp = make_trainer(mesh=mesh, seed=5)
    s2 = t_dp.fine_tune(examples, epochs=1, batch_size=8, warmup_steps=1,
                        learning_rate=1e-3, log_every=1)
    np.testing.assert_allclose(s1["losses"], s2["losses"], rtol=1e-3, atol=1e-5)


def test_save_and_load_roundtrip(tmp_path):
    trainer = make_trainer()
    path = str(tmp_path / "model")
    trainer.save_model(path)
    loaded = EmbeddingTrainer.load_model(path, tokenizer=HashTokenizer(512))
    texts = ["یک متن آزمایشی", "another test"]
    np.testing.assert_allclose(
        trainer.encoder.encode(texts), loaded.encode(texts), rtol=1e-5, atol=1e-6
    )


def test_get_similarity():
    trainer = make_trainer()
    assert abs(trainer.get_similarity("same text", "same text") - 1.0) < 1e-4
