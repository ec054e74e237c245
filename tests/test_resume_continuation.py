"""Resume must CONTINUE the interrupted epoch's data order, not skip it.

Regression test for the resume off-by-one (epoch restarted one ahead and
misapplied the saved batch offset to the wrong epoch's permutation).
"""

import numpy as np

from pl_bert_tpu.config import Config
from pl_bert_tpu.training.train import Trainer, make_synthetic_corpus


def _config(tmp_path, num_steps):
    raw = {
        "training_params": {
            "output_dir": str(tmp_path / "ckpt"),
            "batch_size": 8,
            "save_interval": 3,  # saves mid-epoch
            "log_interval": 100,
            "num_steps": num_steps,
            "learning_rate": 1e-3,
            "training_dataset": "synthetic:80",
            "mixed_precision": "fp32",
        },
        "dataset_params": {"max_seq_length": 64},
        "model_params": {
            "hidden_size": 64,
            "num_attention_heads": 4,
            "intermediate_size": 128,
            "max_position_embeddings": 64,
            "num_hidden_layers": 2,
            "embedding_size": 32,
            "dropout": 0.0,
            "attention_impl": "xla",
        },
    }
    cfg_path = tmp_path / "config.yml"
    Config.from_dict(raw).save(str(cfg_path))
    return Config.load(str(cfg_path))


def test_resume_continues_same_epoch_data(tmp_path):
    corpus = make_synthetic_corpus(80, seed=2)
    config = _config(tmp_path, num_steps=3)

    # run A: 3 steps (epoch 1 has 9 batches; checkpoint at step 3, batch 3)
    a = Trainer(config, str(tmp_path / "run"), False, dataset=corpus)
    a.train()
    assert a.current_step == 3

    # run B: resume — must continue epoch 1 from batch 3
    b = Trainer(config, str(tmp_path / "run"), True, dataset=corpus)
    assert b.current_step == 3
    assert b.start_epoch == 1
    assert b.start_batch == 3
    resumed_first = next(iter(b._train_batches(b.start_epoch, b.start_batch)))

    # ground truth: batch 3 of epoch 1's permutation from a fresh pipeline
    c = Trainer(config, str(tmp_path / "fresh"), False, dataset=corpus)
    expected = list(c._train_batches(epoch=1))[3]
    np.testing.assert_array_equal(
        np.asarray(resumed_first.masked_ids), np.asarray(expected.masked_ids)
    )


def test_completed_run_does_not_train_past_budget(tmp_path):
    corpus = make_synthetic_corpus(80, seed=2)
    config = _config(tmp_path, num_steps=4)
    a = Trainer(config, str(tmp_path / "run"), False, dataset=corpus)
    assert a.train() == 4

    b = Trainer(config, str(tmp_path / "run"), True, dataset=corpus)
    assert b.train() == 4  # no extra step, no new checkpoint
    import os

    steps = sorted(
        n for n in os.listdir(tmp_path / "run") if n.startswith("step_")
    )
    assert steps == ["step_3", "step_4"]
