"""Multi-task (phoneme + grapheme head) training path, end-to-end.

The upstream PL-BERT variant trains both heads; this fork's config runs
phoneme-only (reference: train.py:265-270) but the multi-task capability
is part of the surface (reference: model.py:5-18, convert_to_hf.py:29).
"""

import json

import numpy as np

from pl_bert_tpu.config import Config
from pl_bert_tpu.training.train import Trainer, train


def _corpus(n=48, seed=0, vocab=50):
    rng = np.random.default_rng(seed)
    alphabet = list("ɑɐɒæbtkmnlsʃθð")
    out = []
    for _ in range(n):
        k = int(rng.integers(5, 20))
        words = [
            "".join(rng.choice(alphabet, size=int(rng.integers(2, 8))))
            for _ in range(k)
        ]
        out.append(
            {
                "phonemes": words,
                "token_ids": rng.integers(0, vocab, size=k).tolist(),
            }
        )
    return out


def test_multitask_training_end_to_end(tmp_path):
    raw = {
        "training_params": {
            "output_dir": str(tmp_path / "ckpt"),
            "batch_size": 8,
            "save_interval": 100,
            "log_interval": 2,
            "num_steps": 4,
            "learning_rate": 1e-3,
            "training_dataset": "synthetic:48",  # replaced by explicit dataset
            "mixed_precision": "fp32",
        },
        "dataset_params": {"max_seq_length": 64, "word_separator": 87},
        "model_params": {
            "hidden_size": 64,
            "num_attention_heads": 4,
            "intermediate_size": 128,
            "max_position_embeddings": 64,
            "num_hidden_layers": 2,
            "embedding_size": 32,
            "attention_impl": "xla",
            "num_token_vocab": 100,  # enables the grapheme head
        },
    }
    config = Config.from_dict(raw)
    trainer = Trainer(config, str(tmp_path / "run"), False, dataset=_corpus())
    assert trainer.use_token_ids

    losses_t = []
    for i, batch in enumerate(trainer._train_batches(epoch=1)):
        trainer.state, m = trainer.train_step(
            trainer.state, trainer._put(batch), trainer.base_rng
        )
        assert float(m["token_loss"]) > 0  # grapheme head actually training
        assert float(m["phoneme_loss"]) > 0
        losses_t.append(float(m["loss"]))
        if i == 5:
            break
    assert losses_t[-1] < losses_t[0]

    val_loss, val_acc = trainer.validate()
    assert val_loss > 0
