"""Standalone checkpoint evaluation (training/evaluate.py).

The reference can only validate from inside the training loop
(reference: train.py:288-304); the TPU build adds a CLI that scores any
saved checkpoint with the training stack's exact validation semantics.
Pinned here: the standalone score equals the score the training loop
itself logged for the same checkpoint, and run-dir arguments resolve to
the latest step.
"""

import copy
import json

import numpy as np

from pl_bert_tpu.config import Config
from pl_bert_tpu.training.evaluate import evaluate
from pl_bert_tpu.training.train import make_synthetic_corpus, train

SMOKE = {
    "training_params": {
        "output_dir": "",
        "batch_size": 8,
        "save_interval": 4,
        "log_interval": 1,
        "num_steps": 4,
        "learning_rate": 1e-3,
        "training_dataset": "synthetic:64",
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


def test_evaluate_matches_training_validation(tmp_path, capsys):
    raw = copy.deepcopy(SMOKE)
    raw["training_params"]["output_dir"] = str(tmp_path / "ckpt")
    cfg_path = str(tmp_path / "cfg.yml")
    Config.from_dict(raw).save(cfg_path)
    corpus = make_synthetic_corpus(64, seed=1)
    train({"config_path": cfg_path, "run_name": "run"}, dataset=corpus)

    run_dir = tmp_path / "ckpt" / "run"
    logged = [
        json.loads(l) for l in open(run_dir / "metrics.jsonl")
        if "val_phoneme_loss" in l
    ]
    final_val = [r for r in logged if r["step"] == 4]
    assert final_val, "training should have validated at the save step"

    out = evaluate(
        {"checkpoint": str(run_dir), "config_path": cfg_path},
        dataset=corpus,
    )
    # run dir resolved to its latest step
    assert out["checkpoint"].endswith("step_4")
    assert out["val_batches"] >= 1
    assert np.isfinite(out["val_phoneme_loss"])
    # identical semantics to the in-training validation of the same ckpt
    assert out["val_phoneme_loss"] == round(
        final_val[-1]["val_phoneme_loss"], 6
    )
    assert out["val_masked_accuracy"] == round(
        final_val[-1]["val_masked_accuracy"], 6
    )
    # the CLI contract: one JSON line on stdout
    lines = [
        l for l in capsys.readouterr().out.splitlines()
        if l.startswith("{")
    ]
    assert json.loads(lines[-1]) == out

    # an explicit step_N path works too
    out2 = evaluate(
        {"checkpoint": str(run_dir / "step_4"), "config_path": cfg_path},
        dataset=corpus,
    )
    assert out2["val_phoneme_loss"] == out["val_phoneme_loss"]


def test_evaluate_all_sweeps_run_dir(tmp_path, capsys):
    """--all scores every step_N (ascending, one Trainer) and the
    summary names the argmin by val_phoneme_loss; the per-checkpoint
    scores equal single-checkpoint evaluate of the same steps."""
    from pl_bert_tpu.training.evaluate import evaluate_all

    raw = copy.deepcopy(SMOKE)
    raw["training_params"]["output_dir"] = str(tmp_path / "ckpt")
    raw["training_params"]["save_interval"] = 2  # -> step_2 and step_4
    cfg_path = str(tmp_path / "cfg.yml")
    Config.from_dict(raw).save(cfg_path)
    corpus = make_synthetic_corpus(64, seed=1)
    train({"config_path": cfg_path, "run_name": "run"}, dataset=corpus)

    run_dir = str(tmp_path / "ckpt" / "run")
    results = evaluate_all(
        {"checkpoint": run_dir, "config_path": cfg_path}, dataset=corpus
    )
    assert [r["checkpoint"].rsplit("step_", 1)[1] for r in results] == [
        "2", "4",
    ]
    single = evaluate(
        {"checkpoint": run_dir + "/step_2", "config_path": cfg_path},
        dataset=corpus,
    )
    assert results[0]["val_phoneme_loss"] == single["val_phoneme_loss"]

    lines = [
        json.loads(l)
        for l in capsys.readouterr().out.splitlines()
        if l.startswith("{")
    ]
    summary = lines[-2]  # last line is `single`'s own output
    assert summary["checkpoints_scored"] == 2
    best = min(results, key=lambda r: r["val_phoneme_loss"])
    assert summary["best_checkpoint"] == best["checkpoint"]
    assert summary["best_val_phoneme_loss"] == best["val_phoneme_loss"]
