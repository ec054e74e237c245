"""Learning-rate schedules (training_params.lr_schedule).

The reference trains at a constant 7e-5 (reference: train.py:272); the
TPU build adds optional warmup + linear/cosine decay driven by the
optimizer's update count, so the schedule position survives checkpoint
resume. These tests pin the schedule shapes, the default's exact
reference parity, the metrics "lr" column, and resume continuity.
"""

import copy
import json

import numpy as np
import pytest

from pl_bert_tpu.config import Config, ConfigError
from pl_bert_tpu.training.train_step import make_lr_schedule

SMOKE = {
    "training_params": {
        "output_dir": "",
        "batch_size": 8,
        "save_interval": 3,
        "log_interval": 1,
        "num_steps": 6,
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


def _tp(**kv):
    raw = {
        "num_steps": 100,
        "learning_rate": 1e-3,
        **kv,
    }
    return Config.from_dict({"training_params": raw}).training_params


def test_constant_no_warmup_is_reference_parity():
    # the default must be EXACTLY the reference's constant LR: no
    # schedule object at all, optax.adamw gets the plain float
    assert make_lr_schedule(_tp()) is None


def test_warmup_ramp_and_constant_tail():
    sched = make_lr_schedule(_tp(warmup_steps=10))
    assert float(sched(0)) == 0.0
    assert float(sched(5)) == pytest.approx(5e-4)
    assert float(sched(10)) == pytest.approx(1e-3)
    assert float(sched(99)) == pytest.approx(1e-3)


def test_cosine_decays_to_floor():
    sched = make_lr_schedule(
        _tp(lr_schedule="cosine", warmup_steps=10, lr_min_ratio=0.1)
    )
    assert float(sched(10)) == pytest.approx(1e-3)
    mid = float(sched(55))
    assert 1e-4 < mid < 1e-3
    assert float(sched(100)) == pytest.approx(1e-4)


def test_linear_decays_to_floor():
    sched = make_lr_schedule(_tp(lr_schedule="linear", lr_min_ratio=0.2))
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(50)) == pytest.approx(6e-4)
    assert float(sched(100)) == pytest.approx(2e-4)


def test_bad_schedule_config_rejected():
    with pytest.raises(ConfigError):
        _tp(lr_schedule="exponential")
    with pytest.raises(ConfigError):
        _tp(warmup_steps=-1)
    with pytest.raises(ConfigError):
        _tp(lr_min_ratio=1.5)


def _run(tmp_path, run_name, overrides):
    from pl_bert_tpu.training.train import train

    raw = copy.deepcopy(SMOKE)
    raw["training_params"]["output_dir"] = str(tmp_path / "ckpt")
    raw["training_params"].update(overrides)
    cfg_path = tmp_path / f"{run_name}.yml"
    Config.from_dict(raw).save(str(cfg_path))
    train({"config_path": str(cfg_path), "run_name": run_name})
    records = [
        json.loads(l)
        for l in open(tmp_path / "ckpt" / run_name / "metrics.jsonl")
    ]
    return [(r["step"], r["lr"]) for r in records if "lr" in r]


def test_trainer_logs_lr_and_resumes_schedule(tmp_path):
    """End-to-end: the metrics carry the per-step LR, warmup ramps then
    cosine decays — and a run stopped at step 3 resumes the schedule at
    the right position (the optimizer count is part of the checkpointed
    opt state). The continuation extends num_steps by editing the run
    dir's config copy, which resume loads (reference semantics)."""
    overrides = {
        "lr_schedule": "cosine",
        "warmup_steps": 2,
        "lr_min_ratio": 0.1,
    }
    full = _run(tmp_path, "full", overrides)
    assert [s for s, _ in full] == [1, 2, 3, 4, 5, 6]
    lrs = dict(full)
    # warmup: schedule(0)=0 at step 1, ramps to peak by step 3
    assert lrs[1] == 0.0
    assert lrs[3] == pytest.approx(1e-3, rel=1e-5)
    # cosine tail decays monotonically
    assert lrs[3] > lrs[4] > lrs[5] > lrs[6]

    part = _run(tmp_path, "resumed", {**overrides, "num_steps": 3})
    assert [s for s, _ in part] == [1, 2, 3]
    # extend the budget in the resume-authoritative config copy
    copy_path = tmp_path / "ckpt" / "resumed" / "resumed.yml"
    cfg = Config.load(str(copy_path))
    cfg.training_params.num_steps = 6
    cfg.save(str(copy_path))
    cont = _run(tmp_path, "resumed", overrides)
    resumed = dict(cont)
    assert sorted(resumed) == [1, 2, 3, 4, 5, 6]
    for step, lr in full:
        assert resumed[step] == pytest.approx(lr, rel=1e-6), step
