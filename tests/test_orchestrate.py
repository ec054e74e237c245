"""Elastic restart tests (reference: modal_main.py:5-51)."""

import json

import pytest

from pl_bert_tpu.config import Config
from pl_bert_tpu.training.orchestrate import RestartTracker, launch


def test_restart_tracker_counts(tmp_path):
    tracker = RestartTracker(str(tmp_path / "state.json"))
    assert tracker.track() == 0
    assert tracker.track() == 1
    assert tracker.track() == 2
    state = json.loads((tmp_path / "state.json").read_text())
    assert state["count"] == 2


def test_launch_restarts_after_crash(tmp_path):
    cfg = Config.from_dict(
        {"training_params": {"output_dir": str(tmp_path / "out")}}
    )
    cfg_path = str(tmp_path / "cfg.yml")
    cfg.save(cfg_path)

    calls = {"n": 0}

    def flaky_train(args):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("simulated preemption")
        return 42

    result = launch(
        {"config_path": cfg_path, "run_name": "r"},
        max_restarts=5,
        restart_delay=0.01,
        train_fn=flaky_train,
    )
    assert result == 42
    assert calls["n"] == 3
    state = json.loads((tmp_path / "out" / "r" / "restart_tracker.json").read_text())
    assert state["count"] == 2  # two restarts after the first start


def test_launch_gives_up(tmp_path):
    cfg = Config.from_dict(
        {"training_params": {"output_dir": str(tmp_path / "out")}}
    )
    cfg_path = str(tmp_path / "cfg.yml")
    cfg.save(cfg_path)

    def always_fail(args):
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        launch(
            {"config_path": cfg_path, "run_name": "r"},
            max_restarts=2,
            restart_delay=0.01,
            train_fn=always_fail,
        )


def test_subprocess_relaunch_resumes_after_kill(tmp_path):
    """Whole-process elastic restart (reference Modal semantics,
    modal_main.py:40-47): the training child is hard-killed mid-run by
    the PLBERT_CRASH_AT_STEP fault hook (rc 17, simulating preemption);
    the launcher must spawn a FRESH process that auto-resumes from the
    latest step_N checkpoint and finishes the budget."""
    import json
    import os

    from pl_bert_tpu.config import Config
    from pl_bert_tpu.training.orchestrate import launch_subprocess

    raw = {
        "training_params": {
            "output_dir": str(tmp_path / "ckpt"),
            "batch_size": 8,
            "save_interval": 3,
            "log_interval": 1,
            "num_steps": 10,
            "learning_rate": 1e-3,
            "training_dataset": "synthetic:32",
            "mixed_precision": "fp32",
        },
        "dataset_params": {"max_seq_length": 64},
        "model_params": {
            "hidden_size": 32,
            "num_attention_heads": 2,
            "intermediate_size": 64,
            "max_position_embeddings": 64,
            "num_hidden_layers": 1,
            "embedding_size": 16,
            "attention_impl": "xla",
        },
    }
    cfg_path = str(tmp_path / "config.yml")
    Config.from_dict(raw).save(cfg_path)

    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # keep children off the remote TPU
    env["PLBERT_CRASH_AT_STEP"] = "4"  # die right after the step-3 save
    rc = launch_subprocess(
        {"config_path": cfg_path, "run_name": "elastic"},
        max_restarts=3,
        restart_delay=0.1,
        env=env,
    )
    assert rc == 0

    run_dir = tmp_path / "ckpt" / "elastic"
    # the fault actually fired and the launcher actually restarted
    assert (run_dir / ".crash_injected").exists()
    tracker = json.loads((run_dir / "restart_tracker.json").read_text())
    assert tracker["count"] >= 1
    # training finished its full budget after resume
    assert (run_dir / "step_10").exists()
    records = [
        json.loads(l) for l in open(run_dir / "metrics.jsonl")
    ]
    steps = sorted(r["step"] for r in records if "loss" in r)
    # both processes logged: pre-kill steps 1..4 and resumed steps 4..10
    assert steps[0] == 1 and steps[-1] == 10
    assert steps.count(4) == 2  # step 4 ran in the killed AND resumed child
