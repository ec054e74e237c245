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
