"""Async checkpoint writes (training_params.async_save).

The writer snapshots state into fresh device buffers before the next
step's donated-buffer reuse, then runs the orbax write in a background
thread. These tests pin snapshot integrity (async checkpoints are
bitwise identical to a sync run's, even though training kept mutating
the donated state underneath the write), resume, and error surfacing.
"""

import copy
import os

import jax
import numpy as np
import pytest

from pl_bert_tpu.config import Config
from pl_bert_tpu.training.checkpoint import AsyncCheckpointWriter
from pl_bert_tpu.training.train import train, make_synthetic_corpus

SMOKE = {
    "training_params": {
        "output_dir": "",
        "batch_size": 8,
        "save_interval": 2,
        "log_interval": 1,
        "num_steps": 5,
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
        "dropout": 0.1,
        "attention_impl": "xla",
    },
}


def _run(tmp_path, run_name, **tp_overrides):
    raw = copy.deepcopy(SMOKE)
    raw["training_params"]["output_dir"] = str(tmp_path / "ckpt")
    raw["training_params"].update(tp_overrides)
    cfg_path = tmp_path / f"{run_name}.yml"
    Config.from_dict(raw).save(str(cfg_path))
    final = train({"config_path": str(cfg_path), "run_name": run_name})
    return final, tmp_path / "ckpt" / run_name


def test_async_checkpoints_bitwise_equal_sync(tmp_path):
    """Every async-written step_N must equal the sync run's — donation
    reuses the state buffers immediately after submit, so any aliasing
    in the snapshot would corrupt the bytes on disk."""
    from pl_bert_tpu.training.checkpoint import load_checkpoint
    from pl_bert_tpu.training.train import Trainer

    _, sync_dir = _run(tmp_path, "sync", async_save=False)
    _, async_dir = _run(tmp_path, "async", async_save=True)

    steps = sorted(
        n for n in os.listdir(sync_dir) if n.startswith("step_")
    )
    assert steps == sorted(
        n for n in os.listdir(async_dir) if n.startswith("step_")
    )
    assert steps  # at least one checkpoint

    # templates for restore: build a trainer shell once
    raw = copy.deepcopy(SMOKE)
    raw["training_params"]["output_dir"] = str(tmp_path / "ckpt")
    trainer = Trainer(
        Config.from_dict(raw), str(tmp_path / "tpl"), False,
        dataset=make_synthetic_corpus(64, seed=0),
    )
    for step in steps:
        p_sync, o_sync, m_sync = load_checkpoint(
            str(sync_dir / step), trainer.state.params, trainer.state.opt_state
        )
        p_async, o_async, m_async = load_checkpoint(
            str(async_dir / step), trainer.state.params, trainer.state.opt_state
        )
        assert m_sync == m_async
        for a, b in zip(jax.tree.leaves(p_sync), jax.tree.leaves(p_async)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(o_sync), jax.tree.leaves(o_async)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_run_resumes(tmp_path):
    final, run_dir = _run(tmp_path, "resume", async_save=True, num_steps=4)
    assert final == 4
    # re-invoke: resumes at 4 (>= num_steps) and exits immediately
    raw = copy.deepcopy(SMOKE)
    raw["training_params"]["output_dir"] = str(tmp_path / "ckpt")
    raw["training_params"].update(async_save=True, num_steps=4)
    cfg_path = tmp_path / "resume.yml"
    Config.from_dict(raw).save(str(cfg_path))
    assert train({"config_path": str(cfg_path), "run_name": "resume"}) == 4


def test_writer_error_surfaces_on_wait(tmp_path):
    writer = AsyncCheckpointWriter()
    params = {"w": jax.numpy.ones((4,))}
    target = tmp_path / "not_a_dir"
    target.write_text("a file where the run dir should be")
    writer.submit(str(target), 1, params, params)
    with pytest.raises(BaseException):
        writer.wait()
    # the error is consumed: the writer is reusable afterwards
    writer.submit(str(tmp_path / "ok"), 1, params, params)
    writer.wait()
    assert os.path.isdir(tmp_path / "ok" / "step_1")
