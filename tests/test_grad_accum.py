"""Gradient accumulation (training_params.grad_accum_steps).

The accumulation step weights each micro-batch's gradient by its
samples-with-masks count, which reproduces the reference loss semantics
(per-sample mean CE, then mean over samples with >=1 mask — reference:
train.py:107-131) over the CONCATENATED batch exactly. These tests pin
that equality at dropout 0 (the RNG streams are the only difference),
the empty-micro-batch padding of ragged final groups, and the Trainer
end-to-end wiring (stacked sharding over the 8-device CPU mesh).
"""

import copy
import json

import jax
import numpy as np

from pl_bert_tpu.config import Config
from pl_bert_tpu.training.train import Trainer, make_synthetic_corpus
from pl_bert_tpu.training.train_step import (
    TrainState,
    batch_to_arrays,
    make_train_step,
)

SMOKE = {
    "training_params": {
        "output_dir": "",
        "batch_size": 8,
        "save_interval": 100,
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
        "dropout": 0.0,  # accumulation == large batch holds exactly
        "attention_impl": "xla",
    },
}


def _config(tmp_path, **overrides):
    raw = copy.deepcopy(SMOKE)
    raw["training_params"]["output_dir"] = str(tmp_path / "ckpt")
    for sec, kv in overrides.items():
        raw.setdefault(sec, {}).update(kv)
    cfg_path = tmp_path / "config.yml"
    cfg = Config.from_dict(raw)
    cfg.save(str(cfg_path))
    return cfg, str(cfg_path)


def _fresh_state(trainer):
    params = jax.tree.map(np.array, trainer.state.params)
    return TrainState(
        params, trainer.tx.init(params), jax.numpy.int32(0)
    )


def _two_batches(trainer):
    it = trainer.train_data.batches(epoch=1)
    return batch_to_arrays(next(it)), batch_to_arrays(next(it))


def test_accum_step_equals_large_batch(tmp_path):
    cfg, _ = _config(tmp_path)
    trainer = Trainer(
        cfg, str(tmp_path / "run"), False,
        dataset=make_synthetic_corpus(64, seed=3),
    )
    b0, b1 = _two_batches(trainer)
    big = {k: np.concatenate([b0[k], b1[k]]) for k in b0}
    stacked = {k: np.stack([b0[k], b1[k]]) for k in b0}

    step1 = make_train_step(trainer.model, trainer.tx, donate=False)
    step2 = make_train_step(
        trainer.model, trainer.tx, donate=False, grad_accum=2
    )
    rng = trainer.base_rng

    s_big, m_big = step1(_fresh_state(trainer), big, rng)
    s_acc, m_acc = step2(_fresh_state(trainer), stacked, rng)

    np.testing.assert_allclose(
        float(m_big["loss"]), float(m_acc["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m_big["grad_norm"]), float(m_acc["grad_norm"]), rtol=1e-5
    )
    for pa, pb in zip(
        jax.tree.leaves(s_big.params), jax.tree.leaves(s_acc.params)
    ):
        # atol covers fp32 reduction-order noise: the accumulated path
        # sums per-micro grads in a different order than the fused big
        # batch (observed worst case ~3e-6 abs on 4e-3 elements)
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=2e-5, atol=5e-6
        )


def test_ragged_tail_empty_micro_contributes_nothing(tmp_path):
    """A final group padded with an all-zero micro-batch (length-0 rows)
    must produce the same update as the real rows alone — the weighted
    accumulation gives empty micros zero weight instead of diluting."""
    cfg, _ = _config(tmp_path)
    trainer = Trainer(
        cfg, str(tmp_path / "run"), False,
        dataset=make_synthetic_corpus(64, seed=5),
    )
    b0, _ = _two_batches(trainer)
    empty = {k: np.zeros_like(v) for k, v in b0.items()}
    stacked = {k: np.stack([b0[k], empty[k]]) for k in b0}

    step1 = make_train_step(trainer.model, trainer.tx, donate=False)
    step2 = make_train_step(
        trainer.model, trainer.tx, donate=False, grad_accum=2
    )
    rng = trainer.base_rng

    s_ref, m_ref = step1(_fresh_state(trainer), b0, rng)
    s_acc, m_acc = step2(_fresh_state(trainer), stacked, rng)

    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_acc["loss"]), rtol=1e-6
    )
    # atol 5e-6: the accumulated grad is (g*n)/n — the 1-ulp round-trip
    # difference vs g gets amplified by AdamW's eps-normalized update on
    # near-zero grads (0.1% of the 1e-3-lr step on isolated elements)
    for pa, pb in zip(
        jax.tree.leaves(s_ref.params), jax.tree.leaves(s_acc.params)
    ):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=2e-5, atol=5e-6
        )


def test_trainer_grad_accum_end_to_end(tmp_path):
    """Trainer wiring over the 8-device mesh: stacked [accum, B, ...]
    batches shard on the batch axis, each optimizer step consumes
    ``accum`` loader batches (batch accounting), metrics log per
    optimizer step."""
    from pl_bert_tpu.training.train import train

    _, cfg_path = _config(
        tmp_path, training_params={"grad_accum_steps": 2, "num_steps": 4}
    )
    final = train({"config_path": cfg_path, "run_name": "accum"})
    assert final == 4
    records = [
        json.loads(l)
        for l in open(tmp_path / "ckpt" / "accum" / "metrics.jsonl")
    ]
    losses = [r["loss"] for r in records if "loss" in r]
    assert len(losses) == 4 and all(np.isfinite(losses))


def test_trainer_grad_accum_ondevice_masking(tmp_path):
    """Accumulation composes with the on-device masking path: the scan
    body runs whole-word masking per micro-batch with a per-micro rng."""
    from pl_bert_tpu.training.train import train

    _, cfg_path = _config(
        tmp_path,
        training_params={"grad_accum_steps": 2, "num_steps": 2},
        dataset_params={"ondevice_masking": True},
    )
    final = train({"config_path": cfg_path, "run_name": "accum_odm"})
    assert final == 2
    records = [
        json.loads(l)
        for l in open(tmp_path / "ckpt" / "accum_odm" / "metrics.jsonl")
    ]
    losses = [r["loss"] for r in records if "loss" in r]
    assert losses and all(np.isfinite(losses))
