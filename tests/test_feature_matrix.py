"""Feature-interaction matrix smoke: sampled combinations of training
features that no single-feature test pairs together.

Each combo builds a tiny Trainer on the virtual CPU mesh, runs two real
steps through the production batch path, asserts finite losses and a
coherent step counter, and (where a checkpoint is saved) that resume
restores the exact step. Single features each have dedicated parity
tests; this is the cross-product net (e.g. zero1 × accum × clip ×
cosine × packing × tp/sp × multitask interactions).
"""

import dataclasses

import jax
import numpy as np
import pytest

from pl_bert_tpu.config import Config

COMBOS = {
    "dp8_packing_accum_cosine_clip_zero1": dict(
        model_axis=1, multitask=False, packing=True, accum=2,
        schedule="cosine", clip=1.0, zero1=True, async_save=False, sp=False,
    ),
    "tp2_sp_multitask_async_keep2": dict(
        model_axis=2, multitask=True, packing=False, accum=1,
        schedule="none", clip=0.0, zero1=False, async_save=True, sp=True,
        fused_head=True,  # fused linear CE x tp x sp
    ),
    "tp4_multitask_zero1_warmup_accum": dict(
        model_axis=4, multitask=True, packing=False, accum=2,
        schedule="linear", clip=0.5, zero1=True, async_save=False, sp=False,
        fused_head=True,  # fused linear CE x grad-accum x zero1 x tp4
    ),
    "tp2_sp_packing_multitask_zero1": dict(
        model_axis=2, multitask=True, packing=True, accum=1,
        schedule="cosine", clip=1.0, zero1=True, async_save=False, sp=True,
    ),
}


def _config(tmp_path, name, c):
    raw = {
        "training_params": {
            "output_dir": str(tmp_path / f"ckpt_{name}"),
            "batch_size": 8,
            "save_interval": 2,
            "log_interval": 1,
            "num_steps": 2,
            "learning_rate": 1e-3,
            "training_dataset": "synthetic:48",
            "mixed_precision": "fp32",
            "model_axis": c["model_axis"],
            "seed": 5,
            "grad_accum_steps": c["accum"],
            "lr_schedule": c["schedule"] if c["schedule"] != "none" else "constant",
            "warmup_steps": 1 if c["schedule"] != "none" else 0,
            "grad_clip_norm": c["clip"],
            "zero1": c["zero1"],
            "async_save": c["async_save"],
            "keep_checkpoints": 2 if c["async_save"] else 0,
            "fused_lm_head": c.get("fused_head", False),
        },
        "dataset_params": {
            "max_seq_length": 64,
            "ondevice_masking": c["packing"],
            "sequence_packing": c["packing"],
        },
        "model_params": {
            "hidden_size": 64,
            "num_attention_heads": 4,
            "intermediate_size": 128,
            "max_position_embeddings": 64,
            "num_hidden_layers": 2,
            "embedding_size": 32,
            "attention_impl": "xla",
            "dropout": 0.0,
            "num_token_vocab": 96 if c["multitask"] else 0,
            "sequence_parallel": c["sp"],
        },
    }
    return Config.from_dict(raw)


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)
@pytest.mark.parametrize("name", sorted(COMBOS))
def test_feature_combo_trains_and_resumes(tmp_path, name):
    from pl_bert_tpu.training.train import Trainer

    c = COMBOS[name]
    cfg = _config(tmp_path, name, c)
    run_dir = str(tmp_path / f"run_{name}")
    trainer = Trainer(cfg, run_dir, False)
    trainer.train()

    assert int(trainer.state.step) == 2
    # metrics jsonl exists with finite losses
    import json
    import os

    mpath = os.path.join(run_dir, "metrics.jsonl")
    assert os.path.exists(mpath)
    losses = [
        json.loads(line)["loss"]
        for line in open(mpath)
        if "loss" in json.loads(line)
    ]
    assert losses and all(np.isfinite(l) for l in losses)

    # a checkpoint landed at step 2 and a fresh Trainer resumes from it
    trainer2 = Trainer(cfg, run_dir, True)
    assert int(trainer2.state.step) == 2
