"""End-to-end training tests on the virtual 8-device CPU mesh."""

import os

import numpy as np
import pytest

from pl_bert_tpu.config import Config
from pl_bert_tpu.training.train import (
    Trainer,
    make_synthetic_corpus,
    setup_config_and_directories,
    train,
)

SMOKE = {
    "training_params": {
        "output_dir": "",  # filled per-test
        "batch_size": 8,
        "save_interval": 4,
        "log_interval": 2,
        "num_steps": 6,
        "learning_rate": 1e-3,
        "training_dataset": "synthetic:64",
        "max_epochs": 10,
        "mixed_precision": "fp32",
        "data_axis": -1,
        "model_axis": 1,
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


def _write_config(tmp_path, **overrides):
    import copy

    raw = copy.deepcopy(SMOKE)
    raw["training_params"]["output_dir"] = str(tmp_path / "ckpt")
    for sec, kv in overrides.items():
        raw.setdefault(sec, {}).update(kv)
    cfg_path = tmp_path / "config.yml"
    Config.from_dict(raw).save(str(cfg_path))
    return str(cfg_path)


def test_loss_decreases_and_checkpoints(tmp_path):
    cfg_path = _write_config(tmp_path)
    final = train({"config_path": cfg_path, "run_name": "smoke"})
    assert final == 6
    run_dir = tmp_path / "ckpt" / "smoke"
    assert (run_dir / "step_4").is_dir()
    assert (run_dir / "config.yml").exists()
    assert (run_dir / "metrics.jsonl").exists()
    # loss went down over the few steps
    import json

    records = [json.loads(l) for l in open(run_dir / "metrics.jsonl")]
    losses = [r["loss"] for r in records if "loss" in r]
    # metrics emit every log_interval (=2) steps → 3 training records
    assert len(losses) >= 3
    assert losses[-1] < losses[0] * 1.5  # sanity: not exploding


def test_resume_from_checkpoint(tmp_path):
    cfg_path = _write_config(tmp_path)
    train({"config_path": cfg_path, "run_name": "resume"})
    # second invocation resumes at step 6 and stops immediately
    config, log_dir, resuming = setup_config_and_directories(
        {"run_name": "resume"}, cfg_path
    )
    assert resuming
    trainer = Trainer(config, log_dir, resuming)
    assert trainer.current_step == 6
    # params actually restored (non-zero step means opt state momentum too)
    mu_leaves = [np.asarray(x) for x in __import__("jax").tree.leaves(
        trainer.state.opt_state
    ) if hasattr(x, "shape") and x.size > 1]
    assert any(np.abs(l).sum() > 0 for l in mu_leaves)


def test_fresh_start_cleans_stale_steps(tmp_path):
    cfg_path = _write_config(tmp_path)
    run_dir = tmp_path / "ckpt" / "stale"
    os.makedirs(run_dir / "step_999")
    # no config copy in dir → fresh start must remove stale step dirs
    config, log_dir, resuming = setup_config_and_directories(
        {"run_name": "stale"}, cfg_path
    )
    assert not resuming
    assert not (run_dir / "step_999").exists()
    assert (run_dir / "config.yml").exists()


def test_data_parallel_equals_single_device(tmp_path):
    """SPMD gradient math: an 8-way data-parallel step produces the same
    loss trajectory as the same batch on fewer devices (mesh-size
    invariance of the update)."""
    import jax

    corpus = make_synthetic_corpus(64, seed=1)
    cfg_path = _write_config(tmp_path)
    config = Config.load(cfg_path)

    cfg8, _ = config, None
    t8 = Trainer(cfg8, str(tmp_path / "r8"), False, dataset=corpus)
    losses8 = []
    for i, batch in enumerate(t8.train_data.batches(epoch=1)):
        t8.state, m = t8.train_step(t8.state, t8._put(batch), t8.base_rng)
        losses8.append(float(m["loss"]))
        if i == 2:
            break

    # single-device mesh over device 0
    config2 = Config.from_dict(
        {**config.to_dict(), "training_params": {
            **config.to_dict()["training_params"], "data_axis": 1}}
    )
    import pl_bert_tpu.training.train as train_mod

    orig = train_mod.make_mesh
    train_mod.make_mesh = lambda data, model, devices=None: orig(
        1, 1, devices=[jax.devices()[0]]
    )
    try:
        t1 = train_mod.Trainer(config2, str(tmp_path / "r1"), False, dataset=corpus)
    finally:
        train_mod.make_mesh = orig
    losses1 = []
    for i, batch in enumerate(t1.train_data.batches(epoch=1)):
        t1.state, m = t1.train_step(t1.state, t1._put(batch), t1.base_rng)
        losses1.append(float(m["loss"]))
        if i == 2:
            break

    np.testing.assert_allclose(losses8, losses1, rtol=2e-4)


def test_warm_start_from_pretrained_model(tmp_path):
    """model_params.pretrained_model loads a step_N checkpoint's params
    (optimizer state ignored, step counter fresh) — the reference's
    warm-start semantics (train.py:274-276)."""
    import jax

    # run A: train a few steps and checkpoint
    cfg_a = _write_config(tmp_path)
    train({"config_path": cfg_a, "run_name": "warma"})
    ckpt = str(tmp_path / "ckpt" / "warma" / "step_6")
    assert os.path.exists(ckpt)

    # run B: fresh trainer warm-started from A's checkpoint
    cfg_b = _write_config(
        tmp_path, model_params={"pretrained_model": ckpt},
        training_params={"seed": 99},  # different init seed
    )
    config_b = Config.load(cfg_b)
    trainer = Trainer(config_b, str(tmp_path / "runb"), False)
    assert int(trainer.state.step) == 0  # fresh step counter

    from pl_bert_tpu.models.albert import build_model, init_params
    from pl_bert_tpu.training.checkpoint import load_params_only

    template = init_params(
        build_model(config_b.model_params, "fp32"), 64, seed=0
    )
    expect = load_params_only(ckpt, template)
    got_leaf = np.asarray(
        trainer.state.params["encoder"]["embeddings"]["word_embeddings"][
            "embedding"
        ]
    )
    exp_leaf = np.asarray(
        expect["encoder"]["embeddings"]["word_embeddings"]["embedding"]
    )
    np.testing.assert_allclose(got_leaf, exp_leaf, atol=1e-7)

    # and it is NOT the fresh seed-99 init
    fresh = init_params(build_model(config_b.model_params, "fp32"), 64, seed=99)
    fresh_leaf = np.asarray(
        fresh["encoder"]["embeddings"]["word_embeddings"]["embedding"]
    )
    assert not np.allclose(got_leaf, fresh_leaf)


def test_epoch_cap_exit_saves_final_checkpoint(tmp_path):
    """A run that ends by exhausting max_epochs (reference hardcodes 10,
    train.py:145) must persist its tail like the num_steps exit does —
    and a relaunch must see the run as COMPLETE, not replay the final
    epoch."""
    import json

    # 64 samples, 95/5 split → 60 train rows → 7 batches of 8 per epoch;
    # max_epochs=1 ends at step 7, which is NOT save_interval-aligned
    cfg_path = _write_config(
        tmp_path,
        training_params={"num_steps": 1000, "max_epochs": 1},
    )
    corpus = make_synthetic_corpus(64, seed=0)
    final = train(
        {"config_path": cfg_path, "run_name": "cap"}, dataset=corpus
    )
    run_dir = tmp_path / "ckpt" / "cap"
    assert (run_dir / f"step_{final}").is_dir(), "tail checkpoint missing"

    # relaunch: resumes, recognizes completion, trains NOTHING new
    again = train(
        {"config_path": cfg_path, "run_name": "cap"}, dataset=corpus
    )
    assert again == final
    records = [json.loads(l) for l in open(run_dir / "metrics.jsonl")]
    steps = [r["step"] for r in records if "phoneme_loss" in r]
    assert steps == sorted(set(steps)), "relaunch re-trained steps"
    assert max(steps) == final


def test_validation_excludes_zero_mask_batches(tmp_path):
    """A validation batch where masking selected ZERO positions must not
    enter the validation mean: our masked CE returns a vacuous 0.0 for
    it (diluting the mean toward zero) and the reference's torch CE
    returns NaN (reference: train.py:288-304 np.mean's per-batch
    loss.item()s, which an all-ignored batch poisons). word_pred_prob=0
    makes EVERY batch zero-mask, so validate() must report None."""
    cfg_path = _write_config(
        tmp_path, dataset_params={"word_pred_prob": 0.0}
    )
    cfg = Config.load(cfg_path)
    tr = Trainer(cfg, str(tmp_path / "run0"), resuming=False)
    assert tr.validate() is None
    assert tr._last_val_batches == 0

    # sanity: with the default masking rate the same split validates
    cfg_path2 = _write_config(tmp_path)
    cfg2 = Config.load(cfg_path2)
    tr2 = Trainer(cfg2, str(tmp_path / "run1"), resuming=False)
    val = tr2.validate()
    assert val is not None
    loss, acc = val
    assert np.isfinite(loss) and loss > 0.0
    assert tr2._last_val_batches >= 1


def test_load_params_only_abstract_template_stays_on_host(tmp_path):
    """An ABSTRACT restore template (jax.eval_shape ShapeDtypeStructs)
    yields host numpy arrays, bitwise equal to the concrete-template
    restore — the serving /reload and HF-export loaders rely on this to
    avoid compiling a device-side model.init just to pin the tree
    structure (checkpoint.py::_place_like)."""
    import jax

    from pl_bert_tpu.models.albert import build_model, init_params
    from pl_bert_tpu.training.checkpoint import load_params_only
    from pl_bert_tpu.training.train import Trainer

    cfg = Config.load(_write_config(tmp_path))
    Trainer(cfg, str(tmp_path / "run"), resuming=False).train()
    ckpt = str(tmp_path / "run" / "step_4")

    model = build_model(cfg.model_params, "fp32")
    concrete = load_params_only(
        ckpt, init_params(model, 64, seed=0)
    )
    abstract = load_params_only(
        ckpt, jax.eval_shape(lambda: init_params(model, 64, seed=0))
    )
    leaves_a = jax.tree_util.tree_leaves_with_path(abstract)
    leaves_c = dict(
        (jax.tree_util.keystr(p), l)
        for p, l in jax.tree_util.tree_leaves_with_path(concrete)
    )
    assert leaves_a, "empty restore"
    for path, leaf in leaves_a:
        assert isinstance(leaf, np.ndarray), (
            f"{jax.tree_util.keystr(path)} is {type(leaf)}, expected "
            "host numpy under an abstract template"
        )
        np.testing.assert_array_equal(
            leaf, np.asarray(leaves_c[jax.tree_util.keystr(path)])
        )
