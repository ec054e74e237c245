"""Config schema tests (reference config contract: configs/config.yml)."""

import pytest

from pl_bert_tpu.config import Config, ConfigError


def test_load_default_config(tmp_path):
    cfg = Config.load("configs/config.yml")
    assert cfg.model_params.hidden_size == 768
    assert cfg.model_params.vocab_size == 188
    assert cfg.dataset_params.max_seq_length == 512
    assert cfg.training_params.batch_size == 96
    assert cfg.training_params.learning_rate == pytest.approx(7e-5)
    # round trip
    p = tmp_path / "c.yml"
    cfg.save(str(p))
    cfg2 = Config.load(str(p))
    assert cfg2.to_dict() == cfg.to_dict()


def test_unknown_key_rejected():
    with pytest.raises(ConfigError):
        Config.from_dict({"model_params": {"hidden_sizee": 768}})
    with pytest.raises(ConfigError):
        Config.from_dict({"bogus_section": {}})


def test_mask_probs_validated():
    with pytest.raises(ConfigError):
        Config.from_dict(
            {"dataset_params": {"phoneme_mask_prob": 0.9, "replace_prob": 0.3}}
        )


def test_defaults_match_reference():
    cfg = Config.from_dict({})
    mp = cfg.model_params
    assert (mp.num_attention_heads, mp.intermediate_size, mp.num_hidden_layers) == (
        12,
        2048,
        12,
    )
    assert mp.embedding_size == 128  # HF AlbertConfig default the reference inherits
    dp = cfg.dataset_params
    assert (dp.word_pred_prob, dp.phoneme_mask_prob, dp.replace_prob) == (
        0.15,
        0.8,
        0.1,
    )


import os as _os

import pytest as _pytest


@_pytest.mark.skipif(
    not _os.path.isdir("/root/reference"), reason="reference checkout absent"
)
def test_reference_config_loads_verbatim():
    """A migrating user's unmodified reference configs/config.yml must
    load through the schema as-is: every key known, reference-compat
    keys (num_process, fp16) accepted, values landing where the
    reference put them (fp16 maps to bf16 at build time — the TPU
    substitution, models/albert.py::build_model)."""
    cfg = Config.load("/root/reference/configs/config.yml")
    assert cfg.training_params.batch_size == 96
    assert cfg.training_params.num_steps == 1_000_000
    assert cfg.training_params.learning_rate == 7e-5
    assert cfg.training_params.mixed_precision == "fp16"
    assert cfg.dataset_params.word_separator == 87
    assert cfg.dataset_params.max_seq_length == 512
    assert cfg.model_params.hidden_size == 768
    assert cfg.model_params.pretrained_model.endswith("step_116000.pth")
    assert cfg.preprocess_params.num_shards == 10000

    import jax.numpy as jnp

    from pl_bert_tpu.models.albert import build_model

    model = build_model(cfg.model_params, cfg.training_params.mixed_precision)
    assert model.cfg.dtype == jnp.bfloat16


def test_lm_head_capacity_validated_and_threaded():
    with pytest.raises(ConfigError):
        Config.from_dict(
            {"training_params": {"lm_head_capacity": -1}}
        )
    cfg = Config.from_dict(
        {"training_params": {"lm_head_capacity": 144}}
    )
    assert cfg.training_params.lm_head_capacity == 144
    # default is the chip-adopted 144 (≈4.8σ above the measured
    # masked-count distribution at the reference masking setup;
    # 201.0k vs 191.0k tok/s multitask — BENCH_LEDGER mtcap144)
    assert Config().training_params.lm_head_capacity == 144
