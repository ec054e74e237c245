"""Reference torch-checkpoint ingestion (VERDICT r2 item 2).

Saves checkpoints from the ACTUAL torch reference model classes
(/root/reference/model.py:5-29, checkpoint format train.py:412-425),
imports them as Flax params, and checks identical logits plus a
continuing training trajectory."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pl_bert_tpu.config import Config, ModelParams  # noqa: E402
from pl_bert_tpu.export.from_torch import (  # noqa: E402
    import_reference_checkpoint,
    reference_state_dict_to_flax,
)
from pl_bert_tpu.models.albert import build_model, init_params  # noqa: E402

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "model.py")),
    reason="reference checkout absent",
)

MP = {
    "hidden_size": 96,
    "num_attention_heads": 4,
    "intermediate_size": 192,
    "max_position_embeddings": 64,
    "num_hidden_layers": 3,
    "embedding_size": 48,
    "dropout": 0.0,
    "attention_impl": "xla",
}


def _reference_torch_model(num_tokens: int = 0, seed: int = 0):
    """Instantiate the actual reference model classes exactly as the
    reference's initialize_model does (reference: train.py:261-270)."""
    from transformers import AlbertConfig as HFConfig, AlbertModel as HFAlbert

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import model as ref_model

    torch.manual_seed(seed)
    hf_cfg = HFConfig(
        vocab_size=188,
        hidden_size=MP["hidden_size"],
        num_attention_heads=MP["num_attention_heads"],
        intermediate_size=MP["intermediate_size"],
        max_position_embeddings=MP["max_position_embeddings"],
        num_hidden_layers=MP["num_hidden_layers"],
        embedding_size=MP["embedding_size"],
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    albert = HFAlbert(hf_cfg)
    if num_tokens:
        return ref_model.MultiTaskModel(
            albert, num_phonemes=188, num_tokens=num_tokens,
            hidden_size=MP["hidden_size"],
        )
    return ref_model.PhonemeOnlyModel(
        albert, num_phonemes=188, hidden_size=MP["hidden_size"]
    )


def _save_reference_checkpoint(model, path, step=4321, epoch=7, ddp=False):
    # exact reference save layout (train.py:412-425); ddp=True mimics the
    # 'module.'-prefixed state dict Accelerate's DDP wrapper produces
    sd = model.state_dict()
    if ddp:
        sd = {f"module.{k}": v for k, v in sd.items()}
    torch.save(
        {"net": sd, "step": step, "epoch": epoch, "optimizer": {}}, path
    )


def _flax_logits(params, ids, num_tokens=0):
    import jax.numpy as jnp

    mp = ModelParams(**MP, num_token_vocab=num_tokens)
    model = build_model(mp, "fp32")
    mask = jnp.ones_like(jnp.asarray(ids))
    out = model.apply(
        {"params": params}, jnp.asarray(ids), mask, deterministic=True
    )
    return out


@pytest.mark.parametrize("ddp", [False, True])
def test_phoneme_only_import_identical_logits(tmp_path, ddp):
    tm = _reference_torch_model().eval()
    path = str(tmp_path / "step_4321.pth")
    _save_reference_checkpoint(tm, path, ddp=ddp)

    template = init_params(
        build_model(ModelParams(**MP), "fp32"), 64, seed=0
    )
    params, step, epoch = import_reference_checkpoint(path, template)
    assert (step, epoch) == (4321, 7)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 188, size=(2, 64)).astype(np.int32)
    with torch.no_grad():
        want = tm(torch.from_numpy(ids).long()).numpy()
    got = np.asarray(_flax_logits(params, ids))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def test_multitask_import_identical_logits(tmp_path):
    tm = _reference_torch_model(num_tokens=250).eval()
    path = str(tmp_path / "step_1.pth")
    _save_reference_checkpoint(tm, path)

    template = init_params(
        build_model(ModelParams(**MP, num_token_vocab=250), "fp32"), 64, seed=0
    )
    params, _, _ = import_reference_checkpoint(path, template)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 188, size=(2, 64)).astype(np.int32)
    with torch.no_grad():
        want_ph, want_tok = tm(torch.from_numpy(ids).long())
    got_ph, got_tok = _flax_logits(params, ids, num_tokens=250)
    np.testing.assert_allclose(
        np.asarray(got_ph), want_ph.numpy(), rtol=1e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_tok), want_tok.numpy(), rtol=1e-4, atol=2e-5
    )


def test_import_shape_mismatch_fails_loudly(tmp_path):
    """The reference's own export silently drops mismatched embeddings
    via strict=False (convert_to_hf.py:27); the importer must refuse."""
    tm = _reference_torch_model()
    path = str(tmp_path / "step_1.pth")
    _save_reference_checkpoint(tm, path)
    wrong = dict(MP, hidden_size=64, num_attention_heads=2)
    template = init_params(build_model(ModelParams(**wrong), "fp32"), 64)
    with pytest.raises(ValueError, match="shape mismatches"):
        import_reference_checkpoint(path, template)


def test_import_head_set_mismatch_fails_loudly(tmp_path):
    # phoneme-only checkpoint into a multi-task model: token head missing
    tm = _reference_torch_model()
    path = str(tmp_path / "step_1.pth")
    _save_reference_checkpoint(tm, path)
    template = init_params(
        build_model(ModelParams(**MP, num_token_vocab=250), "fp32"), 64
    )
    with pytest.raises(ValueError, match="missing from checkpoint"):
        import_reference_checkpoint(path, template)


def test_bare_state_dict_import(tmp_path):
    tm = _reference_torch_model().eval()
    path = str(tmp_path / "weights.pth")
    torch.save(tm.state_dict(), path)
    params, step, epoch = import_reference_checkpoint(path)
    assert (step, epoch) == (0, 0)
    assert "phoneme_predictor" in params and "encoder" in params


def test_warm_start_continues_training(tmp_path):
    """model_params.pretrained_model pointing at a reference .pth:
    Trainer warm-starts from it and the loss trajectory continues
    (finite, decreasing over a few steps) — the 'continue a reference
    run on TPU' migration path."""
    import dataclasses

    from pl_bert_tpu.training.train import Trainer, make_synthetic_corpus

    tm = _reference_torch_model().eval()
    path = str(tmp_path / "step_500.pth")
    _save_reference_checkpoint(tm, path, step=500, epoch=1)

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        training_params=dataclasses.replace(
            cfg.training_params, batch_size=8, data_axis=-1, model_axis=1,
            num_steps=6, output_dir=str(tmp_path / "ckpt"),
            save_interval=1000,
        ),
        dataset_params=dataclasses.replace(
            cfg.dataset_params, max_seq_length=64, ondevice_masking=True,
        ),
        model_params=dataclasses.replace(
            cfg.model_params, **MP, pretrained_model=path,
        ),
    )
    data = make_synthetic_corpus(64, seed=0)
    t = Trainer(cfg, str(tmp_path / "ckpt/run"), resuming=False, dataset=data)
    # warm start took: params equal the imported checkpoint's encoder
    emb = np.asarray(
        t.state.params["encoder"]["embeddings"]["word_embeddings"]["embedding"]
    )
    want = tm.encoder.embeddings.word_embeddings.weight.detach().numpy()
    np.testing.assert_allclose(emb, want, atol=1e-6)
    t.train()
    assert t.current_step == 6
    # the continued run's loss trajectory is real and finite
    import json

    lines = [
        json.loads(l)
        for l in open(str(tmp_path / "ckpt/run/metrics.jsonl"))
    ]
    losses = [
        r["phoneme_loss"] for r in lines if "phoneme_loss" in r
    ]
    assert losses and all(np.isfinite(x) for x in losses)
