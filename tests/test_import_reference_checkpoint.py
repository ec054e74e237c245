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


def _masked_batch_stream(n_steps, n=6, L=64, seed=11):
    """Deterministic masked-batch sequence shared by both stacks."""
    from pl_bert_tpu.data.collate import collate_fixed
    from pl_bert_tpu.data.masking import MaskingParams, WholeWordMasker

    rng = np.random.default_rng(seed)
    alphabet = list("ɑɐɒæbtkmnlsʃθð")
    corpus = [
        [
            "".join(rng.choice(alphabet, size=int(rng.integers(2, 8))))
            for _ in range(int(rng.integers(6, 14)))
        ]
        for _ in range(n)
    ]
    masker = WholeWordMasker(MaskingParams(max_seq_length=L), seed=12)
    return [
        collate_fixed(
            [masker(corpus[i], epoch=s, index=i) for i in range(n)], L
        )
        for s in range(n_steps)
    ]


def _torch_step(tmodel, topt, criterion, batch):
    """One reference training step (loss loop, train.py:107-131)."""
    ids_t = torch.from_numpy(np.asarray(batch.masked_ids)).long()
    mask_t = torch.from_numpy(np.asarray(batch.attention_mask).astype(np.int64))
    pred = tmodel(ids_t, attention_mask=mask_t)
    loss_terms = []
    for i in range(len(batch.lengths)):
        idx = np.nonzero(batch.mask_positions[i])[0]
        if len(idx) == 0:
            continue
        ln = int(batch.lengths[i])
        loss_terms.append(
            criterion(
                pred[i][:ln][idx],
                torch.from_numpy(batch.label_ids[i][:ln][idx]).long(),
            )
        )
    loss = sum(loss_terms) / len(loss_terms)
    topt.zero_grad()
    loss.backward()
    topt.step()
    return float(loss)


def test_full_state_import_trajectory_parity(tmp_path):
    """import_reference_run: torch trains 3 steps, saves WITH AdamW
    state; both stacks then continue the SAME 3 batches. The full-state
    import must track torch's trajectory (moments + bias-correction
    count carried over), and must track it strictly better than the
    params-only warm start (fresh moments), proving the moments matter
    and transferred correctly."""
    import jax
    import jax.numpy as jnp
    import optax

    from pl_bert_tpu.export.from_torch import import_reference_run
    from pl_bert_tpu.ops.masked_ce import masked_phoneme_loss
    from pl_bert_tpu.training.train_step import (
        batch_to_arrays,
        make_optimizer,
    )
    from pl_bert_tpu.config import TrainingParams

    L, LR = 64, 1e-3
    batches = _masked_batch_stream(6, L=L)

    tmodel = _reference_torch_model().train()
    topt = torch.optim.AdamW(tmodel.parameters(), lr=LR)
    criterion = torch.nn.CrossEntropyLoss()
    for b in batches[:3]:
        _torch_step(tmodel, topt, criterion, b)
    path = str(tmp_path / "step_3.pth")
    torch.save(
        {"net": tmodel.state_dict(), "step": 3, "epoch": 0,
         "optimizer": topt.state_dict()},
        path,
    )

    model = build_model(ModelParams(**MP), "fp32")
    template = init_params(model, L, seed=0)
    tx = make_optimizer(
        TrainingParams(learning_rate=LR, mixed_precision="fp32")
    )
    params, opt_state, step, epoch = import_reference_run(path, template, tx)
    assert (step, epoch) == (3, 0)
    assert int(opt_state[0].count) == 3  # bias-correction position carried

    params_fresh, _, _ = import_reference_checkpoint(path, template)
    opt_fresh = tx.init(params_fresh)

    @jax.jit
    def jstep(params, opt_state, arrays):
        def loss_fn(p):
            logits = model.apply(
                {"params": p}, arrays["masked_ids"],
                (jnp.arange(L)[None, :] < arrays["lengths"][:, None]).astype(
                    jnp.int32
                ),
                deterministic=True,
            )
            return masked_phoneme_loss(
                logits, arrays["label_ids"], arrays["mask_positions"],
                arrays["lengths"],
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t_losses, full_losses, fresh_losses = [], [], []
    for b in batches[3:]:
        t_losses.append(_torch_step(tmodel, topt, criterion, b))
        arrays = {k: jnp.asarray(v) for k, v in batch_to_arrays(b).items()}
        params, opt_state, l1 = jstep(params, opt_state, arrays)
        full_losses.append(float(l1))
        params_fresh, opt_fresh, l2 = jstep(params_fresh, opt_fresh, arrays)
        fresh_losses.append(float(l2))

    np.testing.assert_allclose(full_losses, t_losses, rtol=5e-3, atol=5e-4)
    # fresh-moment continuation visibly diverges from the true run
    # (losses after the first continued step differ), while the
    # full-state one stays glued to torch
    full_err = max(abs(a - b) for a, b in zip(full_losses[1:], t_losses[1:]))
    fresh_err = max(abs(a - b) for a, b in zip(fresh_losses[1:], t_losses[1:]))
    assert fresh_err > 10 * full_err, (fresh_err, full_err)


def test_convert_cli_produces_resumable_run(tmp_path):
    """python -m pl_bert_tpu.export.from_torch: the converted .pth
    becomes a run directory the trainer RESUMES like one of its own
    checkpoints (step position, config-copy marker, optimizer state)."""
    import dataclasses
    import json

    from pl_bert_tpu.export import from_torch
    from pl_bert_tpu.training.train import make_synthetic_corpus, train

    batches = _masked_batch_stream(2, L=64)
    tmodel = _reference_torch_model().train()
    topt = torch.optim.AdamW(tmodel.parameters(), lr=1e-3)
    criterion = torch.nn.CrossEntropyLoss()
    for b in batches:
        _torch_step(tmodel, topt, criterion, b)
    pth = str(tmp_path / "step_2.pth")
    torch.save(
        {"net": tmodel.state_dict(), "step": 2, "epoch": 1,
         "optimizer": topt.state_dict()},
        pth,
    )

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        training_params=dataclasses.replace(
            cfg.training_params, batch_size=8, data_axis=-1, model_axis=1,
            num_steps=4, output_dir=str(tmp_path / "ckpt"),
            save_interval=1000, log_interval=1, mixed_precision="fp32",
            training_dataset="synthetic:64",
        ),
        dataset_params=dataclasses.replace(
            cfg.dataset_params, max_seq_length=64, ondevice_masking=True,
        ),
        model_params=dataclasses.replace(cfg.model_params, **MP),
    )
    cfg_path = str(tmp_path / "cfg.yml")
    cfg.save(cfg_path)

    run_dir = str(tmp_path / "ckpt" / "migrated")
    from_torch.main([
        "--pth", pth, "--config_path", cfg_path, "--run_dir", run_dir,
    ])
    assert os.path.isdir(os.path.join(run_dir, "step_2"))
    # the resume marker: a config copy named after the config file
    assert os.path.exists(os.path.join(run_dir, "cfg.yml"))

    final = train(
        {"config_path": cfg_path, "run_name": "migrated"},
        dataset=make_synthetic_corpus(64, seed=0),
    )
    assert final == 4
    lines = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    trained_steps = [r["step"] for r in lines if "phoneme_loss" in r]
    # resumed AT step 2: only steps 3 and 4 were trained
    assert trained_steps == [3, 4]

    # and back out: to_torch CLI exports the continued run as a
    # reference step_N.pth a torch AdamW can load (full circle)
    from pl_bert_tpu.export import to_torch

    out_pth = str(tmp_path / "back_step_4.pth")
    to_torch.main([
        "--checkpoint", run_dir, "--config_path", cfg_path,
        "--output", out_pth,
    ])
    ckpt = torch.load(out_pth, map_location="cpu", weights_only=True)
    assert ckpt["step"] == 4
    rmodel = _reference_torch_model(seed=3)
    missing, unexpected = rmodel.load_state_dict(ckpt["net"], strict=False)
    assert not unexpected and all("position_ids" in m for m in missing)
    ropt = torch.optim.AdamW(rmodel.parameters(), lr=1e-3)
    ropt.load_state_dict(ckpt["optimizer"])  # strict, reference train.py:101


def test_full_state_import_refuses_empty_optimizer(tmp_path):
    from pl_bert_tpu.export.from_torch import import_reference_run
    from pl_bert_tpu.training.train_step import make_optimizer
    from pl_bert_tpu.config import TrainingParams

    tm = _reference_torch_model()
    path = str(tmp_path / "step_1.pth")
    _save_reference_checkpoint(tm, path)  # saves optimizer: {}
    template = init_params(build_model(ModelParams(**MP), "fp32"), 64)
    tx = make_optimizer(TrainingParams(mixed_precision="fp32"))
    with pytest.raises(ValueError, match="no optimizer state"):
        import_reference_run(path, template, tx)


def test_bidirectional_roundtrip_matches_uninterrupted_torch(tmp_path):
    """Full circle: torch trains steps 1-2 → TPU imports (moments
    included) and trains steps 3-4 → exports a reference step_4.pth →
    torch reloads it (its own load semantics, train.py:81-105) and
    trains steps 5-6. Every leg must track an UNINTERRUPTED 6-step
    torch run on the same batches — the bidirectional migration gate."""
    import jax
    import jax.numpy as jnp
    import optax

    from pl_bert_tpu.config import TrainingParams
    from pl_bert_tpu.export.from_torch import import_reference_run
    from pl_bert_tpu.export.to_torch import export_reference_checkpoint
    from pl_bert_tpu.ops.masked_ce import masked_phoneme_loss
    from pl_bert_tpu.training.train_step import (
        batch_to_arrays,
        make_optimizer,
    )

    L, LR = 64, 1e-3
    batches = _masked_batch_stream(6, L=L)
    criterion = torch.nn.CrossEntropyLoss()

    # uninterrupted control run
    control = _reference_torch_model(seed=0).train()
    copt = torch.optim.AdamW(control.parameters(), lr=LR)
    control_losses = [
        _torch_step(control, copt, criterion, b) for b in batches
    ]

    # leg 1: torch, steps 1-2 (identical init: same seed)
    tmodel = _reference_torch_model(seed=0).train()
    topt = torch.optim.AdamW(tmodel.parameters(), lr=LR)
    leg1 = [_torch_step(tmodel, topt, criterion, b) for b in batches[:2]]
    np.testing.assert_allclose(leg1, control_losses[:2], rtol=0, atol=0)
    pth1 = str(tmp_path / "step_2.pth")
    torch.save(
        {"net": tmodel.state_dict(), "step": 2, "epoch": 0,
         "optimizer": topt.state_dict()},
        pth1,
    )

    # leg 2: TPU, steps 3-4
    tp = TrainingParams(learning_rate=LR, mixed_precision="fp32")
    model = build_model(ModelParams(**MP), "fp32")
    template = init_params(model, L, seed=0)
    tx = make_optimizer(tp)
    params, opt_state, step, _ = import_reference_run(pth1, template, tx)
    assert step == 2

    @jax.jit
    def jstep(params, opt_state, arrays):
        def loss_fn(p):
            logits = model.apply(
                {"params": p}, arrays["masked_ids"],
                (jnp.arange(L)[None, :] < arrays["lengths"][:, None]).astype(
                    jnp.int32
                ),
                deterministic=True,
            )
            return masked_phoneme_loss(
                logits, arrays["label_ids"], arrays["mask_positions"],
                arrays["lengths"],
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    leg2 = []
    for b in batches[2:4]:
        arrays = {k: jnp.asarray(v) for k, v in batch_to_arrays(b).items()}
        params, opt_state, loss = jstep(params, opt_state, arrays)
        leg2.append(float(loss))
    np.testing.assert_allclose(leg2, control_losses[2:4], rtol=5e-3, atol=5e-4)

    pth2 = str(tmp_path / "step_4.pth")
    export_reference_checkpoint(
        params, opt_state, tp, pth2, step=4, epoch=0
    )

    # leg 3: back on torch, steps 5-6 — the reference's own load
    # semantics (train.py:81-105: strict=False params, strict optimizer)
    ckpt = torch.load(pth2, map_location="cpu", weights_only=True)
    assert ckpt["step"] == 4
    rmodel = _reference_torch_model(seed=1).train()  # different init: must be overwritten
    missing, unexpected = rmodel.load_state_dict(ckpt["net"], strict=False)
    assert not unexpected
    assert all("position_ids" in m for m in missing)
    ropt = torch.optim.AdamW(rmodel.parameters(), lr=LR)
    ropt.load_state_dict(ckpt["optimizer"])
    leg3 = [
        _torch_step(rmodel, ropt, criterion, b) for b in batches[4:6]
    ]
    np.testing.assert_allclose(leg3, control_losses[4:6], rtol=5e-3, atol=1e-3)


def test_multitask_full_state_roundtrip_bitwise(tmp_path):
    """Multi-task head ordering in the moment alignment: torch
    MultiTaskModel AdamW state → TPU → back must reproduce every moment
    tensor (phoneme AND token heads) and the net weights bitwise-close —
    a misalignment of the two heads' indices would scramble them."""
    from pl_bert_tpu.config import TrainingParams
    from pl_bert_tpu.export.from_torch import import_reference_run
    from pl_bert_tpu.export.to_torch import export_reference_checkpoint
    from pl_bert_tpu.training.train_step import make_optimizer

    tm = _reference_torch_model(num_tokens=250).train()
    topt = torch.optim.AdamW(tm.parameters(), lr=1e-3)
    ids = torch.randint(0, 188, (2, 32))
    for _ in range(2):  # populate moments with distinct per-head values
        ph, tok = tm(ids)
        loss = ph.float().pow(2).mean() + tok.float().pow(2).mean()
        topt.zero_grad()
        loss.backward()
        topt.step()
    pth = str(tmp_path / "step_2.pth")
    torch.save(
        {"net": tm.state_dict(), "step": 2, "epoch": 0,
         "optimizer": topt.state_dict()},
        pth,
    )

    tp = TrainingParams(learning_rate=1e-3, mixed_precision="fp32")
    template = init_params(
        build_model(ModelParams(**MP, num_token_vocab=250), "fp32"), 64
    )
    tx = make_optimizer(tp)
    params, opt_state, step, _ = import_reference_run(pth, template, tx)
    out = str(tmp_path / "back.pth")
    export_reference_checkpoint(params, opt_state, tp, out, step=step)

    orig = torch.load(pth, map_location="cpu", weights_only=True)
    back = torch.load(out, map_location="cpu", weights_only=True)
    # same parameter indexing: identical state-entry index sets
    assert set(back["optimizer"]["state"]) == set(orig["optimizer"]["state"])
    names = [k for k in orig["net"]]
    for i, entry in orig["optimizer"]["state"].items():
        got = back["optimizer"]["state"][i]
        assert float(got["step"]) == float(entry["step"])
        for key in ("exp_avg", "exp_avg_sq"):
            np.testing.assert_allclose(
                got[key].numpy(), entry[key].numpy(), atol=1e-7,
                err_msg=f"moment {key} of param {i} ({names[i]})",
            )
    for name in orig["net"]:
        np.testing.assert_allclose(
            back["net"][name].numpy(), orig["net"][name].numpy(),
            atol=1e-7, err_msg=name,
        )
