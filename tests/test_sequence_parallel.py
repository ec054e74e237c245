"""Megatron-style sequence parallelism (model_params.sequence_parallel).

SP only changes WHERE activations live: the attention out-projection's
cross-shard combine becomes a psum_scatter over the sequence, the
LN/dropout kernels run on L/m sequence shards, and GSPMD re-gathers
going into the TP FFN / the next layer's attention. The reference has
no TP at all (SURVEY §2.3), so the ground truth is self-consistency:
the GLOBAL arrays must be identical with SP on and off (exactly at
dropout 0; the in-kernel dropout streams legitimately differ because
shards hold different rows).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pl_bert_tpu.config import Config, ModelParams
from pl_bert_tpu.models.albert import attention_bias_from_mask
from pl_bert_tpu.parallel.mesh import make_mesh

B, L, E, H = 2, 128, 256, 4  # head_dim 64 → 2 local heads per TP-2 shard


def _mesh_1x2():
    return make_mesh(data=1, model=2, devices=jax.devices("cpu")[:2])


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, L, E)) * 0.5, jnp.float32)
    ws = {
        n: jnp.asarray(rng.standard_normal((E, E)) * 0.05, jnp.float32)
        for n in "qkvo"
    }
    bs = {
        n: jnp.asarray(rng.standard_normal(E) * 0.02, jnp.float32)
        for n in "qkvo"
    }
    mask = np.ones((B, L), np.int32)
    mask[0, 100:] = 0
    bias = attention_bias_from_mask(jnp.asarray(mask))
    return x, ws, bs, bias


def test_sp_attention_block_values_match_psum():
    """psum_scatter out-combine must produce the same GLOBAL array as
    the psum path — sharding is the only difference."""
    from pl_bert_tpu.parallel.tp import tp_attention_block

    x, ws, bs, bias = _inputs()
    mesh = _mesh_1x2()
    args = (mesh, x, ws["q"], bs["q"], ws["k"], bs["k"], ws["v"], bs["v"],
            ws["o"], bs["o"], H)
    with pltpu.force_tpu_interpret_mode():
        ref = tp_attention_block(*args, bias=bias, out_dtype=jnp.float32)
        sp = tp_attention_block(
            *args, bias=bias, out_dtype=jnp.float32, sp=True
        )
    assert sp.sharding.spec[1] == "model"  # L-sharded over the model axis
    np.testing.assert_allclose(
        np.asarray(sp), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_sp_compiles_to_reduce_scatter():
    """The point of SP is the collective swap: the compiled HLO must
    contain a reduce-scatter (and NO all-reduce) for the attention
    output combine; the psum path compiles to an all-reduce."""
    from pl_bert_tpu.parallel.tp import tp_attention_block

    x, ws, bs, _ = _inputs()
    mesh = _mesh_1x2()

    def compiled_text(sp):
        f = jax.jit(
            lambda x: tp_attention_block(
                mesh, x, ws["q"], bs["q"], ws["k"], bs["k"], ws["v"],
                bs["v"], ws["o"], bs["o"], H, sp=sp, out_dtype=jnp.float32,
            )
        )
        with pltpu.force_tpu_interpret_mode():
            return f.lower(x).compile().as_text()

    sp_hlo = compiled_text(True)
    assert "reduce-scatter" in sp_hlo and "all-reduce" not in sp_hlo
    no_hlo = compiled_text(False)
    assert "all-reduce" in no_hlo and "reduce-scatter" not in no_hlo


def test_sp_attention_block_rejects_indivisible_seq():
    from pl_bert_tpu.parallel.tp import tp_attention_block

    x, ws, bs, bias = _inputs()
    x = x[:, :127]  # 127 % model_axis 2 != 0
    with pytest.raises(ValueError, match="model_axis"):
        tp_attention_block(
            _mesh_1x2(), x, ws["q"], bs["q"], ws["k"], bs["k"], ws["v"],
            bs["v"], ws["o"], bs["o"], H, bias=None, sp=True,
        )


def test_sp_dropout_add_layernorm_matches():
    from pl_bert_tpu.parallel.tp import tp_dropout_add_layernorm

    rng = np.random.default_rng(3)
    # per-shard rows (B·L/m = 512) must still be a multiple of the fused
    # kernel's 256-row block — the model-side fused_supported gate checks
    # this via _local_rows; here the kernel is driven directly
    x = jnp.asarray(rng.standard_normal((4, 256, E)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((4, 256, E)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(E) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(E) * 0.1, jnp.float32)
    mesh = _mesh_1x2()
    with pltpu.force_tpu_interpret_mode():
        ref = tp_dropout_add_layernorm(
            mesh, x, res, scale, bias, None, 0.0, 1e-12
        )
        sp = tp_dropout_add_layernorm(
            mesh, x, res, scale, bias, None, 0.0, 1e-12, sp=True
        )
    assert sp.sharding.spec[1] == "model"
    np.testing.assert_allclose(
        np.asarray(sp), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_sp_model_forward_matches_xla(monkeypatch):
    """Full model: SP + pallas_block through the shard_map wrappers must
    reproduce the plain XLA forward from the same params."""
    from pl_bert_tpu.models.albert import build_model, init_params
    from pl_bert_tpu.ops import attention as attn_mod

    mp = ModelParams(
        hidden_size=E, num_attention_heads=H, intermediate_size=512,
        max_position_embeddings=L, num_hidden_layers=2, embedding_size=64,
        dropout=0.0, attention_impl="xla",
    )
    model_xla = build_model(mp, mixed_precision="fp32")
    params = init_params(model_xla, max_seq_length=L, seed=0)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 188, (B, L)), jnp.int32
    )
    mask = np.ones((B, L), np.int32)
    mask[0, 90:] = 0
    mask = jnp.asarray(mask)
    ref = model_xla.apply({"params": params}, ids, mask, deterministic=True)

    mp_sp = dataclasses.replace(
        mp, attention_impl="pallas_block", sequence_parallel=True
    )
    model_sp = build_model(mp_sp, mixed_precision="fp32", mesh=_mesh_1x2())
    monkeypatch.setattr(
        attn_mod, "fused_block_supported", lambda *a, **k: True
    )
    with pltpu.force_tpu_interpret_mode():
        apply = jax.jit(
            lambda p, i, m: model_sp.apply({"params": p}, i, m,
                                           deterministic=True)
        )
        out = apply(params, ids, mask)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3
    )


def _train_config(tmp_path, model_axis, sp):
    return Config.from_dict(
        {
            "training_params": {
                "output_dir": str(tmp_path / f"ckpt_m{model_axis}_sp{sp}"),
                "batch_size": 8,
                "save_interval": 100,
                "log_interval": 10,
                "num_steps": 3,
                "learning_rate": 1e-3,
                "training_dataset": "synthetic:32",
                "mixed_precision": "fp32",
                "model_axis": model_axis,
                "seed": 11,
            },
            "dataset_params": {"max_seq_length": 64},
            "model_params": {
                "hidden_size": 64,
                "num_attention_heads": 4,
                "intermediate_size": 128,
                "max_position_embeddings": 64,
                "num_hidden_layers": 2,
                "embedding_size": 32,
                "attention_impl": "xla",
                "dropout": 0.0,
                "sequence_parallel": sp,
            },
        }
    )


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)
def test_sp_training_loss_matches_tp(tmp_path):
    """data 4 × model 2 with sequence_parallel must follow the same
    trajectory as plain TP step for step (XLA attention path: SP is
    expressed purely through GSPMD shardings there, so this pins that
    the config threads through without changing the math)."""
    from pl_bert_tpu.training.train import Trainer

    losses = {}
    for sp in (False, True):
        cfg = _train_config(tmp_path, 2, sp)
        trainer = Trainer(cfg, str(tmp_path / f"run_sp{sp}"), False)
        per_step = []
        for i, batch in enumerate(trainer._train_batches(epoch=1)):
            trainer.state, m = trainer.train_step(
                trainer.state, trainer._put(batch), trainer.base_rng
            )
            per_step.append(float(m["loss"]))
            if i == 2:
                break
        losses[sp] = per_step
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-5)


def test_sp_with_remat_forward(monkeypatch):
    """SP under rematerialization (nn.remat wraps the shared layer at
    large scales): the L-sharded shard_map islands must trace cleanly
    inside the checkpointed layer and keep value parity."""
    from pl_bert_tpu.models.albert import build_model, init_params
    from pl_bert_tpu.ops import attention as attn_mod

    mp = ModelParams(
        hidden_size=E, num_attention_heads=H, intermediate_size=512,
        max_position_embeddings=L, num_hidden_layers=2, embedding_size=64,
        dropout=0.0, attention_impl="xla",
    )
    model_xla = build_model(mp, mixed_precision="fp32")
    params = init_params(model_xla, max_seq_length=L, seed=1)
    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, 188, (B, L)), jnp.int32
    )
    mask = jnp.ones((B, L), jnp.int32)
    ref = model_xla.apply({"params": params}, ids, mask, deterministic=True)

    mp_sp = dataclasses.replace(
        mp, attention_impl="pallas_block", sequence_parallel=True
    )
    model_sp = build_model(
        mp_sp, mixed_precision="fp32", mesh=_mesh_1x2(), remat=True
    )
    monkeypatch.setattr(
        attn_mod, "fused_block_supported", lambda *a, **k: True
    )
    with pltpu.force_tpu_interpret_mode():
        out = jax.jit(
            lambda p, i, m: model_sp.apply({"params": p}, i, m,
                                           deterministic=True)
        )(params, ids, mask)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3
    )


def test_sp_attention_block_gradients_match():
    """Backward through the SP path: the psum_scatter's transpose (an
    all-gather over L) must produce the same gradients as the psum path
    for the input and every weight/bias."""
    from pl_bert_tpu.parallel.tp import tp_attention_block

    x, ws, bs, bias = _inputs(seed=1)
    dout = jnp.asarray(
        np.random.default_rng(2).standard_normal((B, L, E)) * 0.1, jnp.float32
    )

    def loss(sp):
        def f(x, ws, bs):
            out = tp_attention_block(
                _mesh_1x2(), x, ws["q"], bs["q"], ws["k"], bs["k"],
                ws["v"], bs["v"], ws["o"], bs["o"], H, bias=bias,
                out_dtype=jnp.float32, sp=sp,
            )
            return jnp.sum(out * dout)
        return f

    with pltpu.force_tpu_interpret_mode():
        g_ref = jax.grad(loss(False), argnums=(0, 1, 2))(x, ws, bs)
        g_sp = jax.grad(loss(True), argnums=(0, 1, 2))(x, ws, bs)
    np.testing.assert_allclose(
        np.asarray(g_sp[0]), np.asarray(g_ref[0]), atol=5e-4, rtol=2e-3,
        err_msg="dx",
    )
    for n in "qkvo":
        np.testing.assert_allclose(
            np.asarray(g_sp[1][n]), np.asarray(g_ref[1][n]),
            atol=5e-4, rtol=2e-3, err_msg=f"dW{n}",
        )
        np.testing.assert_allclose(
            np.asarray(g_sp[2][n]), np.asarray(g_ref[2][n]),
            atol=5e-4, rtol=2e-3, err_msg=f"db{n}",
        )


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)
def test_sp_training_with_sequence_packing_matches_dp(tmp_path):
    """Sequence packing × tensor parallelism × sequence parallelism:
    packed batches (segment_ids/position_ids planes, block-diagonal
    attention from segments) must follow the SAME loss trajectory on a
    4×2 mesh — with and without SP — as on pure DP. Pins that the
    packed-batch planes thread through the TP/SP shardings unchanged."""
    import dataclasses

    from pl_bert_tpu.training.train import Trainer

    losses = {}
    for model_axis, sp in ((1, False), (2, False), (2, True)):
        cfg = _train_config(tmp_path, model_axis, sp)
        cfg = dataclasses.replace(
            cfg,
            dataset_params=dataclasses.replace(
                cfg.dataset_params,
                ondevice_masking=True,
                sequence_packing=True,
            ),
        )
        trainer = Trainer(
            cfg, str(tmp_path / f"packrun_m{model_axis}_sp{sp}"), False
        )
        assert trainer.packed.packing_efficiency > 0
        per_step = []
        for i, batch in enumerate(trainer._train_batches(epoch=1)):
            trainer.state, m = trainer.train_step(
                trainer.state, trainer._put(batch), trainer.base_rng
            )
            per_step.append(float(m["loss"]))
            if i == 1:
                break
        losses[(model_axis, sp)] = per_step
    np.testing.assert_allclose(
        losses[(2, False)], losses[(1, False)], rtol=2e-5
    )
    np.testing.assert_allclose(
        losses[(2, True)], losses[(1, False)], rtol=2e-5
    )
