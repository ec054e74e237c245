"""Tensor parallelism: shard_map-wrapped Pallas kernels + end-to-end
model_axis=2 training parity on the CPU mesh (VERDICT r1 item 3).

The reference has no TP (SURVEY §2.3 — its 7M-param ALBERT doesn't need
it); this is the TPU build's scaling extension, so the ground truth is
self-consistency: TP must produce the same math as the single-shard
path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pl_bert_tpu.models.albert import attention_bias_from_mask
from pl_bert_tpu.parallel.mesh import make_mesh

B, L, E, H = 2, 128, 256, 4  # head_dim 64 → local 2 heads per TP-2 shard


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


def _mesh_1x2():
    return make_mesh(data=1, model=2, devices=jax.devices("cpu")[:2])


def test_tp_attention_block_matches_single_shard():
    from pl_bert_tpu.ops.attention_block import attention_block
    from pl_bert_tpu.parallel.tp import tp_attention_block

    x, ws, bs, bias = _inputs()
    with pltpu.force_tpu_interpret_mode():
        ref = attention_block(
            x, ws["q"], bs["q"], ws["k"], bs["k"], ws["v"], bs["v"],
            ws["o"], bs["o"], H, bias=bias, out_dtype=jnp.float32,
        )
        tp = tp_attention_block(
            _mesh_1x2(), x, ws["q"], bs["q"], ws["k"], bs["k"], ws["v"],
            bs["v"], ws["o"], bs["o"], H, bias=bias, out_dtype=jnp.float32,
        )
    np.testing.assert_allclose(
        np.asarray(tp), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_tp_attention_block_gradients_match():
    from pl_bert_tpu.ops.attention_block import attention_block
    from pl_bert_tpu.parallel.tp import tp_attention_block

    x, ws, bs, bias = _inputs(seed=1)
    dout = jnp.asarray(
        np.random.default_rng(2).standard_normal((B, L, E)) * 0.1, jnp.float32
    )

    def loss_single(x, ws, bs):
        out = attention_block(
            x, ws["q"], bs["q"], ws["k"], bs["k"], ws["v"], bs["v"],
            ws["o"], bs["o"], H, bias=bias, out_dtype=jnp.float32,
        )
        return jnp.sum(out * dout)

    def loss_tp(x, ws, bs):
        out = tp_attention_block(
            _mesh_1x2(), x, ws["q"], bs["q"], ws["k"], bs["k"], ws["v"],
            bs["v"], ws["o"], bs["o"], H, bias=bias, out_dtype=jnp.float32,
        )
        return jnp.sum(out * dout)

    with pltpu.force_tpu_interpret_mode():
        g_ref = jax.grad(loss_single, argnums=(0, 1, 2))(x, ws, bs)
        g_tp = jax.grad(loss_tp, argnums=(0, 1, 2))(x, ws, bs)
    np.testing.assert_allclose(
        np.asarray(g_tp[0]), np.asarray(g_ref[0]), atol=5e-4, rtol=2e-3,
        err_msg="dx",
    )
    for n in "qkvo":
        np.testing.assert_allclose(
            np.asarray(g_tp[1][n]), np.asarray(g_ref[1][n]),
            atol=5e-4, rtol=2e-3, err_msg=f"dW{n}",
        )
        np.testing.assert_allclose(
            np.asarray(g_tp[2][n]), np.asarray(g_ref[2][n]),
            atol=5e-4, rtol=2e-3, err_msg=f"db{n}",
        )


def test_tp_flash_attention_matches_single_shard():
    from pl_bert_tpu.ops.attention import xla_attention
    from pl_bert_tpu.parallel.tp import tp_flash_attention

    rng = np.random.default_rng(3)
    D = E // H
    q = jnp.asarray(rng.standard_normal((B, L, H, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, H, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H, D)) * 0.3, jnp.float32)
    _, _, _, bias = _inputs()
    ref = xla_attention(q, k, v, bias, dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        tp = tp_flash_attention(
            _mesh_1x2(), q, k, v, bias, out_dtype=jnp.float32
        )
    np.testing.assert_allclose(
        np.asarray(tp), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_tp_model_forward_matches_xla(monkeypatch):
    """Full model wiring: model_axis=2 mesh + pallas_block through the
    shard_map wrappers must reproduce the plain XLA forward from the
    same parameter tree."""
    from pl_bert_tpu.config import ModelParams
    from pl_bert_tpu.models.albert import build_model, init_params
    from pl_bert_tpu.ops import attention as attn_mod

    mp = ModelParams(
        hidden_size=E, num_attention_heads=H, intermediate_size=512,
        max_position_embeddings=L, num_hidden_layers=1, embedding_size=64,
        dropout=0.0, attention_impl="xla",
    )  # 1 layer: the interpret-mode kernel inside shard_map is slow
    model_xla = build_model(mp, mixed_precision="fp32")
    params = init_params(model_xla, max_seq_length=L, seed=0)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 188, (B, L)), jnp.int32
    )
    mask = np.ones((B, L), np.int32)
    mask[0, 90:] = 0
    mask = jnp.asarray(mask)
    ref = model_xla.apply({"params": params}, ids, mask, deterministic=True)

    mesh = make_mesh(data=1, model=2, devices=jax.devices("cpu")[:2])
    mp_tp = dataclasses.replace(mp, attention_impl="pallas_block")
    model_tp = build_model(mp_tp, mixed_precision="fp32", mesh=mesh)
    monkeypatch.setattr(
        attn_mod, "fused_block_supported", lambda *a, **k: True
    )
    with pltpu.force_tpu_interpret_mode():
        apply = jax.jit(
            lambda p, i, m: model_tp.apply({"params": p}, i, m,
                                           deterministic=True)
        )
        out = apply(params, ids, mask)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3
    )


def _train_config(tmp_path, model_axis):
    from pl_bert_tpu.config import Config

    return Config.from_dict(
        {
            "training_params": {
                "output_dir": str(tmp_path / f"ckpt_m{model_axis}"),
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
            },
        }
    )


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)
def test_model_axis_2_loss_matches_model_axis_1(tmp_path):
    """Megatron-sharded training (data 4 × model 2) must follow the pure
    DP (data 8) trajectory step for step — the sharding rules change the
    layout, never the math."""
    from pl_bert_tpu.training.train import Trainer

    losses = {}
    for model_axis in (1, 2):
        cfg = _train_config(tmp_path, model_axis)
        trainer = Trainer(
            cfg, str(tmp_path / f"run_m{model_axis}"), False
        )
        per_step = []
        for i, batch in enumerate(trainer._train_batches(epoch=1)):
            trainer.state, m = trainer.train_step(
                trainer.state, trainer._put(batch), trainer.base_rng
            )
            per_step.append(float(m["loss"]))
            if i == 2:
                break
        losses[model_axis] = per_step
    np.testing.assert_allclose(
        losses[2], losses[1], rtol=2e-5, atol=2e-6
    )


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)
def test_multitask_vocab_parallel_head_matches_model_axis_1(tmp_path):
    """The vocab-sharded grapheme head (token_predictor kernel split over
    the model axis) must reproduce the replicated-head trajectory — the
    chunked CE's max/sum all-reduces change layout, never math."""
    import dataclasses

    from pl_bert_tpu.training.train import Trainer

    losses = {}
    for model_axis in (1, 2):
        cfg = _train_config(tmp_path, model_axis)
        cfg = dataclasses.replace(
            cfg,
            model_params=dataclasses.replace(
                cfg.model_params, num_token_vocab=128
            ),
        )
        trainer = Trainer(
            cfg, str(tmp_path / f"run_mt_m{model_axis}"), False
        )
        assert trainer.use_token_ids
        per_step = []
        for i, batch in enumerate(trainer._train_batches(epoch=1)):
            trainer.state, m = trainer.train_step(
                trainer.state, trainer._put(batch), trainer.base_rng
            )
            per_step.append(
                (float(m["loss"]), float(m["token_loss"]))
            )
            if i == 2:
                break
        losses[model_axis] = per_step
    np.testing.assert_allclose(
        np.asarray(losses[2]), np.asarray(losses[1]), rtol=5e-5, atol=5e-6
    )
    assert all(t > 0 for _, t in losses[1])  # the token head really trains


@pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs >=2 CPU devices"
)
def test_vocab_sharded_gathered_lm_loss_matches_replicated():
    """The production masked_lm_loss path — masked-position GATHER
    (capacity < L) over a token_predictor kernel sharded P(None, model) —
    must equal the replicated computation. (The trainer-level parity test
    uses L=64 < capacity and so only exercises the chunked branch.)"""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pl_bert_tpu.ops.masked_ce import masked_lm_loss, masked_phoneme_loss

    rng = np.random.default_rng(31)
    Bv, Lv, Hv, Vv = 4, 32, 8, 64
    hidden = jnp.asarray(rng.standard_normal((Bv, Lv, Hv)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((Hv, Vv)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(Vv) * 0.01, jnp.float32)
    labels = jnp.asarray(rng.integers(0, Vv, (Bv, Lv)), jnp.int32)
    mask = jnp.asarray(rng.random((Bv, Lv)) < 0.15)
    lengths = jnp.asarray([32, 30, 12, 32], jnp.int32)

    logits = (jnp.dot(hidden, kernel) + bias).astype(jnp.float32)
    expect = float(masked_phoneme_loss(logits, labels, mask, lengths))

    mesh = _mesh_1x2()
    k_sharded = jax.device_put(kernel, NamedSharding(mesh, P(None, "model")))
    b_sharded = jax.device_put(bias, NamedSharding(mesh, P("model")))

    for capacity in (16, 4):  # gather branch; overflow fallback branch
        loss_fn = jax.jit(
            lambda h, k, b: masked_lm_loss(
                h, k, b, labels, mask, lengths,
                capacity=capacity, chunk_size=8,
            )
        )
        got = float(loss_fn(hidden, k_sharded, b_sharded))
        assert abs(got - expect) < 1e-4, capacity


def test_shard_seed_offsets_unique_across_mesh():
    """ADVICE r2 (medium): kernel dropout streams derive from
    shard-LOCAL program ids, so decorrelation rests entirely on the
    per-shard seed offsets. Assert the offset is unique for every
    (data, model) shard of a 4x2 mesh, and that the fused-LN offset
    (data-only) is shared within a model column but distinct across
    data rows — the exact contract tp.py documents."""
    from jax.sharding import PartitionSpec as P

    from pl_bert_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    from pl_bert_tpu.parallel.tp import _SEED_STRIDE, _shard_seed_offset

    mesh = make_mesh(data=4, model=2)
    m = 2

    def attn_offsets():
        return _shard_seed_offset(m).reshape(1, 1)

    def ln_offsets():
        d = jax.lax.axis_index(DATA_AXIS).astype(jnp.int32)
        return (d * jnp.int32(_SEED_STRIDE)).reshape(1, 1)

    grid = jax.shard_map(
        attn_offsets, mesh=mesh, in_specs=(),
        out_specs=P(DATA_AXIS, MODEL_AXIS), check_vma=False,
    )()
    grid = np.asarray(grid)  # [4, 2]: offset of shard (d, r)
    assert grid.shape == (4, 2)
    assert len(np.unique(grid)) == 8  # all attention streams distinct
    # documented layout: (r + m*d) * stride
    for d in range(4):
        for r in range(2):
            assert grid[d, r] == (r + m * d) * _SEED_STRIDE

    ln = np.asarray(
        jax.shard_map(
            ln_offsets, mesh=mesh, in_specs=(),
            out_specs=P(DATA_AXIS, MODEL_AXIS), check_vma=False,
        )()
    )
    # model shards bitwise identical (out_spec replication contract),
    # data shards distinct
    assert (ln[:, 0] == ln[:, 1]).all()
    assert len(np.unique(ln[:, 0])) == 4


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)
def test_model_axis_4_with_sp_matches_model_axis_1(tmp_path):
    """TP generality past the usual 2-way split: data 2 × model 4 with
    sequence parallelism AND the vocab-sharded multitask head (1 head,
    32 FFN columns, 32 vocab rows per shard) must reproduce the pure-DP
    trajectory step for step."""
    import dataclasses

    from pl_bert_tpu.training.train import Trainer

    losses = {}
    for model_axis in (1, 4):
        cfg = _train_config(tmp_path, model_axis)
        cfg = dataclasses.replace(
            cfg,
            model_params=dataclasses.replace(
                cfg.model_params,
                num_token_vocab=128,
                sequence_parallel=model_axis > 1,
            ),
        )
        trainer = Trainer(
            cfg, str(tmp_path / f"run_m4sp_{model_axis}"), False
        )
        per_step = []
        for i, batch in enumerate(trainer._train_batches(epoch=1)):
            trainer.state, m = trainer.train_step(
                trainer.state, trainer._put(batch), trainer.base_rng
            )
            per_step.append((float(m["loss"]), float(m["token_loss"])))
            if i == 2:
                break
        losses[model_axis] = per_step
    np.testing.assert_allclose(
        np.asarray(losses[4]), np.asarray(losses[1]), rtol=5e-5, atol=5e-6
    )


def test_vocab_sharded_fused_lm_loss_matches_replicated():
    """masked_lm_loss(fused=True) — the forward-computed-gradients CE —
    under a P(None, model) vocab-sharded head: GSPMD must partition the
    custom-VJP forward scan (softmax all-reduces, dk vocab-sharded,
    dh psum over the model axis) without changing values OR gradients
    vs the replicated default path."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pl_bert_tpu.ops.masked_ce import masked_lm_loss

    rng = np.random.default_rng(37)
    Bv, Lv, Hv, Vv = 4, 32, 8, 64
    hidden = jnp.asarray(rng.standard_normal((Bv, Lv, Hv)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((Hv, Vv)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(Vv) * 0.01, jnp.float32)
    labels = jnp.asarray(rng.integers(0, Vv, (Bv, Lv)), jnp.int32)
    mask = jnp.asarray(rng.random((Bv, Lv)) < 0.15)
    lengths = jnp.asarray([32, 30, 12, 32], jnp.int32)

    def vg(fused, k, b):
        return jax.jit(
            lambda h, k, b: jax.value_and_grad(
                lambda *a: masked_lm_loss(
                    *a, labels, mask, lengths,
                    capacity=16, chunk_size=8, fused=fused,
                ),
                argnums=(0, 1, 2),
            )(h, k, b)
        )(hidden, k, b)

    v_ref, g_ref = vg(False, kernel, bias)

    mesh = _mesh_1x2()
    k_sh = jax.device_put(kernel, NamedSharding(mesh, P(None, "model")))
    b_sh = jax.device_put(bias, NamedSharding(mesh, P("model")))
    v_fus, g_fus = vg(True, k_sh, b_sh)

    assert abs(float(v_ref) - float(v_fus)) < 1e-5
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(
            np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b)),
            rtol=5e-5, atol=1e-7,
        )
