"""Fused attention-block kernel (QKV + attention + out-proj) correctness
(interpret mode on CPU) and model wiring parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pl_bert_tpu.models.albert import attention_bias_from_mask
from pl_bert_tpu.ops.attention import xla_attention
from pl_bert_tpu.ops.attention_block import attention_block, block_supported

B, L, E, H = 2, 128, 256, 4  # head_dim 64 → two 2-head groups


def _inputs(seed=0, masked=False, segments=False):
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
    bias = None
    if masked:
        mask = np.ones((B, L), np.int32)
        mask[0, 100:] = 0
        bias = attention_bias_from_mask(jnp.asarray(mask))
    seg = None
    if segments:
        seg_np = np.zeros((B, L), np.int32)
        seg_np[:, L // 2 :] = 1
        seg = jnp.asarray(seg_np)
    return x, ws, bs, bias, seg


def _reference(x, ws, bs, bias, seg):
    D = E // H
    q = (x @ ws["q"] + bs["q"]).reshape(B, L, H, D)
    k = (x @ ws["k"] + bs["k"]).reshape(B, L, H, D)
    v = (x @ ws["v"] + bs["v"]).reshape(B, L, H, D)
    ctx = xla_attention(q, k, v, bias, segment_ids=seg, dtype=jnp.float32)
    return ctx.reshape(B, L, E) @ ws["o"] + bs["o"]


def _fused(x, ws, bs, bias, seg):
    return attention_block(
        x, ws["q"], bs["q"], ws["k"], bs["k"], ws["v"], bs["v"],
        ws["o"], bs["o"], H, bias=bias, segment_ids=seg,
        out_dtype=jnp.float32,
    )


def test_block_supported_gate():
    assert block_supported(512, 12, 64)
    assert block_supported(128, 4, 64)
    assert not block_supported(512, 12, 32)  # head_dim below lane pairing
    assert not block_supported(100, 12, 64)  # ragged sequence


@pytest.mark.parametrize("masked,segments", [(False, False), (True, False), (False, True), (True, True)])
def test_forward_matches_composition(masked, segments):
    x, ws, bs, bias, seg = _inputs(masked=masked, segments=segments)
    ref = _reference(x, ws, bs, bias, seg)
    with pltpu.force_tpu_interpret_mode():
        out = _fused(x, ws, bs, bias, seg)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4
    )


def test_backward_matches_composition():
    x, ws, bs, bias, seg = _inputs(seed=1, masked=True)

    def loss_ref(x, ws, bs):
        o = _reference(x, ws, bs, bias, seg)
        return jnp.sum(o * jnp.cos(o))

    def loss_fused(x, ws, bs):
        o = _fused(x, ws, bs, bias, seg)
        return jnp.sum(o * jnp.cos(o))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ws, bs)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, ws, bs)

    np.testing.assert_allclose(
        np.asarray(g_fused[0]), np.asarray(g_ref[0]), atol=5e-4, rtol=2e-3,
        err_msg="dx",
    )
    for n in "qkvo":
        np.testing.assert_allclose(
            np.asarray(g_fused[1][n]), np.asarray(g_ref[1][n]),
            atol=5e-4, rtol=2e-3, err_msg=f"dw{n}",
        )
        np.testing.assert_allclose(
            np.asarray(g_fused[2][n]), np.asarray(g_ref[2][n]),
            atol=5e-4, rtol=2e-3, err_msg=f"db{n}",
        )


def test_fully_masked_rows_finite():
    x, ws, bs, _, _ = _inputs(seed=2)
    mask = np.zeros((B, L), np.int32)
    mask[1, :] = 1
    bias = attention_bias_from_mask(jnp.asarray(mask))
    with pltpu.force_tpu_interpret_mode():
        out = _fused(x, ws, bs, bias, None)
    assert np.isfinite(np.asarray(out)).all()


def test_model_pallas_block_wiring(monkeypatch):
    """The pallas_block model branch (params via _DenseParams, fused
    kernel) must produce the same forward as the XLA branch from the SAME
    parameter tree — catches any q/k/v/dense wiring or param-tree
    mismatch."""
    from pl_bert_tpu.config import ModelParams
    from pl_bert_tpu.models import albert
    from pl_bert_tpu.models.albert import build_model, init_params
    from pl_bert_tpu.ops import attention as attn_mod

    mp = ModelParams(
        hidden_size=256, num_attention_heads=4, intermediate_size=512,
        max_position_embeddings=128, num_hidden_layers=2, embedding_size=64,
        dropout=0.0, attention_impl="xla",
    )
    model_xla = build_model(mp, mixed_precision="fp32")
    params = init_params(model_xla, max_seq_length=128, seed=0)

    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 188, (2, 128)), jnp.int32
    )
    mask = np.ones((2, 128), np.int32)
    mask[0, 90:] = 0
    mask = jnp.asarray(mask)
    ref = model_xla.apply({"params": params}, ids, mask, deterministic=True)

    import dataclasses

    mp_block = dataclasses.replace(mp, attention_impl="pallas_block")
    model_block = build_model(mp_block, mixed_precision="fp32")
    # interpret mode on CPU: override the on-TPU gate (fused LN stays
    # gated off; it has its own interpret tests)
    monkeypatch.setattr(
        attn_mod, "fused_block_supported", lambda *a, **k: True
    )
    with pltpu.force_tpu_interpret_mode():
        out = model_block.apply(
            {"params": params}, ids, mask, deterministic=True
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3
    )


def test_block_supported_vmem_bound():
    """E > 1024 must be rejected (measured v5e compile-time VMEM OOM at
    E=2048: the kernel keeps 4 [E,E] bf16 weights VMEM-resident) so the
    auto dispatch falls back to the per-head flash kernel."""
    from pl_bert_tpu.ops.attention_block import block_supported

    assert block_supported(512, 16, 64)       # E=1024: fits (measured)
    assert not block_supported(512, 32, 64)   # E=2048: VMEM OOM
    assert not block_supported(512, 16, 128)  # E=2048 via head_dim 128
    # tensor parallelism: weights are [E, P], so the budget scales with
    # E·P — a LOCAL width of 1024 must still be rejected when the
    # GLOBAL width is 2048 (E·P = 2^21), while E=1024 TP-sharded passes
    assert not block_supported(512, 16, 64, global_width=2048)
    assert block_supported(512, 8, 64, global_width=1024)


@pytest.mark.parametrize("rate", [0.0, 0.3])
def test_primal_light_kernel_matches_differentiated_forward(rate):
    """The primal-only path runs the LIGHT kernel (no backward-residual
    stores — eval/serving skip ~300 MB/layer of dead HBM writes at the
    flagship shape); the custom-VJP contract requires its value to be
    equal to the saving forward that runs under differentiation, to
    accumulation-order rounding (the fullwidth light grid projects the
    output in one [L,P]x[P,E] dot where the grouped grid stages G
    partial adds in an fp32 scratch — last-ulp differences). rate>0
    additionally pins the dropout stream structure; true (seed, head)
    stream numbering is chip-only (interpret mode stubs the PRNG) and
    is pinned in tests/test_tpu_hardware.py."""
    x, ws, bs, bias, seg = _inputs(masked=True)
    seed = jnp.asarray([7], jnp.int32) if rate > 0 else None

    def call(xx):
        return attention_block(
            xx, ws["q"], bs["q"], ws["k"], bs["k"], ws["v"], bs["v"],
            ws["o"], bs["o"], H, bias=bias, segment_ids=seg,
            out_dtype=jnp.float32, dropout_rate=rate, dropout_seed=seed,
        )

    with pltpu.force_tpu_interpret_mode():
        primal = call(x)  # light kernel
        via_fwd, _ = jax.value_and_grad(
            lambda xx: jnp.sum(call(xx))
        )(x)  # saving kernel
        expect = float(jnp.sum(primal))
    np.testing.assert_allclose(
        np.asarray(expect), np.asarray(via_fwd), rtol=1e-5
    )


def test_light_fullwidth_matches_grouped(monkeypatch):
    """The fullwidth (B,)-grid light kernel and the grouped (B,G) light
    kernel must agree to accumulation-order rounding — the fullwidth
    grid projects the output in ONE [L,P]x[P,E] dot, the grouped grid
    stages G partial adds in an fp32 scratch (PLBERT_ATTN_FULLWIDTH=0
    forces grouped)."""
    x, ws, bs, bias, seg = _inputs(masked=True, segments=True)

    def call(xx):
        return attention_block(
            xx, ws["q"], bs["q"], ws["k"], bs["k"], ws["v"], bs["v"],
            ws["o"], bs["o"], H, bias=bias, segment_ids=seg,
            out_dtype=jnp.float32,
        )

    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("PLBERT_ATTN_FULLWIDTH", "1")
        full = call(x)
        monkeypatch.setenv("PLBERT_ATTN_FULLWIDTH", "0")
        grouped = call(x)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(grouped), atol=2e-6
    )


def test_fullwidth_light_gate_is_dtype_aware():
    """fp32 at the flagship shape needs 22.93M scoped VMEM — over the
    16M limit (chip-measured compile OOM, round 4; fp32 reaches the
    light kernel via flax param init, whose tracing forward runs at
    param dtype). The fullwidth grid must only engage for <=2-byte
    compute; wider falls back to the grouped (B, G) grid."""
    from pl_bert_tpu.ops.attention_block import _fullwidth_light_ok

    assert _fullwidth_light_ok(512, 768, 768, 2)
    assert not _fullwidth_light_ok(512, 768, 768, 4)
    assert _fullwidth_light_ok(512, 768, 768, 1)
    assert not _fullwidth_light_ok(1024, 768, 768, 2)  # unchanged L gate
