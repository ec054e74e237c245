"""Fused dropout+add+LayerNorm kernel: numeric + gradient parity
(interpret mode, dropout off — the PRNG path is TPU-only; masking
semantics are shared with the attention kernel's tested _dropout)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from pl_bert_tpu.ops.fused_ln import dropout_add_layernorm

N, H = 512, 256


def _reference(x, res, gamma, beta, eps=1e-12):
    y = x.astype(jnp.float32) + res.astype(jnp.float32)
    mean = y.mean(-1, keepdims=True)
    var = ((y - mean) ** 2).mean(-1, keepdims=True)
    xhat = (y - mean) * jax.lax.rsqrt(var + eps)
    return xhat * gamma + beta


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(H) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(H) * 0.1, jnp.float32)
    return x, res, gamma, beta


def test_forward_matches_reference():
    x, res, gamma, beta = _inputs()
    with pltpu.force_tpu_interpret_mode():
        out = dropout_add_layernorm(x, res, gamma, beta)
    ref = _reference(x, res, gamma, beta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_gradients_match_reference():
    x, res, gamma, beta = _inputs(seed=1)

    def loss_fused(x, res, gamma, beta):
        o = dropout_add_layernorm(x, res, gamma, beta)
        return jnp.sum(o * jnp.sin(o))

    def loss_ref(x, res, gamma, beta):
        o = _reference(x, res, gamma, beta)
        return jnp.sum(o * jnp.sin(o))

    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, res, gamma, beta)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, res, gamma, beta)
    for gf, gr, name in zip(g_fused, g_ref, ["dx", "dres", "dgamma", "dbeta"]):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-4, rtol=1e-3, err_msg=name
        )


def test_batched_shape_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 256, H)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((2, 256, H)), jnp.float32)
    gamma = jnp.ones(H)
    beta = jnp.zeros(H)
    with pltpu.force_tpu_interpret_mode():
        out = dropout_add_layernorm(x, res, gamma, beta)
    assert out.shape == (2, 256, H)
    ref = _reference(x.reshape(-1, H), res.reshape(-1, H), gamma, beta)
    np.testing.assert_allclose(
        np.asarray(out).reshape(-1, H), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_block_rows_divide_realistic_row_counts():
    """Block rows must be powers of two bounded by the 256·1024 VMEM
    budget: a proportional rule at non-power-of-two widths (168 at
    H=1536) never divides the B·L row counts the model produces, which
    silently disabled the kernel exactly where the bound was added."""
    from pl_bert_tpu.ops.fused_ln import _block_rows, fused_supported

    flagship_rows = 96 * 512
    for H in (768, 1024, 1280, 1536, 1792, 2048, 4096):
        rows = _block_rows(H)
        assert rows & (rows - 1) == 0, (H, rows)  # power of two
        assert rows * H <= 256 * 1024 or rows == 8, (H, rows)
        assert flagship_rows % rows == 0, (H, rows)
    assert _block_rows(768) == 256   # measured-fast flagship config
    assert _block_rows(2048) == 128  # the measured VMEM bound


def test_block_rows_env_override(monkeypatch):
    """PLBERT_LN_BLOCK_ROWS adopts an on-chip sweep winner without a
    code edit: the override must flow through both dispatch and the
    kernels, preserve numeric parity at non-default block sizes, and
    reject values that would mis-tile (non-power-of-two)."""
    from pl_bert_tpu.ops.fused_ln import _block_rows

    x, res, gamma, beta = _inputs(seed=3)
    ref = _reference(x, res, gamma, beta)
    for rows in (64, 128):
        monkeypatch.setenv("PLBERT_LN_BLOCK_ROWS", str(rows))
        assert _block_rows(H) == rows
        with pltpu.force_tpu_interpret_mode():
            out = dropout_add_layernorm(x, res, gamma, beta)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
        )

    import pytest

    for bad in ("100", "4"):
        monkeypatch.setenv("PLBERT_LN_BLOCK_ROWS", bad)
        with pytest.raises(ValueError, match="power of two"):
            _block_rows(H)
    monkeypatch.delenv("PLBERT_LN_BLOCK_ROWS")
    assert _block_rows(768) == 256  # default policy restored


def test_ragged_row_count_rejected_loudly():
    """The grid floor-divides the row count: a ragged tail block would
    come back UNINITIALIZED (silent NaNs — empirically confirmed on
    rows 256+ of a [300, 128] input before this guard). The public API
    must refuse instead; callers gate on fused_supported()."""
    import jax.numpy as jnp
    import pytest

    from pl_bert_tpu.ops.fused_ln import dropout_add_layernorm, fused_supported

    x = jnp.zeros((300, 128), jnp.float32)
    g = jnp.ones((128,), jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    with pytest.raises(ValueError, match="rows"):
        dropout_add_layernorm(x, x, g, b)
    # and the dispatch predicate agrees (including the 0-row case a
    # too-small serving batch produces under shard_map slicing)
    assert not fused_supported(300, 128)
    assert not fused_supported(0, 128)
