"""Flash attention kernel correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pl_bert_tpu.models.albert import attention_bias_from_mask
from pl_bert_tpu.ops.attention import xla_attention
from pl_bert_tpu.ops.flash_attention import flash_attention

B, L, H, D = 2, 128, 4, 64


def _inputs(seed=0, masked=False):
    rng = np.random.default_rng(seed)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
        for _ in range(3)
    )
    bias = None
    if masked:
        mask = np.ones((B, L), np.int32)
        mask[0, 100:] = 0
        bias = attention_bias_from_mask(jnp.asarray(mask))
    return q, k, v, bias


@pytest.mark.parametrize("masked", [False, True])
def test_forward_matches_xla(masked):
    q, k, v, bias = _inputs(masked=masked)
    ref = xla_attention(q, k, v, bias, dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, bias, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_backward_matches_xla():
    q, k, v, bias = _inputs(seed=1, masked=True)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, bias, out_dtype=jnp.float32)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v):
        o = xla_attention(q, k, v, bias, dtype=jnp.float32)
        return jnp.sum(o * jnp.cos(o))

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-5, rtol=1e-3, err_msg=name
        )


def test_fully_masked_rows_finite():
    """A zero-length (all-pad) sample must not produce NaNs."""
    q, k, v, _ = _inputs(seed=2)
    mask = np.zeros((B, L), np.int32)
    mask[1, :] = 1
    bias = attention_bias_from_mask(jnp.asarray(mask))
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, bias, out_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out)).all()
