"""Interpret-mode coverage for the experimental transpose-free kernel
(ops/flash_attention_v2.py — see its docstring for TPU status)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from pl_bert_tpu.ops.attention import xla_attention
from pl_bert_tpu.ops.flash_attention_v2 import flash_attention_v2


def test_v2_forward_and_grad_match_xla():
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((2, 128, 4, 64)), jnp.float32)
        for _ in range(3)
    )

    def lf(q, k, v):
        o = flash_attention_v2(q, k, v, out_dtype=jnp.float32)
        return jnp.sum(o * jnp.cos(o))

    def lr(q, k, v):
        o = xla_attention(q, k, v, dtype=jnp.float32)
        return jnp.sum(o * jnp.cos(o))

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_v2(q, k, v, out_dtype=jnp.float32)
        gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(xla_attention(q, k, v, dtype=jnp.float32)),
        atol=2e-5, rtol=1e-4,
    )
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3)
