"""In-kernel attention-prob dropout: statistics, determinism, gradient."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from pl_bert_tpu.ops.flash_attention import flash_attention

B, L, H, D = 1, 128, 2, 64


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
        for _ in range(3)
    )


def test_dropout_mean_preserving_and_deterministic():
    q, k, v = _inputs()
    seed = jnp.asarray([7], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        base = flash_attention(q, k, v, out_dtype=jnp.float32)
        d1 = flash_attention(
            q, k, v, out_dtype=jnp.float32, dropout_rate=0.1, dropout_seed=seed
        )
        d2 = flash_attention(
            q, k, v, out_dtype=jnp.float32, dropout_rate=0.1, dropout_seed=seed
        )
    # same seed → identical outputs (different-seed divergence can only be
    # checked on real TPU: interpret mode stubs prng_seed with a fixed
    # stream, so seeds are indistinguishable there)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    # Interpret mode stubs the TPU PRNG (all-zero bits → everything
    # dropped), so only structure is checkable here: outputs stay finite
    # and differ from the no-dropout baseline. Statistical behavior
    # (10% drop rate, inverted-dropout scaling, seed sensitivity) is
    # verified on real TPU hardware — see CLAUDE.md perf ledger notes.
    assert np.isfinite(np.asarray(d1)).all()
    assert not np.array_equal(np.asarray(d1), np.asarray(base))


def test_dropout_gradient_matches_finite_difference():
    q, k, v = _inputs(seed=3)
    seed = jnp.asarray([11], jnp.int32)

    def loss(qq):
        o = flash_attention(
            qq, k, v, out_dtype=jnp.float32, dropout_rate=0.1, dropout_seed=seed
        )
        return jnp.sum(o * o)

    with pltpu.force_tpu_interpret_mode():
        g = np.asarray(jax.grad(loss)(q))
        # probe a few coordinates with central differences
        eps = 1e-3
        rng = np.random.default_rng(0)
        for _ in range(4):
            idx = tuple(rng.integers(0, s) for s in q.shape)
            dq = np.zeros(q.shape, np.float32)
            dq[idx] = eps
            f_plus = float(loss(q + jnp.asarray(dq)))
            f_minus = float(loss(q - jnp.asarray(dq)))
            fd = (f_plus - f_minus) / (2 * eps)
            assert abs(fd - g[idx]) < 2e-2 * max(1.0, abs(fd)), (idx, fd, g[idx])
