"""Fused dropout + residual-add + LayerNorm Pallas kernel.

Each ALBERT layer applies dropout→add-residual→LayerNorm twice
(after the attention projection and after ffn_output; reference HF
AlbertLayer). Under XLA these are separate elementwise passes over
[B·L, hidden] with PRNG mask generation in between — ~11% of step time.
This kernel does the whole chain in one VMEM pass; the backward kernel
regenerates the dropout mask from the same seed (no mask tensor stored)
and recomputes the LN statistics, emitting per-block partial sums for
dgamma/dbeta that XLA reduces.

Numerics: accumulation and LN statistics in fp32; inputs/outputs bf16
(or fp32 on CPU tests).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _block_rows(H: int) -> int:
    """Rows per grid step, bounded by scoped VMEM: the backward kernel
    keeps ~7 fp32 row-block intermediates live (x, mask, y, xhat, g,
    g·gamma, dy), and 256 rows measured 16.98M > the 16M scoped-vmem
    limit at H=2048 on v5e — halve the rows as H grows past 1024
    (256 rows at H≤1024 is the measured-fast configuration). Powers of
    two only: realistic row counts (B·L/shards — powers of two times
    small factors) are divisible by 128/64 but NOT by the 168/200-style
    blocks a proportional rule would give at non-power-of-two widths,
    which would silently disable the kernel exactly where it was meant
    to work.

    PLBERT_LN_BLOCK_ROWS overrides the policy (power of two ≥ 8) so a
    winner from the on-chip sweep (tools/bench_fused_ln.py) can be
    adopted without a code edit; dispatch (fused_supported) and both
    kernels read the same value, so divisibility gating stays
    consistent. Note the dropout stream is seeded per grid block
    (seed + program_id), so changing the block size changes which
    mask a given row draws — a different but equally valid stream."""
    override = os.environ.get("PLBERT_LN_BLOCK_ROWS")
    if override:
        rows = int(override)
        if rows < 8 or rows & (rows - 1):
            raise ValueError(
                f"PLBERT_LN_BLOCK_ROWS must be a power of two >= 8, got {override!r}"
            )
        return rows
    rows = 256
    while rows > 8 and rows * H > 256 * 1024:
        rows //= 2
    return rows


def _mask(shape, seed_ref, *, rate: float):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits > jnp.uint32(rate * (2**32))


def _ln_stats(y, eps):
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return (y - mean) * rstd, rstd


def _fwd_kernel(
    x_ref, res_ref, gamma_ref, beta_ref, seed_ref, o_ref,
    *, rate: float, eps: float,
):
    x = x_ref[...].astype(jnp.float32)
    if rate > 0.0:
        keep = _mask(x.shape, seed_ref, rate=rate)
        x = jnp.where(keep, x / (1.0 - rate), 0.0)
    y = x + res_ref[...].astype(jnp.float32)
    xhat, _ = _ln_stats(y, eps)
    out = xhat * gamma_ref[...].astype(jnp.float32) + beta_ref[...].astype(
        jnp.float32
    )
    o_ref[...] = out.astype(o_ref.dtype)


def _bwd_kernel(
    x_ref, res_ref, gamma_ref, seed_ref, g_ref,
    dx_ref, dres_ref, dgamma_ref, dbeta_ref,
    *, rate: float, eps: float,
):
    # (no beta operand: dbeta = Σg needs only the cotangent)
    x = x_ref[...].astype(jnp.float32)
    if rate > 0.0:
        keep = _mask(x.shape, seed_ref, rate=rate)  # same seed → same mask
        x = jnp.where(keep, x / (1.0 - rate), 0.0)
    y = x + res_ref[...].astype(jnp.float32)
    xhat, rstd = _ln_stats(y, eps)

    g = g_ref[...].astype(jnp.float32)
    gamma = gamma_ref[...].astype(jnp.float32)
    # per-block partial reductions for the affine params ([1, 1, H] blocks)
    dgamma_ref[...] = jnp.sum(g * xhat, axis=0, keepdims=True)[None]
    dbeta_ref[...] = jnp.sum(g, axis=0, keepdims=True)[None]

    gg = g * gamma
    h = x.shape[-1]
    m1 = jnp.sum(gg, axis=-1, keepdims=True) / h
    m2 = jnp.sum(gg * xhat, axis=-1, keepdims=True) / h
    dy = (gg - m1 - xhat * m2) * rstd
    dres_ref[...] = dy.astype(dres_ref.dtype)
    if rate > 0.0:
        dy = jnp.where(keep, dy / (1.0 - rate), 0.0)
    dx_ref[...] = dy.astype(dx_ref.dtype)


def _specs(H: int):
    rows = _block_rows(H)
    row = pl.BlockSpec((rows, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    partial = pl.BlockSpec((1, 1, H), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return row, vec, seed, partial


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused(x, res, gamma, beta, seed, rate, eps):
    return _fused_fwd(x, res, gamma, beta, seed, rate, eps)[0]


def _fused_fwd(x, res, gamma, beta, seed, rate, eps):
    N, H = x.shape
    row, vec, seed_spec, _ = _specs(H)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, eps=eps),
        grid=(N // _block_rows(H),),
        in_specs=[row, row, vec, vec, seed_spec],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((N, H), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
    )(x, res, gamma.reshape(1, H), beta.reshape(1, H), seed)
    return out, (x, res, gamma, beta, seed)


def _fused_bwd(rate, eps, residuals, g):
    x, res, gamma, beta, seed = residuals
    N, H = x.shape
    n_blocks = N // _block_rows(H)
    row, vec, seed_spec, partial = _specs(H)
    dx, dres, dgamma_p, dbeta_p = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, eps=eps),
        grid=(n_blocks,),
        in_specs=[row, row, vec, seed_spec, row],
        out_specs=[row, row, partial, partial],
        out_shape=[
            jax.ShapeDtypeStruct((N, H), x.dtype),
            jax.ShapeDtypeStruct((N, H), res.dtype),
            jax.ShapeDtypeStruct((n_blocks, 1, H), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
    )(x, res, gamma.reshape(1, H), seed, g)
    dgamma = dgamma_p.sum(axis=(0, 1)).astype(gamma.dtype)
    dbeta = dbeta_p.sum(axis=(0, 1)).astype(beta.dtype)
    return dx, dres, dgamma, dbeta, None


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_supported(n_rows: int, hidden: int) -> bool:
    from pl_bert_tpu.ops.attention import _kernel_available, _on_tpu

    return (
        _on_tpu()
        and _kernel_available()
        and n_rows > 0  # 0 rows = a batch this shard layout can't slice
        and n_rows % _block_rows(hidden) == 0
        and hidden % 128 == 0
    )


def dropout_add_layernorm(
    x, residual, gamma, beta, seed=None, rate: float = 0.0, eps: float = 1e-12
):
    """LayerNorm(residual + dropout(x)) over the last axis.

    x/residual: [..., H] (flattened internally); gamma/beta: [H];
    seed: int32 scalar array (required when rate > 0).
    """
    shape = x.shape
    H = shape[-1]
    x2 = x.reshape(-1, H)
    rows = _block_rows(H)
    if x2.shape[0] % rows or H % 128:
        # the grid floor-divides the row count: a ragged tail block
        # would come back UNINITIALIZED (silent NaNs), so refuse loudly
        # — callers gate on fused_supported() for the fallback path
        raise ValueError(
            f"dropout_add_layernorm needs rows % {rows} == 0 and "
            f"H % 128 == 0, got {x2.shape} (use fused_supported())"
        )
    r2 = residual.reshape(-1, H)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
        rate = 0.0
    else:
        seed = seed.reshape(1).astype(jnp.int32)
    out = _fused(x2, r2, gamma, beta, seed, float(rate), float(eps))
    return out.reshape(shape)
