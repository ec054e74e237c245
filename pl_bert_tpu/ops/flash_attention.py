"""Pallas fused (flash-style) attention for TPU.

Replaces the reference's HF attention path — which materializes
[B, H, L, L] score/prob tensors in HBM (the dominant memory traffic for
PL-BERT's 512-token batches) — with a fused kernel: scores and probs
live only in VMEM, softmax accumulates in fp32, and a custom VJP
recomputes probs in the backward kernel instead of saving them.

Shape strategy for seq 512 / head_dim 64: one (batch, head) pair per
grid program. K/V for a head are 512×64 bf16 = 64 KB each and a fp32
score tile is 1 MB — everything fits VMEM comfortably, so no K/V
streaming loop is needed; the MXU sees dense [512,64]×[64,512] and
[512,512]×[512,64] matmuls.

Padding is handled with an additive bias row [B, L] (0 or -inf-ish),
the same contract as the XLA path (models/albert.py
attention_bias_from_mask).

Attention-prob dropout (HF Albert semantics) runs INSIDE the kernel via
the on-chip PRNG: each (batch, head) program seeds with
(step_seed + program_id), so the backward kernel regenerates the exact
same mask instead of storing an [B, H, L, L] mask tensor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _dropout(p, seed_ref, *, rate: float):
    """Multiplicative dropout mask on attention probs, regenerated
    identically in fwd and bwd from (seed, program_id). KEEP IN SYNC
    with attention_block._dropout (same threshold semantics)."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.prng_random_bits(p.shape)
    keep = pltpu.bitcast(bits, jnp.uint32) > jnp.uint32(rate * (2**32))
    return jnp.where(keep, p / (1.0 - rate), 0.0)


def _fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, seg_ref, seed_ref, o_ref, *, scale: float,
    use_segments: bool, dropout_rate: float,
):
    # keep matmul operands in their storage dtype (bf16) — the MXU
    # consumes bf16 natively with fp32 accumulation; only softmax math
    # runs in fp32 on the VPU
    q = q_ref[0]  # [L, D]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [L, L] fp32
    s = s + bias_ref[0, 0][None, :]
    if use_segments:  # static: compiled out when no packing is in use
        seg = seg_ref[0, 0]  # [L]; block-diagonal mask across segments
        s = jnp.where(seg[:, None] != seg[None, :], _NEG, s)
    s_max = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - s_max)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        p = _dropout(p, seed_ref, rate=dropout_rate)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, seg_ref, seed_ref, do_ref,
    dq_ref, dk_ref, dv_ref,
    *, scale: float, use_segments: bool, dropout_rate: float,
):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + bias_ref[0, 0][None, :]
    if use_segments:
        seg = seg_ref[0, 0]
        s = jnp.where(seg[:, None] != seg[None, :], _NEG, s)
    s_max = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - s_max)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # [L, L] fp32, pre-dropout
    if dropout_rate > 0.0:
        # same seed → exactly the forward pass's mask, regenerated
        pd = _dropout(p, seed_ref, rate=dropout_rate)
    else:
        pd = p
    pd_lp = pd.astype(v.dtype)  # bf16 operand for the MXU

    dv = jax.lax.dot_general(
        pd_lp, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # pdᵀ do → [L, D]
    dpd = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # do vᵀ → [L, L] fp32
    # softmax+dropout backward: ds = pd∘dpd − p·Σ(dpd∘pd)
    # (the elementwise product flows through the dropped probs; the
    # softmax normalization term through the pre-dropout probs)
    delta = jnp.sum(dpd * pd, axis=-1, keepdims=True)
    ds = ((pd * dpd - p * delta) * scale).astype(q.dtype)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _specs(L: int, D: int, heads: int):
    qkv = pl.BlockSpec((1, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((1, 1, L), lambda i: (i // heads, 0, 0), memory_space=pltpu.VMEM)
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return qkv, bias, seed


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _flash(q, k, v, bias_row, seg_row, seed, out_dtype, use_segments, dropout_rate):
    return _flash_fwd(
        q, k, v, bias_row, seg_row, seed, out_dtype, use_segments, dropout_rate
    )[0]


def _flash_call(kernel, outs, q, k, v, bias_row, seg_row, seed, *extra):
    BH, L, D = q.shape
    heads = BH // bias_row.shape[0]
    qkv_spec, bias_spec, seed_spec = _specs(L, D, heads)
    n_extra = len(extra)
    return pl.pallas_call(
        kernel,
        grid=(BH,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, bias_spec, seed_spec]
        + [qkv_spec] * n_extra,
        out_specs=[qkv_spec] * len(outs) if len(outs) > 1 else qkv_spec,
        out_shape=outs if len(outs) > 1 else outs[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(4 + 6 * n_extra) * L * L * D,
            bytes_accessed=(3 + n_extra) * L * D * 2 + L * 8,
            transcendentals=L * L,
        ),
    )(q, k, v, bias_row, seg_row, seed, *extra)


def _flash_fwd(
    q, k, v, bias_row, seg_row, seed, out_dtype, use_segments, dropout_rate
):
    BH, L, D = q.shape
    scale = 1.0 / (D ** 0.5)
    out = _flash_call(
        functools.partial(
            _fwd_kernel, scale=scale, use_segments=use_segments,
            dropout_rate=dropout_rate,
        ),
        [jax.ShapeDtypeStruct((BH, L, D), out_dtype)],
        q, k, v, bias_row, seg_row, seed,
    )
    return out, (q, k, v, bias_row, seg_row, seed)


def _flash_bwd(out_dtype, use_segments, dropout_rate, residuals, g):
    q, k, v, bias_row, seg_row, seed = residuals
    BH, L, D = q.shape
    scale = 1.0 / (D ** 0.5)
    dq, dk, dv = _flash_call(
        functools.partial(
            _bwd_kernel, scale=scale, use_segments=use_segments,
            dropout_rate=dropout_rate,
        ),
        [
            jax.ShapeDtypeStruct((BH, L, D), q.dtype),
            jax.ShapeDtypeStruct((BH, L, D), k.dtype),
            jax.ShapeDtypeStruct((BH, L, D), v.dtype),
        ],
        q, k, v, bias_row, seg_row, seed, g,
    )
    return dq, dk, dv, None, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q, k, v, bias=None, segment_ids=None, out_dtype=jnp.bfloat16,
    dropout_rate: float = 0.0, dropout_seed=None,
):
    """softmax(qkᵀ/√d + bias)·v for [B, L, H, D] inputs.

    ``bias`` is the additive [B, 1, 1, L] mask bias (or None).
    ``segment_ids`` ([B, L] int32, or None) makes attention block-diagonal
    across packed segments. ``dropout_rate``/``dropout_seed`` enable
    HF-style attention-prob dropout inside the kernel (seed: int32
    scalar array, one per step). Returns [B, L, H, D] in ``out_dtype``.
    """
    B, L, H, D = q.shape
    if bias is None:
        bias_row = jnp.zeros((B, 1, L), jnp.float32)
    else:
        bias_row = jnp.maximum(bias.reshape(B, 1, L).astype(jnp.float32), _NEG)
    if segment_ids is None:
        seg_row = jnp.zeros((B, 1, L), jnp.float32)
    else:
        # kernel compares as float rows (int loads tile the same; float
        # keeps one bias-style BlockSpec for both operands)
        seg_row = segment_ids.reshape(B, 1, L).astype(jnp.float32)

    if dropout_seed is None:
        dropout_seed = jnp.zeros((1,), jnp.int32)
        dropout_rate = 0.0
    else:
        dropout_seed = dropout_seed.reshape(1).astype(jnp.int32)

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, L, D)

    out = _flash(
        fold(q), fold(k), fold(v), bias_row, seg_row, dropout_seed,
        out_dtype, segment_ids is not None, float(dropout_rate),
    )
    return out.reshape(B, H, L, D).transpose(0, 2, 1, 3)
