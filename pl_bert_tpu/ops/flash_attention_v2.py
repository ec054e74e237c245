"""EXPERIMENTAL (not wired into the model): transpose-free flash attention.

The v1 kernel (flash_attention.py, the production path) uses a
(batch·head,) grid, which forces [B, L, H, D] → [B·H, L, D] transposes
around every call — the profiler attributes ~13% of step time to those
copies. This variant blocks as [1, L, H, D] (legal: the block's last two
dims equal the array's) with heads as an unrolled in-kernel loop, so no
layout changes are needed.

Status after TPU validation (round 1): numerically exact (interpret
tests below pass, standalone fwd/bwd compile and run on v5e), but inside
the full training module XLA stack-allocates the kernel's whole
[96, 512, 768] output in VMEM and OOMs — the all-heads-per-program
footprint (4 input windows + 12 live head outputs + fp32 score temps,
double-buffered) exceeds the 16 MB budget at batch 96. Head-blocked
grids can't help: Mosaic requires the last-two block dims to divide
(8, 128) or equal the array dims, so a [1, L, h<12, 64] block is
illegal. Left as the starting point for a round-2 attempt (e.g.
emit_pipeline with manual buffering, or head-major weight layouts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _head_attention(qh, kh, vh, bias, seg, seed_ref, head, heads, *, scale,
                    rate, use_segments):
    s = jax.lax.dot_general(
        qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + bias[None, :]
    if use_segments:
        s = jnp.where(seg[:, None] != seg[None, :], _NEG, s)
    s_max = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - s_max)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    if rate > 0.0:
        # seed per (batch, head) with the v1 (batch·head)-grid scheme so
        # the v1 backward kernel regenerates the identical mask
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * heads + head)
        bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32)
        keep = bits > jnp.uint32(rate * (2**32))
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
    return p


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, seg_ref, seed_ref, o_ref,
                *, scale, rate, use_segments, heads):
    bias = bias_ref[0, 0]
    seg = seg_ref[0, 0]
    outs = []
    for h in range(heads):
        # ref-level per-head loads (static index) — no value shape casts
        qh = q_ref[0, :, h, :]
        kh = k_ref[0, :, h, :]
        vh = v_ref[0, :, h, :]
        p = _head_attention(
            qh, kh, vh, bias, seg, seed_ref, h, heads,
            scale=scale, rate=rate, use_segments=use_segments,
        )
        o = jnp.dot(p.astype(vh.dtype), vh, preferred_element_type=jnp.float32)
        outs.append(o.astype(o_ref.dtype))
    # one whole-row store: [L, H·D] lane-concatenation of the head outputs
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, seg_ref, seed_ref, do_ref,
                dq_ref, dk_ref, dv_ref,
                *, scale, rate, use_segments, heads):
    bias = bias_ref[0, 0]
    seg = seg_ref[0, 0]
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))  # same stream as fwd
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        qh = q_ref[0, :, h, :]
        kh = k_ref[0, :, h, :]
        vh = v_ref[0, :, h, :]
        doh = do_ref[0, :, h, :]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = s + bias[None, :]
        if use_segments:
            s = jnp.where(seg[:, None] != seg[None, :], _NEG, s)
        s_max = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - s_max)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if rate > 0.0:
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32)
            keep = bits > jnp.uint32(rate * (2**32))
            pd = jnp.where(keep, p / (1.0 - rate), 0.0)
        else:
            pd = p
        pd_lp = pd.astype(vh.dtype)
        dv = jax.lax.dot_general(
            pd_lp, doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dpd = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(dpd * pd, axis=-1, keepdims=True)
        ds = ((pd * dpd - p * delta) * scale).astype(qh.dtype)
        dq = jnp.dot(ds, kh, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dqs.append(dq.astype(dq_ref.dtype))
        dks.append(dk.astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
    dq_ref[0] = jnp.concatenate(dqs, axis=-1)
    dk_ref[0] = jnp.concatenate(dks, axis=-1)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1)


def _specs(L, H, D):
    qkv = pl.BlockSpec((1, L, H, D), lambda b: (b, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    flat = pl.BlockSpec((1, L, H * D), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return qkv, flat, row, seed


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _flash2(q, k, v, bias_row, seg_row, seed, out_dtype, use_segments, rate):
    return _flash2_fwd(
        q, k, v, bias_row, seg_row, seed, out_dtype, use_segments, rate
    )[0]


def _flash2_fwd(q, k, v, bias_row, seg_row, seed, out_dtype, use_segments, rate):
    B, L, H, D = q.shape
    qkv, flat, row, seed_spec = _specs(L, H, D)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=1.0 / D**0.5, rate=rate,
            use_segments=use_segments, heads=H,
        ),
        grid=(B,),
        in_specs=[qkv, qkv, qkv, row, row, seed_spec],
        out_specs=flat,
        out_shape=jax.ShapeDtypeStruct((B, L, H * D), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * H * L * L * D * B,
            bytes_accessed=4 * B * L * H * D * 2,
            transcendentals=B * H * L * L,
        ),
    )(q, k, v, bias_row, seg_row, seed)
    return out, (q, k, v, bias_row, seg_row, seed)


def _flash2_bwd(out_dtype, use_segments, rate, residuals, g):
    """Backward via the v1 (batch·head-grid) kernel: the all-heads bwd
    blows VMEM (4 inputs + 3 outputs + per-head score temps live at
    once), so gradients pay the fold/unfold transposes while the forward
    stays transpose-free.

    PRNG note: the v1 bwd regenerates dropout masks seeded per (b·H+h)
    program, so when dropout is active the forward must use the same
    per-(b,h) seeding — _head_attention reseeds per head to match."""
    from pl_bert_tpu.ops.flash_attention import _bwd_kernel as _v1_bwd
    from pl_bert_tpu.ops.flash_attention import _flash_call as _v1_call

    q, k, v, bias_row, seg_row, seed = residuals
    B, L, H, D = q.shape

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, L, D)

    dq, dk, dv = _v1_call(
        functools.partial(
            _v1_bwd, scale=1.0 / D**0.5, use_segments=use_segments,
            dropout_rate=rate,
        ),
        [
            jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, L, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, L, D), v.dtype),
        ],
        fold(q), fold(k), fold(v), bias_row, seg_row, seed,
        fold(g.reshape(q.shape)),
    )

    def unfold(x):
        return x.reshape(B, H, L, D).transpose(0, 2, 1, 3)

    return unfold(dq), unfold(dk), unfold(dv), None, None, None


_flash2.defvjp(_flash2_fwd, _flash2_bwd)


def flash_attention_v2(
    q, k, v, bias=None, segment_ids=None, out_dtype=jnp.bfloat16,
    dropout_rate: float = 0.0, dropout_seed=None,
):
    """Transpose-free variant of ops.flash_attention.flash_attention —
    same contract, [B, L, H, D] in and out with no layout changes."""
    B, L, H, D = q.shape
    if bias is None:
        bias_row = jnp.zeros((B, 1, L), jnp.float32)
    else:
        bias_row = jnp.maximum(bias.reshape(B, 1, L).astype(jnp.float32), _NEG)
    if segment_ids is None:
        seg_row = jnp.zeros((B, 1, L), jnp.float32)
    else:
        seg_row = segment_ids.reshape(B, 1, L).astype(jnp.float32)
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1,), jnp.int32)
        dropout_rate = 0.0
    else:
        dropout_seed = dropout_seed.reshape(1).astype(jnp.int32)
    out = _flash2(
        q, k, v, bias_row, seg_row, dropout_seed, out_dtype,
        segment_ids is not None, float(dropout_rate),
    )
    return out.reshape(B, L, H, D)  # free reshape (row-major match)
