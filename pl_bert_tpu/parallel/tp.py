"""Tensor-parallel wrappers for the Pallas kernels.

GSPMD cannot partition a ``pallas_call`` (it is an opaque custom call),
so under a mesh with ``model_axis > 1`` the fused kernels are invoked
through ``jax.shard_map``: every model shard runs the SAME kernel on its
local head slice and the partial attention outputs are combined with one
``psum`` over the model axis — the classic Megatron split (column-sharded
Wq/Wk/Wv, row-sharded Wo) that parallel/mesh.py's parameter rules
already lay out. This goes beyond the reference's pure-DP scaling
(reference: train.py:218-221); ``model_axis=1`` bypasses these wrappers
entirely.

Sharding contract (matching mesh._RULES):
- hidden activations: sharded over ``data`` on batch, replicated over
  ``model``;
- wq/wk/wv [E, E]: column-sharded → each shard holds [E, E/m] and
  computes its local heads inside the kernel;
- wo [E, E]: row-sharded → each shard's out-projection is a partial sum;
  the psum completes it. The output bias is added once, after the psum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pl_bert_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# decorrelates the in-kernel dropout streams of different mesh shards:
# the kernels derive per-row PRNG streams from shard-LOCAL program_id, so
# without an explicit offset shard (d, r) and shard (d', r') would
# regenerate identical masks. Each (data, model) shard therefore offsets
# its seed by (r + m * d) * _SEED_STRIDE — model-shard offset so head h
# on shard 0 and head h on shard 1 never share a mask, data-shard offset
# so different batch slices keep dropout diversity.
_SEED_STRIDE = 1 << 20


def model_axis_size(mesh: Mesh | None) -> int:
    return int(mesh.shape[MODEL_AXIS]) if mesh is not None else 1


def _shard_seed_offset(m: int):
    """Per-(data, model)-shard seed offset, unique across the whole mesh."""
    r = jax.lax.axis_index(MODEL_AXIS).astype(jnp.int32)
    d = jax.lax.axis_index(DATA_AXIS).astype(jnp.int32)
    return (r + jnp.int32(m) * d) * jnp.int32(_SEED_STRIDE)


def tp_attention_block(
    mesh: Mesh,
    hidden, wq, bq, wk, bk, wv, bv, wo, bo,
    num_heads: int,
    bias=None, segment_ids=None, out_dtype=jnp.bfloat16,
    dropout_rate: float = 0.0, dropout_seed=None,
    sp: bool = False,
):
    """shard_map-wrapped ops.attention_block.attention_block.

    Same contract as the single-shard kernel with FULL [E, E] weights;
    the per-shard slicing is expressed by the in_specs, so the caller
    passes the same (sharded) parameter arrays GSPMD already placed.

    ``sp`` (sequence parallelism): the cross-shard combine of the
    out-projection partials becomes a ``psum_scatter`` over the sequence
    dim — same wire volume as the psum, but the result lands L/m-sharded
    over ``model`` so the following LN/dropout region holds (and
    saves for backward) only a sequence slice per chip. The global-array
    VALUES are identical to sp=False; only the output sharding differs.
    Requires L % m == 0.
    """
    from pl_bert_tpu.ops.attention_block import attention_block

    m = model_axis_size(mesh)
    B, L, E = hidden.shape
    if bias is None:
        bias = jnp.zeros((B, 1, 1, L), jnp.float32)
    has_seed = dropout_seed is not None
    seed = (
        dropout_seed.reshape(1).astype(jnp.int32)
        if has_seed
        else jnp.zeros((1,), jnp.int32)
    )
    rate = float(dropout_rate) if has_seed else 0.0
    has_seg = segment_ids is not None
    seg = segment_ids if has_seg else jnp.zeros((B, L), jnp.int32)

    if sp and L % m:
        raise ValueError(
            f"sequence parallelism needs seq_len {L} % model_axis {m} == 0"
        )

    def local(x, wq, bq, wk, bk, wv, bv, wo, bias, seg, seed):
        seed = seed + _shard_seed_offset(m)
        part = attention_block(
            x, wq, bq, wk, bk, wv, bv, wo,
            jnp.zeros((E,), jnp.float32),  # bo added once, after the psum
            num_heads // m,
            bias=bias, segment_ids=seg if has_seg else None,
            out_dtype=jnp.float32,  # fp32 partials → exact cross-shard sum
            dropout_rate=rate,
            dropout_seed=seed if has_seed else None,
        )
        if sp:
            # reduce-scatter: shard r keeps the summed rows
            # [r·L/m, (r+1)·L/m) — the out_spec's L tiling
            return jax.lax.psum_scatter(
                part, MODEL_AXIS, scatter_dimension=1, tiled=True
            )
        return jax.lax.psum(part, MODEL_AXIS)

    batch3 = P(DATA_AXIS, None, None)
    out = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            batch3,
            P(None, MODEL_AXIS), P(MODEL_AXIS),  # wq, bq
            P(None, MODEL_AXIS), P(MODEL_AXIS),  # wk, bk
            P(None, MODEL_AXIS), P(MODEL_AXIS),  # wv, bv
            P(MODEL_AXIS, None),                 # wo
            P(DATA_AXIS, None, None, None),      # bias
            P(DATA_AXIS, None),                  # segment ids
            P(),                                 # seed
        ),
        out_specs=P(DATA_AXIS, MODEL_AXIS, None) if sp else batch3,
        check_vma=False,  # pallas_call outputs carry no vma info
    )(hidden, wq, bq, wk, bk, wv, bv, wo, bias, seg, seed)
    return (out + bo[None, None, :]).astype(out_dtype)


def tp_flash_attention(
    mesh: Mesh,
    q, k, v, bias=None, segment_ids=None, out_dtype=jnp.bfloat16,
    dropout_rate: float = 0.0, dropout_seed=None,
):
    """shard_map-wrapped ops.flash_attention for [B, L, H, D] inputs with
    the head axis sharded over ``model`` (no collective needed: attention
    is independent per head)."""
    from pl_bert_tpu.ops.flash_attention import flash_attention

    m = model_axis_size(mesh)
    B, L, H, D = q.shape
    if bias is None:
        bias = jnp.zeros((B, 1, 1, L), jnp.float32)
    has_seed = dropout_seed is not None
    seed = (
        dropout_seed.reshape(1).astype(jnp.int32)
        if has_seed
        else jnp.zeros((1,), jnp.int32)
    )
    rate = float(dropout_rate) if has_seed else 0.0
    has_seg = segment_ids is not None
    seg = segment_ids if has_seg else jnp.zeros((B, L), jnp.int32)

    def local(q, k, v, bias, seg, seed):
        seed = seed + _shard_seed_offset(m)
        return flash_attention(
            q, k, v, bias, seg if has_seg else None, out_dtype=out_dtype,
            dropout_rate=rate, dropout_seed=seed if has_seed else None,
        )

    qkv = P(DATA_AXIS, None, MODEL_AXIS, None)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            qkv, qkv, qkv,
            P(DATA_AXIS, None, None, None),
            P(DATA_AXIS, None),
            P(),
        ),
        out_specs=qkv,
        check_vma=False,  # pallas_call outputs carry no vma info
    )(q, k, v, bias, seg, seed)


def tp_dropout_add_layernorm(
    mesh: Mesh, x, residual, scale, bias, seed, rate: float, eps: float,
    sp: bool = False,
):
    """shard_map-wrapped ops.fused_ln.dropout_add_layernorm: purely
    row-local math, so each shard runs the kernel on its data slice and
    model shards replicate it. The seed is offset by the DATA-axis index
    only: data shards get decorrelated dropout masks for their distinct
    batch slices, while model shards (which hold the SAME batch slice)
    keep the same seed and stay bitwise identical, as the out_spec's
    replication over ``model`` requires.

    ``sp`` (sequence parallelism): inputs and output are additionally
    sharded over ``model`` on the sequence dim — each chip normalizes
    only its L/m slice (row-local math makes this exact, no collective),
    and the seed folds in the model index too since model shards now
    hold DIFFERENT rows."""
    from pl_bert_tpu.ops.fused_ln import dropout_add_layernorm

    has_seed = seed is not None
    seed_arr = (
        seed.reshape(1).astype(jnp.int32) if has_seed
        else jnp.zeros((1,), jnp.int32)
    )
    m = model_axis_size(mesh)

    def local(x, residual, scale, bias, seed_arr):
        if sp:
            seed_arr = seed_arr + _shard_seed_offset(m)
        else:
            d = jax.lax.axis_index(DATA_AXIS).astype(jnp.int32)
            seed_arr = seed_arr + d * jnp.int32(_SEED_STRIDE)
        return dropout_add_layernorm(
            x, residual, scale, bias,
            seed_arr if has_seed else None,
            rate if has_seed else 0.0, eps,
        )

    rows = P(DATA_AXIS, MODEL_AXIS, None) if sp else P(DATA_AXIS, None, None)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(rows, rows, P(), P(), P()),
        out_specs=rows,
        check_vma=False,  # pallas_call outputs carry no vma info
    )(x, residual, scale, bias, seed_arr)
