"""Fused attention dispatch.

``fused_attention(q, k, v, bias)`` computes softmax(qk^T/sqrt(d)+bias)v
for [B, L, H, D] tensors. On TPU it runs the Pallas flash-style kernel
(pl_bert_tpu.ops.flash_attention); elsewhere (CPU tests) it falls back
to the einsum path, which XLA fuses well for seq-512.

Dropout: the fused kernel applies HF-style attention-prob dropout
INSIDE the kernel (mask regenerated from the seed in the backward pass);
the XLA path applies the same prob dropout via nn.Dropout in the model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.cache
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.cache
def _kernel_available() -> bool:
    try:
        from pl_bert_tpu.ops import flash_attention  # noqa: F401

        return True
    except ImportError:
        return False


def pallas_supported(seq_len: int, head_dim: int) -> bool:
    """The fused kernel handles tile-aligned shapes on TPU."""
    return (
        _on_tpu()
        and _kernel_available()
        and seq_len % 128 == 0
        and head_dim % 64 == 0
    )


def fused_block_supported(
    seq_len: int, num_heads: int, head_dim: int, global_width: int = 0
) -> bool:
    """The fully-fused attention-block kernel (QKV + attention + output
    projection, ops/attention_block.py) handles these shapes on TPU.
    ``global_width``: full E when ``num_heads`` is a tensor-parallel
    shard's local count (the kernel's VMEM budget scales with E·P)."""
    if not (_on_tpu() and _kernel_available()):
        return False
    from pl_bert_tpu.ops.attention_block import block_supported

    return block_supported(seq_len, num_heads, head_dim, global_width)


def xla_attention(q, k, v, bias=None, segment_ids=None, dtype=jnp.bfloat16):
    """Reference einsum attention (fp32 softmax accumulation)."""
    head_dim = q.shape[-1]
    scores = jnp.einsum("blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
    if bias is not None:
        scores = scores + bias
    if segment_ids is not None:
        neq = segment_ids[:, None, :, None] != segment_ids[:, None, None, :]
        scores = jnp.where(neq, -0.7 * jnp.finfo(jnp.float32).max, scores)
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    return jnp.einsum("bhlm,bmhd->blhd", probs, v)


def fused_attention(
    q, k, v, bias=None, segment_ids=None, dtype=jnp.bfloat16,
    dropout_rate: float = 0.0, dropout_seed=None,
):
    if pallas_supported(q.shape[1], q.shape[-1]):
        from pl_bert_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v, bias, segment_ids, out_dtype=dtype,
            dropout_rate=dropout_rate, dropout_seed=dropout_seed,
        )
    return xla_attention(q, k, v, bias, segment_ids, dtype=dtype)
