"""Vectorized masked cross-entropy.

The reference computes the MLM loss with a Python loop over samples,
slicing ragged masked-index lists and calling CrossEntropyLoss per row —
one device sync per sample (reference: train.py:107-131, the documented
perf sink). This is the dense equivalent with identical semantics:

    per-sample mean CE over that sample's masked positions,
    then mean over samples that have ≥1 masked position;
    0.0 if no sample in the batch has masks.

Everything is one fused XLA computation over [B, L] planes; the
"samples with ≥1 mask" denominator is reproduced exactly (NOT a
token-count mean — SURVEY §7 hard part 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_phoneme_loss(
    logits: jax.Array,  # f32 [B, L, V]
    labels: jax.Array,  # i32 [B, L]
    mask_positions: jax.Array,  # bool [B, L]
    lengths: jax.Array | None = None,  # i32 [B] — crops padding
) -> jax.Array:
    """Reference-equivalent masked CE (scalar f32)."""
    valid = mask_positions
    if lengths is not None:
        in_range = jnp.arange(labels.shape[1])[None, :] < lengths[:, None]
        valid = valid & in_range

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]

    w = valid.astype(jnp.float32)
    per_sample_count = w.sum(axis=1)
    has_mask = per_sample_count > 0
    per_sample_mean = (token_nll * w).sum(axis=1) / jnp.maximum(per_sample_count, 1.0)

    n_with_mask = has_mask.astype(jnp.float32).sum()
    total = jnp.where(has_mask, per_sample_mean, 0.0).sum()
    return jnp.where(n_with_mask > 0, total / jnp.maximum(n_with_mask, 1.0), 0.0)


def masked_accuracy(
    logits: jax.Array,
    labels: jax.Array,
    mask_positions: jax.Array,
    lengths: jax.Array | None = None,
) -> jax.Array:
    """Fraction of masked positions predicted correctly (eval metric)."""
    valid = mask_positions
    if lengths is not None:
        in_range = jnp.arange(labels.shape[1])[None, :] < lengths[:, None]
        valid = valid & in_range
    pred = jnp.argmax(logits, axis=-1)
    hit = (pred == labels) & valid
    denom = jnp.maximum(valid.sum(), 1)
    return hit.sum().astype(jnp.float32) / denom.astype(jnp.float32)
