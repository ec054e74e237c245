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

import functools

import jax
import jax.numpy as jnp
import numpy as np


def valid_positions(
    mask_positions: jax.Array, lengths: jax.Array | None, L: int
) -> jax.Array:
    """Masked positions restricted to each sample's real length — THE
    validity rule every loss/metric here shares, and the one
    train_step._samples_with_masks must stay bitwise-identical to (the
    grad-accum weighting is exact only while the two agree)."""
    if lengths is None:
        return mask_positions
    in_range = jnp.arange(L)[None, :] < lengths[:, None]
    return mask_positions & in_range


def masked_phoneme_loss(
    logits: jax.Array,  # f32 [B, L, V]
    labels: jax.Array,  # i32 [B, L]
    mask_positions: jax.Array,  # bool [B, L]
    lengths: jax.Array | None = None,  # i32 [B] — crops padding
) -> jax.Array:
    """Reference-equivalent masked CE (scalar f32)."""
    valid = valid_positions(mask_positions, lengths, labels.shape[1])

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]

    w = valid.astype(jnp.float32)
    per_sample_count = w.sum(axis=1)
    has_mask = per_sample_count > 0
    per_sample_mean = (token_nll * w).sum(axis=1) / jnp.maximum(per_sample_count, 1.0)

    n_with_mask = has_mask.astype(jnp.float32).sum()
    total = jnp.where(has_mask, per_sample_mean, 0.0).sum()
    return jnp.where(n_with_mask > 0, total / jnp.maximum(n_with_mask, 1.0), 0.0)


def masked_lm_loss_chunked(
    hidden: jax.Array,  # [B, L, H] compute dtype (bf16/f32)
    kernel: jax.Array,  # [H, V] head weight (fp32 master)
    bias: jax.Array,  # [V]
    labels: jax.Array,  # i32 [B, L]
    mask_positions: jax.Array,  # bool [B, L]
    lengths: jax.Array | None = None,
    chunk_size: int = 64,
) -> jax.Array:
    """Reference-equivalent masked CE against a LARGE vocabulary head,
    computed without ever materializing the [B, L, V] logits.

    Applies the head projection chunk-by-chunk over the sequence inside a
    remat'd ``lax.scan`` — forward peak memory is one [B, chunk, V] plane
    and the backward recomputes each chunk's logits instead of saving
    them. The projection reproduces the Flax Dense semantics the direct
    path uses (inputs/kernel/bias promoted to the compute dtype, then the
    logits cast to fp32), and the averaging is identical to
    ``masked_phoneme_loss``: per-sample mean over masked positions, then
    mean over samples with ≥1 mask.

    This is what lets the multi-task model (60k grapheme vocab,
    reference: model.py:5-18 + train.py multi-task loss) train at the
    reference's batch 96 × seq 512 inside 16 GB HBM — the direct
    [96, 512, 60000] fp32 log-softmax alone would need ~12 GB.
    """
    B, L, H = hidden.shape
    if L % chunk_size:
        # largest divisor of L not exceeding the request — never fall
        # back to one full-length chunk, which would materialize the
        # [B, L, V] plane this function exists to avoid
        chunk_size = min(chunk_size, L)
        while L % chunk_size:
            chunk_size -= 1
    n = L // chunk_size

    valid = valid_positions(mask_positions, lengths, L)

    cdt = hidden.dtype
    k_c = kernel.astype(cdt)
    b_c = bias.astype(cdt)

    h_chunks = hidden.reshape(B, n, chunk_size, H).transpose(1, 0, 2, 3)
    lab_chunks = labels.reshape(B, n, chunk_size).transpose(1, 0, 2)
    val_chunks = valid.reshape(B, n, chunk_size).transpose(1, 0, 2)

    @jax.checkpoint
    def chunk_stats(h_c, lab_c, val_c):
        logits = (jnp.dot(h_c, k_c) + b_c).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, lab_c[..., None], axis=-1)[..., 0]
        w = val_c.astype(jnp.float32)
        return (nll * w).sum(axis=1), w.sum(axis=1)

    def body(carry, xs):
        s, c = carry
        ds, dc = chunk_stats(*xs)
        return (s + ds, c + dc), None

    zeros = jnp.zeros((B,), jnp.float32)
    (sums, counts), _ = jax.lax.scan(
        body, (zeros, zeros), (h_chunks, lab_chunks, val_chunks)
    )
    has_mask = counts > 0
    per_sample_mean = sums / jnp.maximum(counts, 1.0)
    n_with_mask = has_mask.astype(jnp.float32).sum()
    total = jnp.where(has_mask, per_sample_mean, 0.0).sum()
    return jnp.where(n_with_mask > 0, total / jnp.maximum(n_with_mask, 1.0), 0.0)


def masked_lm_loss_fused(
    hidden: jax.Array,  # [B, L, H] compute dtype (bf16/f32)
    kernel: jax.Array,  # [H, V] head weight (fp32 master)
    bias: jax.Array,  # [V]
    labels: jax.Array,  # i32 [B, L]
    mask_positions: jax.Array,  # bool [B, L]
    lengths: jax.Array | None = None,
    chunk_size: int = 64,
) -> jax.Array:
    """``masked_lm_loss_chunked`` with forward-computed gradients — one
    fewer [rows,H]x[H,V] matmul pass per step against the 60k head.

    The loss is terminal and linear in per-position NLL, so every
    position's logit cotangent is known during the forward pass up to
    the scalar loss cotangent:

        d loss / d logits[b,l,:] = w[b,l] * (softmax(logits) - onehot)
        w[b,l] = valid[b,l] / (count_b * n_samples_with_mask)

    (w is computable from the mask planes BEFORE any projection). The
    remat'd chunked path runs FOUR passes of the dominant matmul per
    step — forward logits, backward logit recompute (jax.checkpoint,
    without which XLA saves ~25 GB of per-chunk logits for the scan
    backward), dX, and dW. This op computes dX/dW/db inside the forward
    scan (THREE passes) and its custom-VJP backward is a pure scaling by
    the loss cotangent — no recompute, no saved logits. Gradients match
    autodiff of the chunked path to dtype rounding (the grad matmuls run
    in the compute dtype with fp32 accumulation, where the chunked scan
    accumulates dW across chunks in the compute dtype); the loss VALUE
    is accumulated with the chunked path's exact per-sample order.

    A primal-only call (no differentiation, e.g. eval) lowers to
    ``masked_lm_loss_chunked`` — the gradient work is never done unless
    the step is differentiated.
    """
    L = hidden.shape[1]
    if L % chunk_size:
        chunk_size = min(chunk_size, L)
        while L % chunk_size:
            chunk_size -= 1

    valid = valid_positions(mask_positions, lengths, L)
    counts = valid.sum(axis=1).astype(jnp.float32)
    n_with_mask = (counts > 0).astype(jnp.float32).sum()
    # per-position loss weight: d loss / d nll[b, l]
    w_pos = valid.astype(jnp.float32) / (
        jnp.maximum(counts, 1.0)[:, None] * jnp.maximum(n_with_mask, 1.0)
    )
    return _fused_core(hidden, kernel, bias, labels, valid, w_pos, chunk_size)


def _fused_fwd_impl(hidden, kernel, bias, labels, valid, w_pos, chunk_size):
    B, L, H = hidden.shape
    V = kernel.shape[1]
    n = L // chunk_size
    cdt = hidden.dtype
    k_c = kernel.astype(cdt)
    b_c = bias.astype(cdt)
    h_chunks = hidden.reshape(B, n, chunk_size, H).transpose(1, 0, 2, 3)
    lab_chunks = labels.reshape(B, n, chunk_size).transpose(1, 0, 2)
    val_chunks = valid.reshape(B, n, chunk_size).transpose(1, 0, 2)
    w_chunks = w_pos.reshape(B, n, chunk_size).transpose(1, 0, 2)

    def body(carry, xs):
        sums, dk, db = carry
        h_c, lab_c, val_c, w_c = xs
        logits = (jnp.dot(h_c, k_c) + b_c).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, lab_c[..., None], axis=-1)[..., 0]
        sums = sums + (nll * val_c.astype(jnp.float32)).sum(axis=1)
        dlogits = (
            jnp.exp(logp) - jax.nn.one_hot(lab_c, V, dtype=jnp.float32)
        ) * w_c[..., None]
        dl_c = dlogits.astype(cdt)
        dh_c = jnp.dot(dl_c, k_c.T)
        dk = dk + jnp.dot(
            h_c.reshape(-1, H).T, dl_c.reshape(-1, V),
            preferred_element_type=jnp.float32,
        )
        db = db + dlogits.sum(axis=(0, 1))
        return (sums, dk, db), dh_c

    init = (
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((H, V), jnp.float32),
        jnp.zeros((V,), jnp.float32),
    )
    (sums, dk, db), dh_chunks = jax.lax.scan(
        body, init, (h_chunks, lab_chunks, val_chunks, w_chunks)
    )
    dh = dh_chunks.transpose(1, 0, 2, 3).reshape(B, L, H)
    # final averaging in the chunked path's exact order/formula so the
    # VALUE is bitwise-comparable to masked_lm_loss_chunked
    counts = valid.sum(axis=1).astype(jnp.float32)
    has_mask = counts > 0
    n_with_mask = has_mask.astype(jnp.float32).sum()
    per_sample_mean = sums / jnp.maximum(counts, 1.0)
    total = jnp.where(has_mask, per_sample_mean, 0.0).sum()
    loss = jnp.where(
        n_with_mask > 0, total / jnp.maximum(n_with_mask, 1.0), 0.0
    )
    return loss, (dh, dk.astype(kernel.dtype), db.astype(bias.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_core(hidden, kernel, bias, labels, valid, w_pos, chunk_size):
    # primal-only (never differentiated) lowering: the plain chunked
    # loss — no gradient work unless the caller differentiates
    return masked_lm_loss_chunked(
        hidden, kernel, bias, labels, valid, None, chunk_size
    )


def _fused_core_fwd(hidden, kernel, bias, labels, valid, w_pos, chunk_size):
    loss, grads = _fused_fwd_impl(
        hidden, kernel, bias, labels, valid, w_pos, chunk_size
    )
    return loss, grads


def _fused_core_bwd(chunk_size, res, g):
    dh, dk, db = res  # dh carries hidden's dtype and [B, L] leading shape
    float0 = jax.dtypes.float0
    bl = dh.shape[:2]
    return (
        (g.astype(jnp.float32) * dh.astype(jnp.float32)).astype(dh.dtype),
        g.astype(dk.dtype) * dk,
        g.astype(db.dtype) * db,
        np.zeros(bl, float0),  # labels: int, no tangent
        np.zeros(bl, float0),  # valid: bool, no tangent
        jnp.zeros(bl, jnp.float32),  # w_pos: no gradient flows back
    )


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def masked_lm_loss(
    hidden: jax.Array,  # [B, L, H]
    kernel: jax.Array,  # [H, V]
    bias: jax.Array,  # [V]
    labels: jax.Array,  # i32 [B, L]
    mask_positions: jax.Array,  # bool [B, L]
    lengths: jax.Array | None = None,
    capacity: int = 192,
    chunk_size: int = 64,
    fused: bool = False,
) -> jax.Array:
    """Large-vocab masked CE that projects ONLY the masked positions.

    The loss touches ~15% of positions (whole-word masking at
    word_pred_prob 0.15, reference: dataloader.py:83-108), so the
    [H, V] head projection runs on a per-sample gather of at most
    ``capacity`` masked positions instead of all L — a ~L/capacity FLOP
    cut on the dominant matmul. Gather order is position-stable, so the
    summation order (and the result, to f32 rounding) matches the
    ungathered computation.

    Correctness does not depend on the capacity: if any sample carries
    more than ``capacity`` masked positions (≥5.7σ above the masking
    distribution's mean at the defaults), a ``lax.cond`` falls back to
    the exact full-length chunked path for that batch.

    ``fused=True`` swaps the chunked CE for ``masked_lm_loss_fused``
    (forward-computed gradients — one fewer pass of the dominant matmul
    under differentiation) in BOTH cond branches; values are bitwise
    either way, gradients agree to compute-dtype rounding.
    """
    B, L, H = hidden.shape
    inner = masked_lm_loss_fused if fused else masked_lm_loss_chunked
    if capacity <= 0 or capacity >= L:
        return inner(
            hidden, kernel, bias, labels, mask_positions, lengths, chunk_size
        )

    valid = valid_positions(mask_positions, lengths, L)

    counts = valid.sum(axis=1)

    def gathered(_):
        # stable argsort puts each row's valid positions first, in order
        idx = jnp.argsort(~valid, axis=1, stable=True)[:, :capacity]
        h_g = jnp.take_along_axis(hidden, idx[..., None], axis=1)
        lab_g = jnp.take_along_axis(labels, idx, axis=1)
        val_g = jnp.take_along_axis(valid, idx, axis=1)
        return inner(
            h_g, kernel, bias, lab_g, val_g, None,
            min(chunk_size, capacity),
        )

    def full(_):
        return inner(
            hidden, kernel, bias, labels, valid, None, chunk_size
        )

    return jax.lax.cond(jnp.max(counts) <= capacity, gathered, full, None)


def masked_lm_metrics(
    hidden: jax.Array,  # [B, L, H]
    kernel: jax.Array,  # [H, V] head weight (fp32 master)
    bias: jax.Array,  # [V]
    labels: jax.Array,  # i32 [B, L]
    mask_positions: jax.Array,  # bool [B, L]
    lengths: jax.Array | None = None,
    capacity: int = 192,
    chunk_size: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Eval-only (loss, argmax accuracy) against a LARGE vocabulary
    head in ONE chunked pass — each chunk's logits are projected once
    and feed both the CE and the argmax, without ever materializing
    the [B, L, V] plane. Same masked-position gather and averaging as
    ``masked_lm_loss``, so the loss VALUE is identical to it; accuracy
    is hits / valid masked positions (the grapheme-head analog of
    ``masked_accuracy``). The reference validates on phoneme loss only
    and has no accuracy metric at all (reference: train.py:288-304).

    Both scalars are f32; a zero-mask batch yields (0.0, 0.0)."""
    B, L, H = hidden.shape
    valid = valid_positions(mask_positions, lengths, L)
    cdt = hidden.dtype
    k_c = kernel.astype(cdt)
    b_c = bias.astype(cdt)

    def stats_over(h, lab, val):
        b, l, _ = h.shape
        csize = min(chunk_size, l)
        while l % csize:
            csize -= 1
        n = l // csize
        h_chunks = h.reshape(b, n, csize, H).transpose(1, 0, 2, 3)
        lab_chunks = lab.reshape(b, n, csize).transpose(1, 0, 2)
        val_chunks = val.reshape(b, n, csize).transpose(1, 0, 2)

        def body(carry, xs):
            sums, counts, hits = carry
            h_k, lab_k, val_k = xs
            logits = (jnp.dot(h_k, k_c) + b_c).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp, lab_k[..., None], axis=-1
            )[..., 0]
            w = val_k.astype(jnp.float32)
            pred = jnp.argmax(logits, axis=-1)
            hit = ((pred == lab_k) & val_k).sum().astype(jnp.float32)
            return (
                sums + (nll * w).sum(axis=1),
                counts + w.sum(axis=1),
                hits + hit,
            ), None

        zeros = jnp.zeros((B,), jnp.float32)
        (sums, counts, hits), _ = jax.lax.scan(
            body, (zeros, zeros, jnp.zeros((), jnp.float32)),
            (h_chunks, lab_chunks, val_chunks),
        )
        return sums, counts, hits

    if capacity >= L:
        sums, counts, hits = stats_over(hidden, labels, valid)
    else:
        row_counts = valid.sum(axis=1)

        def gathered(_):
            # stable argsort puts each row's valid positions first —
            # identical gather to masked_lm_loss, so loss and accuracy
            # always see the same positions
            idx = jnp.argsort(~valid, axis=1, stable=True)[:, :capacity]
            h_g = jnp.take_along_axis(hidden, idx[..., None], axis=1)
            lab_g = jnp.take_along_axis(labels, idx, axis=1)
            val_g = jnp.take_along_axis(valid, idx, axis=1)
            return stats_over(h_g, lab_g, val_g)

        sums, counts, hits = jax.lax.cond(
            jnp.max(row_counts) <= capacity, gathered,
            lambda _: stats_over(hidden, labels, valid), None,
        )

    # masked_lm_loss_chunked's exact averaging: per-sample mean over
    # masked positions, then mean over samples with >=1 mask
    has_mask = counts > 0
    per_sample_mean = sums / jnp.maximum(counts, 1.0)
    n_with_mask = has_mask.astype(jnp.float32).sum()
    total = jnp.where(has_mask, per_sample_mean, 0.0).sum()
    loss = jnp.where(
        n_with_mask > 0, total / jnp.maximum(n_with_mask, 1.0), 0.0
    )
    acc = hits / jnp.maximum(valid.sum(), 1).astype(jnp.float32)
    return loss, acc


def masked_lm_accuracy(
    hidden: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    labels: jax.Array,
    mask_positions: jax.Array,
    lengths: jax.Array | None = None,
    capacity: int = 192,
    chunk_size: int = 64,
) -> jax.Array:
    """The accuracy half of ``masked_lm_metrics`` (see there)."""
    return masked_lm_metrics(
        hidden, kernel, bias, labels, mask_positions, lengths,
        capacity, chunk_size,
    )[1]


def masked_accuracy(
    logits: jax.Array,
    labels: jax.Array,
    mask_positions: jax.Array,
    lengths: jax.Array | None = None,
) -> jax.Array:
    """Fraction of masked positions predicted correctly (eval metric)."""
    valid = valid_positions(mask_positions, lengths, labels.shape[1])
    pred = jnp.argmax(logits, axis=-1)
    hit = (pred == labels) & valid
    denom = jnp.maximum(valid.sum(), 1)
    return hit.sum().astype(jnp.float32) / denom.astype(jnp.float32)
