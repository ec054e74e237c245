"""On-device whole-word phoneme masking.

Moves the reference's host-side per-sample masking collate
(reference: dataloader.py:59-126) into a fused JAX transform that runs
inside the jitted train step (BASELINE.json north star): the host ships
only static packed arrays (label ids, word ids, lengths) once per
batch, and the per-epoch masking randomness is generated on device —
no per-step host RNG, no ragged index lists, and masking fuses with the
embedding lookup.

Distribution parity with the host masker (data/masking.py): each word
selected w.p. ``word_pred_prob``; selected words fully masked w.p.
``phoneme_mask_prob``/(selected), replaced w.p. ``replace_prob`` with
phonemes drawn uniformly from the same sample's own characters, else
kept; separators/padding never masked.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pl_bert_tpu.data.masking import MaskingParams
from pl_bert_tpu.text.symbols import MASK_ID, SEPARATOR_ID


def mask_batch(
    label_ids: jax.Array,  # i32 [B, L] — with separators, zero-padded
    word_ids: jax.Array,  # i32 [B, L] — word index per char, -1 at sep/pad
    lengths: jax.Array,  # i32 [B]
    rng: jax.Array,
    params: MaskingParams,
) -> tuple[jax.Array, jax.Array]:
    """→ (masked_ids [B, L], mask_positions bool [B, L])."""
    B, L = label_ids.shape
    k_select, k_action, k_draw = jax.random.split(rng, 3)

    # word-level decisions (word ids are < L by construction)
    u_sel = jax.random.uniform(k_select, (B, L))
    u_act = jax.random.uniform(k_action, (B, L))
    selected_w = u_sel < params.word_pred_prob
    mask_w = selected_w & (u_act < params.phoneme_mask_prob)
    replace_w = (
        selected_w
        & ~mask_w
        & (u_act < params.phoneme_mask_prob + params.replace_prob)
    )

    is_char = word_ids >= 0
    in_range = jnp.arange(L)[None, :] < lengths[:, None]
    valid_char = is_char & in_range

    safe_wid = jnp.clip(word_ids, 0, L - 1)
    char_masked = jnp.take_along_axis(mask_w, safe_wid, axis=1) & valid_char
    char_replaced = jnp.take_along_axis(replace_w, safe_wid, axis=1) & valid_char

    # replacement values drawn uniformly from each sample's own chars:
    # pick target ∈ [0, n_chars) then map to the target-th valid char
    # position via cumsum + searchsorted
    n_chars = valid_char.sum(axis=1)
    cums = jnp.cumsum(valid_char.astype(jnp.int32), axis=1)  # [B, L]
    targets = (
        jax.random.uniform(k_draw, (B, L)) * jnp.maximum(n_chars, 1)[:, None]
    ).astype(jnp.int32)
    src_pos = jax.vmap(
        lambda c, t: jnp.searchsorted(c, t + 1, side="left")
    )(cums, targets)
    src_pos = jnp.clip(src_pos, 0, L - 1)
    replacement = jnp.take_along_axis(label_ids, src_pos, axis=1)

    masked_ids = jnp.where(char_masked, MASK_ID, label_ids)
    masked_ids = jnp.where(char_replaced, replacement, masked_ids)
    mask_positions = char_masked | char_replaced
    return masked_ids, mask_positions


def pack_sample(word_phonemes: list[str], max_seq_length: int, offset: int = 0):
    """Host-side packing: per-word phoneme strings → (label_ids, word_ids,
    length) numpy arrays with separators, cropped to the window starting
    at char-stream ``offset`` and padded to the static length. Word ids
    are re-based to the window's first visible word. This is the 'packed
    phoneme shard' layout the on-device path consumes (numpy fallback of
    the native packer)."""
    import numpy as np

    from pl_bert_tpu.text.symbols import encode

    ids_parts = []
    wid_parts = []
    for w_idx, word in enumerate(word_phonemes):
        wid = encode(word)
        ids_parts.append(wid)
        ids_parts.append(np.array([SEPARATOR_ID], np.int32))
        wid_parts.append(np.full(len(wid), w_idx, np.int32))
        wid_parts.append(np.array([-1], np.int32))
    ids = np.concatenate(ids_parts) if ids_parts else np.zeros(0, np.int32)
    wids = np.concatenate(wid_parts) if wid_parts else np.zeros(0, np.int32)
    if offset:
        ids = ids[offset:]
        wids = wids[offset:]
    n = min(len(ids), max_seq_length)
    ids, wids = ids[:n], wids[:n]
    visible = wids >= 0
    if visible.any():
        wids = np.where(visible, wids - wids[visible][0], -1)
    out_ids = np.zeros(max_seq_length, np.int32)
    out_wids = np.full(max_seq_length, -1, np.int32)
    out_ids[:n] = ids
    out_wids[:n] = wids
    return out_ids, out_wids, n
