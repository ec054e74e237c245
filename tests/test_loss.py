"""Loss-semantics tests: the vectorized masked CE must equal the
reference's per-sample ragged loop (reference: train.py:107-131)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_bert_tpu.ops.masked_ce import masked_accuracy, masked_phoneme_loss


def _reference_loop_loss(logits, labels, lengths, masked_indices):
    """Per-sample loop oracle with the reference's exact averaging."""
    torch = pytest.importorskip("torch")
    criterion = torch.nn.CrossEntropyLoss()
    total, count = 0.0, 0
    for lg, lb, ln, idx in zip(logits, labels, lengths, masked_indices):
        if len(idx) > 0:
            pred = torch.from_numpy(lg[:ln][idx])
            tgt = torch.from_numpy(lb[:ln][idx]).long()
            total = total + criterion(pred, tgt)
            count += 1
    return float(total / count) if count else 0.0


def _random_case(rng, B=6, L=40, V=17, all_empty=False):
    logits = rng.standard_normal((B, L, V)).astype(np.float32)
    labels = rng.integers(0, V, size=(B, L)).astype(np.int32)
    lengths = rng.integers(10, L + 1, size=B).astype(np.int32)
    mask = np.zeros((B, L), dtype=bool)
    masked_indices = []
    for i in range(B):
        if all_empty or (i == 0):  # sample 0 always empty → exercises count
            masked_indices.append(np.array([], dtype=np.int64))
            continue
        k = int(rng.integers(1, 8))
        idx = rng.choice(int(lengths[i]), size=min(k, int(lengths[i])), replace=False)
        idx.sort()
        masked_indices.append(idx)
        mask[i, idx] = True
    return logits, labels, lengths, mask, masked_indices


def test_matches_reference_loop():
    rng = np.random.default_rng(0)
    for trial in range(5):
        logits, labels, lengths, mask, idxs = _random_case(rng)
        ref = _reference_loop_loss(logits, labels, lengths, idxs)
        mine = float(
            masked_phoneme_loss(
                jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask),
                jnp.asarray(lengths),
            )
        )
        assert abs(mine - ref) < 1e-5, (trial, mine, ref)


def test_no_masks_returns_zero():
    rng = np.random.default_rng(1)
    logits, labels, lengths, mask, _ = _random_case(rng, all_empty=True)
    out = float(
        masked_phoneme_loss(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask),
            jnp.asarray(lengths),
        )
    )
    assert out == 0.0


def test_padding_positions_excluded():
    """Masks accidentally landing beyond a sample's length are ignored."""
    rng = np.random.default_rng(2)
    B, L, V = 2, 16, 7
    logits = rng.standard_normal((B, L, V)).astype(np.float32)
    labels = rng.integers(0, V, size=(B, L)).astype(np.int32)
    lengths = np.array([8, 16], dtype=np.int32)
    mask = np.zeros((B, L), dtype=bool)
    mask[0, 4] = True
    mask[0, 12] = True  # beyond length 8 → must be ignored
    mask[1, 3] = True
    with_len = float(
        masked_phoneme_loss(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask),
            jnp.asarray(lengths),
        )
    )
    mask_fixed = mask.copy()
    mask_fixed[0, 12] = False
    expect = float(
        masked_phoneme_loss(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask_fixed), None
        )
    )
    assert abs(with_len - expect) < 1e-6


def test_accuracy_bounds():
    rng = np.random.default_rng(3)
    logits, labels, lengths, mask, _ = _random_case(rng)
    acc = float(
        masked_accuracy(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask),
            jnp.asarray(lengths),
        )
    )
    assert 0.0 <= acc <= 1.0
    # perfect logits → accuracy 1
    perfect = np.zeros_like(logits)
    np.put_along_axis(perfect, labels[..., None].astype(np.int64), 10.0, axis=-1)
    acc2 = float(
        masked_accuracy(
            jnp.asarray(perfect), jnp.asarray(labels), jnp.asarray(mask),
            jnp.asarray(lengths),
        )
    )
    assert acc2 == 1.0


def test_chunked_lm_loss_matches_direct_projection():
    """masked_lm_loss_chunked == Dense-then-masked_phoneme_loss, bit-for
    computation-order: same bf16 projection semantics, same averaging."""
    from pl_bert_tpu.ops.masked_ce import masked_lm_loss_chunked

    rng = np.random.default_rng(11)
    B, L, H, V = 4, 32, 16, 97
    hidden = jnp.asarray(rng.standard_normal((B, L, H)), jnp.bfloat16)
    kernel = jnp.asarray(rng.standard_normal((H, V)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(V) * 0.01, jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32)
    mask = jnp.asarray(rng.random((B, L)) < 0.2)
    lengths = jnp.asarray([32, 30, 17, 0], jnp.int32)  # incl. empty sample

    # direct path: the Flax-Dense semantics the full-logits model uses
    cdt = hidden.dtype
    logits = (
        jnp.dot(hidden, kernel.astype(cdt)) + bias.astype(cdt)
    ).astype(jnp.float32)
    expect = float(masked_phoneme_loss(logits, labels, mask, lengths))

    got = float(
        masked_lm_loss_chunked(
            hidden, kernel, bias, labels, mask, lengths, chunk_size=8
        )
    )
    assert abs(got - expect) < 1e-4

    # non-divisible chunk size falls back to a single chunk, same value
    got2 = float(
        masked_lm_loss_chunked(
            hidden, kernel, bias, labels, mask, lengths, chunk_size=7
        )
    )
    assert abs(got2 - expect) < 1e-4


def test_chunked_lm_loss_gradients_match():
    from pl_bert_tpu.ops.masked_ce import masked_lm_loss_chunked

    rng = np.random.default_rng(12)
    B, L, H, V = 3, 16, 8, 23
    hidden = jnp.asarray(rng.standard_normal((B, L, H)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((H, V)) * 0.05, jnp.float32)
    bias = jnp.zeros(V, jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32)
    mask = jnp.asarray(rng.random((B, L)) < 0.3)

    def direct(h, k, b):
        logits = (jnp.dot(h, k) + b).astype(jnp.float32)
        return masked_phoneme_loss(logits, labels, mask, None)

    def chunked(h, k, b):
        return masked_lm_loss_chunked(
            h, k, b, labels, mask, None, chunk_size=4
        )

    g1 = jax.grad(direct, argnums=(0, 1, 2))(hidden, kernel, bias)
    g2 = jax.grad(chunked, argnums=(0, 1, 2))(hidden, kernel, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)


def test_gathered_lm_loss_matches_direct():
    """masked_lm_loss (masked-position gather + capacity fallback) equals
    the direct projection in both branches, values and gradients."""
    from pl_bert_tpu.ops.masked_ce import masked_lm_loss

    rng = np.random.default_rng(21)
    B, L, H, V = 4, 32, 8, 41
    hidden = jnp.asarray(rng.standard_normal((B, L, H)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((H, V)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(V) * 0.01, jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32)
    mask = jnp.asarray(rng.random((B, L)) < 0.25)
    lengths = jnp.asarray([32, 28, 9, 32], jnp.int32)

    def direct(h, k, b):
        logits = (jnp.dot(h, k) + b).astype(jnp.float32)
        return masked_phoneme_loss(logits, labels, mask, lengths)

    expect, g_expect = jax.value_and_grad(direct, argnums=(0, 1, 2))(
        hidden, kernel, bias
    )

    for capacity in (16, 4):  # 16: gather branch fits; 4: overflow fallback
        def gathered(h, k, b):
            return masked_lm_loss(
                h, k, b, labels, mask, lengths,
                capacity=capacity, chunk_size=8,
            )

        got, g_got = jax.value_and_grad(gathered, argnums=(0, 1, 2))(
            hidden, kernel, bias
        )
        assert abs(float(got) - float(expect)) < 1e-4, capacity
        for a, b_ in zip(g_expect, g_got):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-5,
                err_msg=f"capacity={capacity}",
            )
