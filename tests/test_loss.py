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


def test_masked_lm_accuracy_matches_full_logits():
    """masked_lm_accuracy (gather + chunked projection, never
    materializing [B, L, V]) equals argmax accuracy on the full logits,
    through BOTH cond branches, jitted; 0.0 on a zero-mask batch."""
    from pl_bert_tpu.ops.masked_ce import masked_lm_accuracy

    rng = np.random.default_rng(33)
    B, L, H, V = 4, 32, 8, 41
    hidden = jnp.asarray(rng.standard_normal((B, L, H)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((H, V)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(V) * 0.01, jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32)
    mask = jnp.asarray(rng.random((B, L)) < 0.25)
    lengths = jnp.asarray([32, 28, 9, 32], jnp.int32)

    logits = jnp.dot(hidden, kernel) + bias
    expect = float(masked_accuracy(logits, labels, mask, lengths))
    assert 0.0 < expect < 1.0  # non-degenerate fixture

    for capacity in (16, 4):  # 16: gather branch fits; 4: overflow fallback
        got = jax.jit(
            lambda h: masked_lm_accuracy(
                h, kernel, bias, labels, mask, lengths,
                capacity=capacity, chunk_size=8,
            )
        )(hidden)
        assert abs(float(got) - expect) < 1e-6, capacity

    no_mask = masked_lm_accuracy(
        hidden, kernel, bias, labels, jnp.zeros_like(mask), lengths,
        capacity=16, chunk_size=8,
    )
    assert float(no_mask) == 0.0


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_masked_lm_metrics_loss_identical_to_masked_lm_loss(dtype):
    """The fused (loss, acc) pass returns the EXACT masked_lm_loss
    value — same gather, same chunking, same averaging — through both
    cond branches and in both compute dtypes (bf16 = the mixed-precision
    eval path); a zero-mask batch yields (0.0, 0.0)."""
    from pl_bert_tpu.ops.masked_ce import masked_lm_loss, masked_lm_metrics

    rng = np.random.default_rng(34)
    B, L, H, V = 4, 32, 8, 41
    hidden = jnp.asarray(rng.standard_normal((B, L, H)), dtype)
    kernel = jnp.asarray(rng.standard_normal((H, V)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(V) * 0.01, jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32)
    mask = jnp.asarray(rng.random((B, L)) < 0.25)
    lengths = jnp.asarray([32, 28, 9, 32], jnp.int32)

    for capacity in (16, 4):  # gather branch fits / overflow fallback
        want = float(
            masked_lm_loss(
                hidden, kernel, bias, labels, mask, lengths,
                capacity=capacity, chunk_size=8,
            )
        )
        loss, acc = jax.jit(
            lambda h: masked_lm_metrics(
                h, kernel, bias, labels, mask, lengths,
                capacity=capacity, chunk_size=8,
            )
        )(hidden)
        assert float(loss) == want, capacity
        assert 0.0 <= float(acc) <= 1.0

    loss0, acc0 = masked_lm_metrics(
        hidden, kernel, bias, labels, jnp.zeros_like(mask), lengths,
        capacity=16, chunk_size=8,
    )
    assert float(loss0) == 0.0 and float(acc0) == 0.0


# ---- fused linear CE (forward-computed gradients) ----


def _fused_fixture(seed=31, B=4, L=32, H=16, V=50, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    hidden = jnp.asarray(rng.standard_normal((B, L, H)), dtype)
    kernel = jnp.asarray(rng.standard_normal((H, V)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(V) * 0.01, jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32)
    mask = jnp.asarray(rng.random((B, L)) < 0.2).at[2].set(False)
    lengths = jnp.asarray([L, L - 12, L, 5], jnp.int32)
    return hidden, kernel, bias, labels, mask, lengths


def test_fused_lm_loss_value_bitwise_vs_chunked():
    """The fused op's primal AND differentiated loss values accumulate in
    the chunked path's exact order — bitwise equality, not allclose."""
    from pl_bert_tpu.ops.masked_ce import (
        masked_lm_loss_chunked, masked_lm_loss_fused,
    )

    hidden, kernel, bias, labels, mask, lengths = _fused_fixture()
    for cs in (8, 5):  # divisible and snapped-down chunk sizes
        ref = masked_lm_loss_chunked(
            hidden, kernel, bias, labels, mask, lengths, cs
        )
        prim = masked_lm_loss_fused(
            hidden, kernel, bias, labels, mask, lengths, cs
        )
        diff, _ = jax.value_and_grad(
            lambda h: masked_lm_loss_fused(
                h, kernel, bias, labels, mask, lengths, cs
            )
        )(hidden)
        assert float(prim) == float(ref)
        assert float(diff) == float(ref)


def test_fused_lm_loss_gradients_match_autodiff():
    from pl_bert_tpu.ops.masked_ce import (
        masked_lm_loss_chunked, masked_lm_loss_fused,
    )

    hidden, kernel, bias, labels, mask, lengths = _fused_fixture()
    g_ref = jax.grad(
        lambda *a: masked_lm_loss_chunked(*a, labels, mask, lengths, 8),
        argnums=(0, 1, 2),
    )(hidden, kernel, bias)
    g_fus = jax.grad(
        lambda *a: masked_lm_loss_fused(*a, labels, mask, lengths, 8),
        argnums=(0, 1, 2),
    )(hidden, kernel, bias)
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-5, atol=1e-7,
        )


def test_fused_lm_loss_scaled_cotangent():
    """The custom-VJP backward is a pure scaling: an outer 2.5x on the
    loss must scale every gradient by exactly 2.5."""
    from pl_bert_tpu.ops.masked_ce import masked_lm_loss_fused

    hidden, kernel, bias, labels, mask, lengths = _fused_fixture()

    def loss(h, k, b, s):
        return s * masked_lm_loss_fused(h, k, b, labels, mask, lengths, 8)

    g1 = jax.grad(loss, argnums=(0, 1, 2))(hidden, kernel, bias, 1.0)
    g25 = jax.grad(loss, argnums=(0, 1, 2))(hidden, kernel, bias, 2.5)
    for a, b in zip(g1, g25):
        np.testing.assert_allclose(
            2.5 * np.asarray(a), np.asarray(b), rtol=1e-6
        )


def test_fused_dispatch_gather_and_fallback_under_jit():
    """masked_lm_loss(fused=True) through BOTH lax.cond branches (the
    masked-position gather and the capacity-overflow fallback), jitted,
    values and gradients against the default path."""
    from pl_bert_tpu.ops.masked_ce import masked_lm_loss

    hidden, kernel, bias, labels, mask, lengths = _fused_fixture()
    overflow = jnp.ones_like(mask)  # every position masked -> fallback

    import functools

    for m in (mask, overflow):

        @functools.partial(jax.jit, static_argnums=(3,))
        def vg(h, k, b, fused, m=m):
            return jax.value_and_grad(
                lambda *a: masked_lm_loss(
                    *a, labels, m, lengths, capacity=16, fused=fused
                ),
                argnums=(0, 1, 2),
            )(h, k, b)

        v_ref, g_ref = vg(hidden, kernel, bias, False)
        v_fus, g_fus = vg(hidden, kernel, bias, True)
        assert abs(float(v_ref) - float(v_fus)) < 1e-6
        for a, b in zip(g_ref, g_fus):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
            )


def test_fused_lm_loss_no_masks_zero_loss_zero_grads():
    from pl_bert_tpu.ops.masked_ce import masked_lm_loss_fused

    hidden, kernel, bias, labels, _, lengths = _fused_fixture()
    none = jnp.zeros(labels.shape, bool)
    v, g = jax.value_and_grad(
        lambda h: masked_lm_loss_fused(
            h, kernel, bias, labels, none, lengths, 8
        )
    )(hidden)
    assert float(v) == 0.0
    assert bool(jnp.all(g == 0))


def test_fused_lm_loss_bf16_kernel_grad_close():
    """Mixed precision: fused dW accumulates across chunks in fp32 where
    the chunked scan accumulates in bf16 — agreement is dtype-rounding,
    pinned here at 2% relative."""
    from pl_bert_tpu.ops.masked_ce import (
        masked_lm_loss_chunked, masked_lm_loss_fused,
    )

    hidden, kernel, bias, labels, mask, lengths = _fused_fixture(
        dtype=jnp.bfloat16
    )
    g_ref = jax.grad(
        lambda k: masked_lm_loss_chunked(
            hidden, k, bias, labels, mask, lengths, 8
        )
    )(kernel)
    g_fus = jax.grad(
        lambda k: masked_lm_loss_fused(
            hidden, k, bias, labels, mask, lengths, 8
        )
    )(kernel)
    denom = float(jnp.max(jnp.abs(g_ref)))
    err = float(jnp.max(jnp.abs(g_ref - g_fus))) / max(denom, 1e-30)
    assert err < 2e-2, err


def test_capacity_zero_disables_gather_bitwise():
    """lm_head_capacity 0 (config.py) means "always the full-length
    path": masked_lm_loss(capacity=0) must be BITWISE the chunked/fused
    inner on the ungathered sequence, with no gather cond in between."""
    import jax.numpy as jnp

    from pl_bert_tpu.ops.masked_ce import (
        masked_lm_loss, masked_lm_loss_chunked, masked_lm_loss_fused,
    )

    rng = np.random.default_rng(33)
    B, L, H, V = 4, 32, 8, 41
    hidden = jnp.asarray(rng.standard_normal((B, L, H)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((H, V)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(V) * 0.01, jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32)
    mask = jnp.asarray(rng.random((B, L)) < 0.25)
    lengths = jnp.asarray([32, 28, 9, 32], jnp.int32)

    for fused, inner in (
        (False, masked_lm_loss_chunked),
        (True, masked_lm_loss_fused),
    ):
        got = masked_lm_loss(
            hidden, kernel, bias, labels, mask, lengths,
            capacity=0, chunk_size=8, fused=fused,
        )
        want = inner(hidden, kernel, bias, labels, mask, lengths, 8)
        assert float(got) == float(want), fused
