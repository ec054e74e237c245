"""Dynamic int8 matmul (ops/quant.py) and the quantized serving path.

The serving contract is AlbertModel.last_hidden_state fed to StyleTTS
(reference: README.md:40-47); ``PhonemeEncoder(quantize="int8")`` must
preserve those hidden states to within quantization noise while the
dense matmuls run int8. All tests are CPU-exact semantics (the int8
dot is plain XLA — no Pallas, nothing TPU-gated).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_bert_tpu.config import ModelParams
from pl_bert_tpu.models.inference import PhonemeEncoder
from pl_bert_tpu.ops.quant import int8_dot_general, quantize_rows

DENSE_DIMS = (((1,), (0,)), ((), ()))  # nn.Dense: lhs [.., K] @ rhs [K, N]


def test_quantize_rows_roundtrip():
    x = np.random.default_rng(0).normal(size=(32, 64)).astype(np.float32)
    q, scale = quantize_rows(jnp.asarray(x), axis=-1)
    assert q.dtype == jnp.int8
    recon = np.asarray(q, np.float32) * np.asarray(scale)
    # per-element error bounded by half a quantization step of its row
    step = np.asarray(scale)[:, 0]
    assert np.all(np.abs(recon - x) <= 0.5 * step[:, None] + 1e-7)


def test_quantize_rows_zero_row_is_exact():
    x = jnp.zeros((4, 16), jnp.float32)
    q, scale = quantize_rows(x, axis=-1)
    assert np.all(np.asarray(q) == 0)
    assert np.all(np.isfinite(np.asarray(scale)))


def test_int8_dot_matches_exact_within_quant_noise():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(128, 256)).astype(np.float32)
    w = rng.normal(size=(256, 192)).astype(np.float32)
    got = np.asarray(
        int8_dot_general(jnp.asarray(x), jnp.asarray(w), DENSE_DIMS)
    )
    ref = x @ w
    # int8 symmetric quantization of both operands: ~1% output error at
    # K=256 (elementwise-relative is ill-posed at the output's zero
    # crossings, so both bounds are against the output's scale)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 0.02
    assert np.abs(got - ref).mean() / ref.std() < 0.02


def test_int8_dot_3d_lhs():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 8, 32)).astype(np.float32)
    w = rng.normal(size=(32, 16)).astype(np.float32)
    dims = (((2,), (0,)), ((), ()))
    got = np.asarray(int8_dot_general(jnp.asarray(x), jnp.asarray(w), dims))
    ref = np.einsum("blk,kn->bln", x, w)
    assert got.shape == ref.shape
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 0.03


def test_int8_dot_falls_back_on_non_dense_patterns():
    rng = np.random.default_rng(3)
    # batched dot (batch dims present) must fall through to the exact dot
    x = jnp.asarray(rng.normal(size=(2, 8, 16)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, 16, 4)).astype(np.float32))
    dims = (((2,), (1,)), ((0,), (0,)))
    got = int8_dot_general(x, y, dims)
    ref = jax.lax.dot_general(x, y, dims)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # integer operands fall through too
    xi = jnp.ones((4, 8), jnp.int32)
    wi = jnp.ones((8, 2), jnp.int32)
    got_i = int8_dot_general(xi, wi, DENSE_DIMS)
    np.testing.assert_array_equal(
        np.asarray(got_i), np.asarray(jax.lax.dot_general(xi, wi, DENSE_DIMS))
    )


def test_int8_dot_jit_grad_safe():
    """The quantized dot lives under jit in the serving forward; it must
    trace cleanly (round/clip are fine forward-only)."""
    x = jnp.ones((8, 16), jnp.bfloat16)
    w = jnp.ones((16, 4), jnp.bfloat16)
    out = jax.jit(lambda a, b: int8_dot_general(a, b, DENSE_DIMS))(x, w)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), 16.0, rtol=0.02)


SMALL = ModelParams(
    hidden_size=96,
    num_attention_heads=4,
    intermediate_size=192,
    max_position_embeddings=64,
    num_hidden_layers=3,
    embedding_size=48,
    dropout=0.0,
    attention_impl="xla",
)


@pytest.fixture(scope="module")
def small_params():
    from pl_bert_tpu.models.albert import build_model, init_params

    model = build_model(SMALL, "fp32")
    return init_params(model, 64, seed=0)["encoder"]


def test_phoneme_encoder_int8_matches_fp32(small_params):
    texts = ["mˈaʃiːn lˈɜːnɪŋ", "tˌiːpˌiːjˈuː", "ʔabc dˈef"]
    base = PhonemeEncoder(small_params, SMALL, 64, mixed_precision="fp32")
    quant = PhonemeEncoder(
        small_params, SMALL, 64, mixed_precision="fp32", quantize="int8"
    )
    h_base, len_base = base(texts)
    h_quant, len_quant = quant(texts)
    np.testing.assert_array_equal(len_base, len_quant)
    assert h_quant.shape == h_base.shape
    # hidden states survive 3 quantized layers: per-token cosine ≥ 0.99
    for i, n in enumerate(len_base):
        a, b = h_base[i, :n], h_quant[i, :n]
        cos = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
        )
        assert cos.min() > 0.99, f"row {i}: min cosine {cos.min()}"


def test_phoneme_encoder_int8_unknown_mode_raises(small_params):
    enc = PhonemeEncoder(
        small_params, SMALL, 64, mixed_precision="fp32", quantize="int8"
    )
    assert enc.cfg.quantize == "int8"
    with pytest.raises(ValueError):
        # AlbertConfig accepts the field; _dense only knows "int8" —
        # anything else must fail loudly at trace time, not silently
        # run unquantized
        bad = PhonemeEncoder(
            small_params, SMALL, 64, mixed_precision="fp32", quantize="int4"
        )
        bad(["abc"])


def test_rank1_lhs_shape_matches_dot_general():
    """A 1-D lhs (single unbatched vector through the nn.Dense pattern)
    must return (N,) like lax.dot_general — the (1, N) weight-scale
    broadcast used to grow a silent leading dim."""
    import jax.numpy as jnp
    from jax import lax

    from pl_bert_tpu.ops.quant import int8_dot_general

    lhs = jnp.linspace(-1.0, 1.0, 8)
    rhs = jnp.linspace(-1.0, 1.0, 32).reshape(8, 4)
    dn = (((0,), (0,)), ((), ()))
    exact = lax.dot_general(lhs, rhs, dn)
    quant = int8_dot_general(lhs, rhs, dn)
    assert quant.shape == exact.shape == (4,)
    np.testing.assert_allclose(
        np.asarray(quant), np.asarray(exact), atol=0.05
    )
