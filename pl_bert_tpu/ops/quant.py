"""Dynamic int8 quantized matmul for the serving path.

The v5e MXU runs int8×int8→int32 at 2× its bf16 rate (394.7 TOPs vs
197.9 TFLOPs), so for inference — where the reference's downstream
contract is a forward pass feeding ``last_hidden_state`` to StyleTTS
(reference: README.md:40-47) — the dense projections can trade ~1%
numeric error for roughly half the matmul time. Training keeps full
bf16: the measured win there (~4% of step time, see the int8 probe in
CLAUDE.md) does not justify the accuracy risk, and quantized gradients
are a research topic, not a framework default.

Design (AQT-style, computed fresh every call — no calibration pass):

- activations: symmetric per-row scales (abs-max over the contracting
  dim), so each token's dynamic range is preserved independently;
- weights: symmetric per-output-channel scales (abs-max over the input
  dim) — the standard layout that keeps the rescale a rank-1 outer
  product folded into the int32→float epilogue;
- accumulate in int32 on the MXU, rescale in fp32, return in the
  activations' dtype.

``int8_dot_general`` is a drop-in for ``lax.dot_general`` restricted to
the pattern ``flax.linen.Dense`` emits (contract lhs's last dim with a
2-D kernel's first dim, no batch dims); anything else falls through to
the exact dot. Threaded into the model via
``AlbertConfig.quantize="int8"`` (models/albert.py::_dense) and exposed
on ``PhonemeEncoder(quantize="int8")``. The fused attention-block
Pallas kernel keeps its bf16 internals — attention score/AV matmuls are
small-K (64) VPU-adjacent work where dynamic quantization overhead
would eat the win; the FFN and projection matmuls are where the int8
FLOPs pay.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_QMAX = 127.0


def quantize_rows(x: jax.Array, axis: int) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization with one scale per slice along
    ``axis`` (the contracting dimension). Returns ``(q, scale)`` with
    ``q`` int8 and ``scale`` fp32 keeping ``axis`` as size 1, such that
    ``q * scale ≈ x``. All-zero slices get scale eps (q = 0 exactly)."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(ax, 1e-12) / _QMAX
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -_QMAX, _QMAX)
    return q.astype(jnp.int8), scale


def int8_dot_general(
    lhs: jax.Array,
    rhs: jax.Array,
    dimension_numbers,
    precision=None,
    preferred_element_type=None,
):
    """``lax.dot_general`` substitute quantizing both operands to int8.

    Handles the nn.Dense pattern — ``(((lhs.ndim-1,), (0,)), ((), ()))``
    with a 2-D ``rhs`` — on the int8 MXU path; any other dimension
    structure (or a non-float operand) falls back to the exact dot so
    the substitution is always safe.
    """
    (lcs, rcs), (lbs, rbs) = dimension_numbers
    dense_pattern = (
        not lbs
        and not rbs
        and tuple(lcs) == (lhs.ndim - 1,)
        and tuple(rcs) == (0,)
        and rhs.ndim == 2
        and jnp.issubdtype(lhs.dtype, jnp.floating)
        and jnp.issubdtype(rhs.dtype, jnp.floating)
    )
    if not dense_pattern:
        return lax.dot_general(
            lhs, rhs, dimension_numbers,
            precision=precision, preferred_element_type=preferred_element_type,
        )
    ql, sl = quantize_rows(lhs, axis=-1)  # sl: lhs.shape[:-1] + (1,)
    qr, sr = quantize_rows(rhs, axis=0)  # sr: (1, N)
    acc = lax.dot_general(
        ql, qr, dimension_numbers, preferred_element_type=jnp.int32
    )
    out = acc.astype(jnp.float32) * sl * sr  # (…, N) * (…, 1) * (1, N)
    if lhs.ndim == 1:
        # rank-1 lhs: acc is (N,), but sr's (1, N) broadcast grew a
        # leading dim — drop it so the result matches lax.dot_general's
        out = out.reshape(out.shape[-1])
    out_dtype = preferred_element_type or lhs.dtype
    return out.astype(out_dtype)
