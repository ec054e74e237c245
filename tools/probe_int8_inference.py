"""Decompose the int8 serving-path result: where does the time go?

bench.py --inference --int8 measured SLOWER than bf16 (773k vs 812k
tok/s) even though a bare int8 matmul probes 1.27-1.44x bf16 on this
chip (CLAUDE.md int8 probe). This probe times, at the FFN shapes the
quantized path actually hits ([49152,768]x[768,2048] and
[49152,2048]x[2048,768]):

  a) bf16 dot                      (the baseline the win is against)
  b) int8 dot, operands pre-quantized  (pure MXU effect)
  c) int8_dot_general              (dynamic quant + dot + rescale)
  d) the quantize_rows pass alone  (the suspected overhead)

Run via nohup on the axon rig. Prints one JSON line per shape.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pl_bert_tpu.ops.quant import int8_dot_general, quantize_rows

DIMS = (((1,), (0,)), ((), ()))
REPS = 30


def _time(fn, *args) -> float:
    out = fn(*args)
    jnp.sum(out[..., :1].astype(jnp.float32)).block_until_ready()
    float(jnp.sum(out[..., :1].astype(jnp.float32)))  # host read (axon sync)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / REPS


def main() -> None:
    rng = jax.random.PRNGKey(0)
    for M, K, N in [(49152, 768, 2048), (49152, 2048, 768)]:
        x = jax.random.normal(rng, (M, K), jnp.bfloat16)
        w = jax.random.normal(rng, (K, N), jnp.bfloat16)

        bf16_dot = jax.jit(lambda a, b: jax.lax.dot_general(a, b, DIMS))
        qx, sx = jax.jit(lambda a: quantize_rows(a, -1))(x)
        qw, sw = jax.jit(lambda a: quantize_rows(a, 0))(w)
        int8_pre = jax.jit(
            lambda a, b, s1, s2: (
                jax.lax.dot_general(
                    a, b, DIMS, preferred_element_type=jnp.int32
                ).astype(jnp.float32) * s1 * s2
            ).astype(jnp.bfloat16)
        )
        dyn = jax.jit(lambda a, b: int8_dot_general(a, b, DIMS))
        quant_only = jax.jit(lambda a: quantize_rows(a, -1)[0])

        t_bf16 = _time(bf16_dot, x, w)
        t_pre = _time(int8_pre, qx, qw, sx, sw)
        t_dyn = _time(dyn, x, w)
        t_q = _time(quant_only, x)
        print(json.dumps({
            "shape": f"{M}x{K}x{N}",
            "bf16_ms": round(t_bf16 * 1e3, 3),
            "int8_prequant_ms": round(t_pre * 1e3, 3),
            "int8_dynamic_ms": round(t_dyn * 1e3, 3),
            "quantize_pass_ms": round(t_q * 1e3, 3),
            "mxu_speedup": round(t_bf16 / t_pre, 3),
            "dynamic_speedup": round(t_bf16 / t_dyn, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
