"""On-chip diagnosis of the fused dropout+add+LayerNorm kernel's headroom.

Round-2 xprof attributed ~31 ms of the 192.8 ms flagship step to the
fused LN kernels (24 calls/step fwd + their backward). The pure HBM
traffic for those calls is ~14.5 GB/step ≈ 18 ms at v5e bandwidth, so up
to ~40% of their time may be VPU/mosaic overhead. This tool isolates
where it goes, on the real chip:

- copy-anchor: a pallas kernel that just reads x/res and writes out —
  the speed-of-light floor for the forward's traffic;
- rate=0 vs rate=0.1: the in-kernel PRNG + mask cost, fwd and bwd;
- row-block sweep (128/256/512): mosaic pipelining vs scoped-VMEM
  pressure (512 rows × H=768 × ~7 fp32 intermediates ≈ 11 MB, inside
  the 16 MB scoped limit);
- XLA-unfused chain: what the fusion buys end to end.

Methodology matches tools/compare_stock_flash.py: a 24-call dependent
chain inside one jit, one scalar host read per step (block_until_ready
does not synchronize under axon — CLAUDE.md).

Run on the TPU rig: ``python tools/bench_fused_ln.py``
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, H = 96 * 512, 768  # flagship [B·L, hidden]
CALLS = 24  # 12 layers × 2 LN sites
STEPS = 10


def _bench(step_fn, *args):
    float(step_fn(*args))  # compile + first sync
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(STEPS):
        acc += float(step_fn(*args))
    dt = (time.perf_counter() - t0) / STEPS
    assert np.isfinite(acc)
    return dt * 1e3  # ms per CALLS-call chain


def _chain(op):
    def step(x, res):
        for i in range(CALLS):
            x = op(x, res, i)
        return x.astype(jnp.float32).mean()

    return jax.jit(step)


def _chain_grad(op):
    def loss(x, res):
        y = x
        for i in range(CALLS):
            y = op(y, res, i)
        return y.astype(jnp.float32).mean()

    g = jax.grad(loss)

    @jax.jit
    def step(x, res):
        return g(x, res).astype(jnp.float32).mean()

    return step


def main() -> None:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pl_bert_tpu.ops import fused_ln

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, H)), jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((N, H)), jnp.bfloat16)
    gamma = jnp.ones((H,), jnp.float32)
    beta = jnp.zeros((H,), jnp.float32)

    def fused_op(rate):
        def op(x, res, i):
            seed = jnp.asarray([17 + i], jnp.int32)
            return fused_ln.dropout_add_layernorm(
                x, res, gamma, beta, seed=seed, rate=rate
            ).astype(x.dtype)

        return op

    def xla_op(x, res, i):
        key = jax.random.fold_in(jax.random.PRNGKey(17), i)
        keep = jax.random.bernoulli(key, 0.9, x.shape)
        xx = jnp.where(keep, x.astype(jnp.float32) / 0.9, 0.0)
        y = xx + res.astype(jnp.float32)
        mean = y.mean(-1, keepdims=True)
        var = jnp.square(y - mean).mean(-1, keepdims=True)
        out = (y - mean) * jax.lax.rsqrt(var + 1e-12) * gamma + beta
        return out.astype(x.dtype)

    # speed-of-light anchor: same blocks, just read both operands + write
    def _copy_kernel(x_ref, r_ref, o_ref):
        o_ref[...] = (
            x_ref[...].astype(jnp.float32) + r_ref[...].astype(jnp.float32)
        ).astype(o_ref.dtype)

    def copy_op(x, res, i):
        rows = fused_ln._block_rows(H)
        spec = pl.BlockSpec((rows, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _copy_kernel,
            grid=(N // rows,),
            in_specs=[spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((N, H), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
        )(x, res)

    results = {}
    results["copy-anchor        fwd"] = _bench(_chain(copy_op), x, res)
    results["fused rate=0       fwd"] = _bench(_chain(fused_op(0.0)), x, res)
    results["fused rate=0.1     fwd"] = _bench(_chain(fused_op(0.1)), x, res)
    results["xla   rate=0.1     fwd"] = _bench(_chain(xla_op), x, res)
    results["fused rate=0   fwd+bwd"] = _bench(_chain_grad(fused_op(0.0)), x, res)
    results["fused rate=0.1 fwd+bwd"] = _bench(_chain_grad(fused_op(0.1)), x, res)
    results["xla   rate=0.1 fwd+bwd"] = _bench(_chain_grad(xla_op), x, res)

    # row-block sweep on the production kernel (monkeypatch the module's
    # block policy; powers of two only, VMEM-checked by mosaic itself)
    orig = fused_ln._block_rows
    for rows in (128, 256, 512):
        fused_ln._block_rows = lambda h, _r=rows: _r
        try:
            results[f"fused rows={rows:<4} fwd+bwd"] = _bench(
                _chain_grad(fused_op(0.1)), x, res
            )
        except Exception as e:  # VMEM OOM etc. — record and continue
            results[f"fused rows={rows:<4} fwd+bwd"] = float("nan")
            print(f"  rows={rows} failed: {type(e).__name__}: {e}")
        finally:
            fused_ln._block_rows = orig

    print(f"[N={N}, H={H}] bf16, {CALLS}-call chain, {STEPS}-step mean")
    for name, ms in results.items():
        print(f"  {name:26s} {ms:8.2f} ms/chain  ({ms / CALLS:6.3f} ms/call)")


if __name__ == "__main__":
    main()
