"""Benchmark this build's flash-attention kernel against the stock JAX
Pallas TPU flash-attention kernel (jax.experimental.pallas.ops.tpu).

Evidence for the perf ledger: the round-2 layout search concluded
~4 ms/layer forward is the mosaic plateau for [96, 512, 768]/hd64
(CLAUDE.md); this pits the tuned stock kernel that ships with JAX
against ours on the SAME real chip to show where that plateau sits
relative to the ecosystem baseline.

Methodology (tunnel-aware, matches the round-2 layout search): chain
``LAYERS`` data-dependent applications inside ONE jit and do ONE scalar
host read per step — a per-call host read would swamp the kernel in
axon-tunnel round-trip latency (CLAUDE.md: block_until_ready does not
synchronize under axon). Reported per-layer times therefore include
1/LAYERS of a tunnel RTT (~sub-ms), identically for both kernels.

Run on the TPU rig: ``python tools/compare_stock_flash.py``
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, L, H, D = 96, 512, 12, 64
LAYERS = 12
STEPS = 10


def _bench(step_fn, *args):
    float(step_fn(*args))  # compile + first sync
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(STEPS):
        acc += float(step_fn(*args))
    dt = (time.perf_counter() - t0) / STEPS
    assert np.isfinite(acc)
    return dt * 1e3 / LAYERS  # ms per layer-equivalent


def _chain(attn):
    """q feeds forward through LAYERS dependent attention applications —
    one jit, one scalar out."""

    def step(q, k, v):
        for _ in range(LAYERS):
            q = attn(q, k, v).astype(q.dtype)
        return q.astype(jnp.float32).mean()

    return jax.jit(step)


def _chain_grad(attn):
    def loss(q, k, v):
        x = q
        for _ in range(LAYERS):
            x = attn(x, k, v).astype(x.dtype)
        return x.astype(jnp.float32).mean()

    g = jax.grad(loss)

    @jax.jit
    def step(q, k, v):
        return g(q, k, v).astype(jnp.float32).mean()

    return step


def main() -> None:
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention as stock_flash,
    )

    from pl_bert_tpu.ops.flash_attention import flash_attention as ours

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.bfloat16)
    qh, kh, vh = (x.transpose(0, 2, 1, 3) for x in (q, k, v))

    default_blocks = BlockSizes.get_default(B, H, L, L, D)
    # best config from a block-size sweep on the v5e chip (full-sequence
    # 512 blocks everywhere; 256/128-block variants measured 5.97 and
    # 6.10 ms/layer fwd) — give the stock kernel its best shot
    full = dict.fromkeys(
        (
            "block_q", "block_k_major", "block_k", "block_q_major_dkv",
            "block_k_major_dkv", "block_k_dkv", "block_q_dkv",
            "block_k_major_dq", "block_k_dq", "block_q_dq",
        ),
        512,
    )
    tuned_blocks = BlockSizes(block_b=1, **full)

    def stock_default(q, k, v):
        return stock_flash(q, k, v, block_sizes=default_blocks)

    def stock_tuned(q, k, v):
        return stock_flash(q, k, v, block_sizes=tuned_blocks)

    print(
        f"shape [B={B}, L={L}, H={H}, D={D}] bf16, {LAYERS}-layer chain, "
        f"{STEPS}-step mean, ms/layer"
    )
    r = {}
    r["stock-default fwd"] = _bench(_chain(stock_default), qh, kh, vh)
    r["stock-tuned   fwd"] = _bench(_chain(stock_tuned), qh, kh, vh)
    r["ours          fwd"] = _bench(_chain(ours), q, k, v)
    r["stock-default fwd+bwd"] = _bench(_chain_grad(stock_default), qh, kh, vh)
    r["stock-tuned   fwd+bwd"] = _bench(_chain_grad(stock_tuned), qh, kh, vh)
    r["ours          fwd+bwd"] = _bench(_chain_grad(ours), q, k, v)
    for name, ms in r.items():
        print(f"  {name:22s} {ms:8.3f} ms/layer")
    print(
        "ratios (stock-tuned/ours): "
        f"fwd {r['stock-tuned   fwd'] / r['ours          fwd']:.2f}x, "
        f"fwd+bwd {r['stock-tuned   fwd+bwd'] / r['ours          fwd+bwd']:.2f}x"
    )


if __name__ == "__main__":
    main()
