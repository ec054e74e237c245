"""Chip-compile the TP/SP PER-SHARD Pallas kernel shapes (VERDICT r4
item 4).

Round 4's lesson (CLAUDE.md): CPU interpret-mode tests cannot catch
mosaic VMEM limits — any Pallas grid variant must be compile-checked on
the real chip before it ships as a default. The TP/SP shard_map wrappers
(parallel/tp.py) run the SAME kernels at per-shard shapes that had only
ever compiled in interpret mode:

- TP-2: fused attention block with local heads 6, per-shard projection
  width P = 384 (still the selected impl — block_supported passes);
- TP-4: P = 192 is NOT 128-lane aligned, so dispatch falls back to the
  per-head flash kernel at 3 local heads (asserted here against
  models/albert._resolve-style logic);
- SP: the fused dropout+add+LN kernel at L/m-sharded row counts;
- plus the tp.py shard_map wrappers themselves driven end-to-end
  (fwd + bwd) on a 1-device mesh — shard_map-wrapped pallas_call with a
  real psum/psum_scatter lowering on hardware.

A single chip CAN compile per-shard-shaped kernels directly: mosaic
compiles the kernel the shard would run; only the cross-chip collective
needs more devices (that part is dryrun-validated on the virtual mesh).

Every shape runs forward AND backward (training uses the VJPs), checks
values against an XLA reference composition at bf16 tolerance, and
reports the mean step wall through the tunnel. Prints ONE JSON line for
BENCH_LEDGER.jsonl (onchip_batch.sh item `shardkernels`).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, L, E, HD = 96, 512, 768, 64
HEADS = E // HD  # 12


def _ref_attention_block(hidden, wq, bq, wk, bk, wv, bv, wo, bo, heads,
                         bias):
    """XLA composition of the fused block at matching dtypes: bf16
    matmuls with fp32 softmax — the kernel's numeric contract
    (ops/attention_block.py)."""
    x = hidden.astype(jnp.bfloat16)
    P = wq.shape[1]
    hd = P // heads

    def proj(w, b):
        y = jax.lax.dot_general(
            x, w.astype(jnp.bfloat16), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b
        return y.astype(jnp.bfloat16).reshape(B, L, heads, hd)

    q, k, v = proj(wq, bq), proj(wk, bk), proj(wv, bv)
    s = jnp.einsum(
        "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / np.sqrt(hd))
    s = s + bias[:, :, 0, :][:, None, :, :] if bias is not None else s
    p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    ctx = jnp.einsum(
        "bhlm,bmhd->blhd", p, v, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16).reshape(B, L, P)
    out = jax.lax.dot_general(
        ctx, wo.astype(jnp.bfloat16), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo
    return out.astype(jnp.float32)


def _timed(fn, *args, iters: int = 5):
    out = fn(*args)
    jax.block_until_ready(out)
    # host read forces the tunnel round trip (CLAUDE.md:
    # block_until_ready does not synchronize under axon)
    float(jnp.asarray(out[0] if isinstance(out, tuple) else out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(out[0] if isinstance(out, tuple) else out).ravel()[0])
    return out, (time.perf_counter() - t0) / iters * 1e3


def check_attention_block(m: int, results: dict) -> None:
    """Fused block kernel at the TP-m per-shard shape, fwd + bwd."""
    from pl_bert_tpu.ops.attention import fused_block_supported
    from pl_bert_tpu.ops.attention_block import attention_block

    heads, P = HEADS // m, E // m
    name = f"attention_block_tp{m}"
    supported = fused_block_supported(L, heads, HD, global_width=E)
    if not supported:
        # TP-4: P=192 is not 128-lane aligned — dispatch must refuse
        # (albert._resolve falls back to the flash kernel, checked in
        # check_flash); compiling it anyway would be the bug
        results[name] = {"supported": False}
        return

    rng = np.random.default_rng(m)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
    hidden = f32(B, L, E).astype(jnp.bfloat16)
    wq, wk, wv = f32(E, P), f32(E, P), f32(E, P)
    bq, bk, bv = f32(P), f32(P), f32(P)
    wo, bo = f32(P, E), f32(E)
    lengths = np.full(B, L, np.int32)
    lengths[: B // 2] = L - 64  # some padding rows: exercises the bias
    bias = jnp.asarray(
        np.where(np.arange(L)[None, :] < lengths[:, None], 0.0, -1e9)[
            :, None, None, :
        ],
        jnp.float32,
    )

    def fwd(h, *w):
        return attention_block(
            h, *w, num_heads=heads, bias=bias, out_dtype=jnp.float32
        )

    def loss(h, *w):
        return jnp.sum(fwd(h, *w) ** 2)

    args = (hidden, wq, bq, wk, bk, wv, bv, wo, bo)
    out, fwd_ms = _timed(jax.jit(fwd), *args)
    ref = jax.jit(_ref_attention_block, static_argnums=(9,))(
        *args, heads, bias
    )
    # bf16 matmuls: compare at bf16-scale tolerance on the valid rows
    valid = np.arange(L)[None, :] < lengths[:, None]
    diff = np.abs(np.asarray(out) - np.asarray(ref))[valid]
    scale = np.abs(np.asarray(ref))[valid].max()
    g, grad_ms = _timed(
        jax.jit(jax.grad(loss, argnums=(0, 1, 7))), *args
    )
    results[name] = {
        "supported": True,
        "fwd_ms": round(fwd_ms, 3),
        "fwd_bwd_ms": round(grad_ms, 3),
        "max_abs_err": float(diff.max()),
        "err_ok": bool(diff.max() < 0.02 * max(scale, 1.0)),
        "grads_finite": bool(
            all(np.isfinite(np.asarray(x)).all() for x in g)
        ),
    }


def check_flash(m: int, results: dict) -> None:
    """Per-head flash kernel at TP-m local head count, fwd + bwd."""
    from pl_bert_tpu.ops.flash_attention import flash_attention

    heads = HEADS // m
    rng = np.random.default_rng(10 + m)
    f = lambda *s: jnp.asarray(
        rng.standard_normal(s) * 0.05, jnp.bfloat16
    )
    q, k, v = f(B, L, heads, HD), f(B, L, heads, HD), f(B, L, heads, HD)

    def loss(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, out_dtype=jnp.float32) ** 2
        )

    out, fwd_ms = _timed(
        jax.jit(lambda *a: flash_attention(*a, out_dtype=jnp.float32)),
        q, k, v,
    )
    s = jnp.einsum(
        "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / np.sqrt(HD))
    p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    ref = jnp.einsum(
        "bhlm,bmhd->blhd", p, v, preferred_element_type=jnp.float32
    )
    err = float(np.abs(np.asarray(out) - np.asarray(ref)).max())
    g, grad_ms = _timed(jax.jit(jax.grad(loss, argnums=(0, 1, 2))), q, k, v)
    results[f"flash_tp{m}"] = {
        "supported": True,
        "fwd_ms": round(fwd_ms, 3),
        "fwd_bwd_ms": round(grad_ms, 3),
        "max_abs_err": err,
        "err_ok": bool(err < 0.02),
        "grads_finite": bool(
            all(np.isfinite(np.asarray(x)).all() for x in g)
        ),
    }


def check_fused_ln(m: int, results: dict) -> None:
    """Fused dropout+add+LN at the SP row count: B·L/m rows per shard
    (model axis shards the sequence under sequence parallelism)."""
    from pl_bert_tpu.ops.fused_ln import (
        _block_rows, dropout_add_layernorm, fused_supported,
    )

    rows = B * L // m
    name = f"fused_ln_sp{m}"
    if not fused_supported(rows, E):
        results[name] = {
            "supported": False, "rows": rows, "block_rows": _block_rows(E)
        }
        return
    rng = np.random.default_rng(20 + m)
    x = jnp.asarray(rng.standard_normal((rows, E)) * 0.1, jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((rows, E)) * 0.1, jnp.bfloat16)
    gamma = jnp.ones(E, jnp.float32)
    beta = jnp.zeros(E, jnp.float32)
    seed = jnp.zeros((1,), jnp.int32)

    def loss(x, res, gamma, beta):
        return jnp.sum(
            dropout_add_layernorm(x, res, gamma, beta, seed, 0.1, 1e-12)
            .astype(jnp.float32) ** 2
        )

    out, fwd_ms = _timed(
        jax.jit(
            lambda *a: dropout_add_layernorm(*a, None, 0.0, 1e-12)
        ),
        x, res, gamma, beta,
    )
    h = (x + res).astype(jnp.float32)
    mu = h.mean(-1, keepdims=True)
    ref = (h - mu) / jnp.sqrt(h.var(-1, keepdims=True) + 1e-12)
    err = float(np.abs(np.asarray(out, np.float32) - np.asarray(ref)).max())
    g, grad_ms = _timed(
        jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3))), x, res, gamma, beta
    )
    results[name] = {
        "supported": True,
        "rows": rows,
        "fwd_ms": round(fwd_ms, 3),
        "fwd_bwd_ms": round(grad_ms, 3),
        "max_abs_err": err,
        "err_ok": bool(err < 0.05),  # bf16 inputs, fp32 LN math
        "grads_finite": bool(
            all(np.isfinite(np.asarray(x)).all() for x in g)
        ),
    }


def check_shard_map_wrappers(results: dict) -> None:
    """Drive parallel/tp.py's shard_map wrappers end-to-end (fwd+bwd) on
    a 1-device mesh on the real chip: shard_map-wrapped pallas_call with
    the psum / psum_scatter combine actually lowering on hardware."""
    from pl_bert_tpu.parallel.mesh import make_mesh
    from pl_bert_tpu.parallel.tp import (
        tp_attention_block, tp_dropout_add_layernorm, tp_flash_attention,
    )

    mesh = make_mesh(1, 1)
    rng = np.random.default_rng(33)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
    hidden = f32(B, L, E).astype(jnp.bfloat16)
    weights = (f32(E, E), f32(E), f32(E, E), f32(E), f32(E, E), f32(E),
               f32(E, E), f32(E))

    def loss_block(h, *w):
        return jnp.sum(
            tp_attention_block(
                mesh, h, *w, num_heads=HEADS, out_dtype=jnp.float32
            ).astype(jnp.float32) ** 2
        )

    _, blk_ms = _timed(jax.jit(jax.grad(loss_block)), hidden, *weights)

    q = f32(B, L, HEADS, HD).astype(jnp.bfloat16)

    def loss_flash(q):
        return jnp.sum(
            tp_flash_attention(mesh, q, q, q, out_dtype=jnp.float32)
            .astype(jnp.float32) ** 2
        )

    _, fl_ms = _timed(jax.jit(jax.grad(loss_flash)), q)

    x = f32(B, L, E).astype(jnp.bfloat16)
    seed = jnp.zeros((1,), jnp.int32)

    def loss_ln(x):
        return jnp.sum(
            tp_dropout_add_layernorm(
                mesh, x, x, jnp.ones(E, jnp.float32),
                jnp.zeros(E, jnp.float32), seed, 0.1, 1e-12,
            ).astype(jnp.float32) ** 2
        )

    _, ln_ms = _timed(jax.jit(jax.grad(loss_ln)), x)
    results["shard_map_1dev"] = {
        "supported": True,
        "attention_block_fwd_bwd_ms": round(blk_ms, 3),
        "flash_fwd_bwd_ms": round(fl_ms, 3),
        "fused_ln_fwd_bwd_ms": round(ln_ms, 3),
    }


def main() -> None:
    dev = jax.devices()[0]
    results: dict = {"device": str(dev.platform)}
    for m in (1, 2, 4):
        check_attention_block(m, results)
        check_flash(m, results)
        check_fused_ln(m, results)
        print(f"[shardkernels] tp{m} done", flush=True)
    check_shard_map_wrappers(results)
    checks = [
        v for v in results.values()
        if isinstance(v, dict) and v.get("supported")
    ]
    ok = all(
        v.get("err_ok", True) and v.get("grads_finite", True)
        for v in checks
    )
    # TP-4's fused block MUST be refused (P=192 unaligned) — a kernel
    # compiled there means the dispatch guard regressed
    ok = ok and results["attention_block_tp4"] == {"supported": False}
    print(json.dumps({
        "metric": "tp_shard_kernel_chip_compile",
        "value": 1.0 if ok else 0.0,
        "unit": "ok",
        "vs_baseline": 1.0 if ok else 0.0,
        **results,
    }), flush=True)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
