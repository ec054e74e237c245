"""Fused attention block: QKV projection + flash attention + output
projection in ONE Pallas kernel, transpose-free.

Round-1 profiling attributed ~13% of step time to [B, L, H, D] ↔
[B·H, L, D] layout transposes around the per-head flash kernel
(ops/flash_attention.py) and 16.6% to its backward, which recomputed the
softmax max/denominator. This kernel removes both costs:

- Activations stay in the model's natural [B, L, E] layout end to end.
  Heads live in the lane dimension; a grid program processes one
  (batch item, head pair) and slices its two 64-lane head windows
  statically — no relayouts anywhere.
- The Q/K/V projections and the output projection run INSIDE the kernel
  as [L, E] × [E, 128] / [L, 128] × [128, E] matmuls (full 128-wide MXU
  utilization), so q/k/v/context never round-trip HBM at all. The
  output block is revisited across the head-pair grid dimension and
  accumulated in an fp32 VMEM scratch.
- The forward saves per-row softmax (max, denom) residuals
  ([B, G, L, 8] fp32, ~9 MB for the flagship shape) so the backward
  skips both reductions and reproduces the forward's probabilities
  bitwise from one matmul + exp.
- Primal-only calls (eval/serving — jax invokes the custom-VJP primal,
  not fwd, when nothing differentiates the block) run a LIGHT variant
  of the same kernel with no residual outputs at all: the saving
  forward's md + q2/k2/v2/o2 stores are ~300 MB/layer of dead HBM
  writes at the flagship serving shape.

Replaces the HF attention path of the reference (reference:
model.py:23-28 via transformers AlbertAttention), which materializes
q/k/v/scores/probs in HBM.

Attention-prob dropout (HF Albert semantics) runs inside the kernel via
the on-chip PRNG seeded per (batch, head); the backward regenerates the
identical mask from the same seed instead of storing [B, H, L, L] bits.

Weight-gradient contractions (dWq = xᵀ dq, …) happen OUTSIDE the kernel
as plain XLA einsums over the kernel's saved per-head-pair gradients —
they are full-width [E, B·L] × [B·L, E] matmuls XLA already schedules
optimally, and keeping them out avoids a second accumulation grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128  # MXU/VPU lane width; one program owns one 128-lane head group


def block_supported(
    seq_len: int, num_heads: int, head_dim: int, global_width: int = 0
) -> bool:
    """Shapes the fused block kernel handles: tile-aligned sequence and
    head groups that fill the 128-lane MXU width exactly, with the
    weight-resident VMEM working set in budget.

    ``global_width``: the FULL embedding width E when the caller passes
    per-shard projections (tensor parallelism: ``num_heads`` is the
    local count, weights are [E, P] with P = E/m — the VMEM footprint
    scales with E·P, not P²). Defaults to the single-shard case P = E.
    """
    if head_dim not in (64, 128):
        return False
    emb = num_heads * head_dim  # P: this shard's projection width
    if emb % _LANES:
        return False
    gw = global_width or emb
    if emb * gw > 1024 * 1024:
        # the kernel keeps all four [E, P] bf16 projection weights
        # VMEM-resident; measured on v5e the working set fits at
        # E=P=1024 (51.8k tok/s, 68.9% MFU at 24 layers) but exceeds
        # the 16MB scoped limit at E=P=2048 (compile-time VMEM OOM,
        # +851K over) — wider E·P products use the per-head flash
        # kernel, whose VMEM use is E-independent
        return False
    return seq_len % 128 == 0


def _heads_per_group(head_dim: int) -> int:
    return _LANES // head_dim


def _attend_one_head(qh, kh, bias, seg, *, scale, use_segments):
    """[L, D] bf16 q/k → (probs fp32 [L, L], row max [L,1], denom [L,1]);
    the p·v contraction happens at the call site."""
    s = jax.lax.dot_general(
        qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + bias[None, :]
    if use_segments:
        s = jnp.where(seg[:, None] != seg[None, :], _NEG, s)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    d = jnp.sum(e, axis=-1, keepdims=True)
    return e / d, m, d


def _dropout(p, seed_ref, head_index, *, rate: float):
    """Multiplicative dropout on attention probs; the (seed, head_index)
    pair fully determines the mask so fwd and bwd regenerate it
    identically. KEEP IN SYNC with flash_attention._dropout (same
    threshold semantics, stream index derived differently) — both
    kernels are deliberately self-contained rather than sharing a
    helper, so a change here must be mirrored there."""
    pltpu.prng_seed(seed_ref[0] + head_index)
    bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32)
    keep = bits > jnp.uint32(rate * (2**32))
    return jnp.where(keep, p / (1.0 - rate), 0.0)


def _fwd_kernel(
    x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    bias_ref, seg_ref, seed_ref,
    out_ref, md_ref, q2_ref, k2_ref, v2_ref, o2_ref,
    acc_ref,
    *, scale: float, use_segments: bool, rate: float, heads: int,
):
    g = pl.program_id(1)
    n_groups = pl.num_programs(1)
    x = x_ref[0]  # [L, E]
    cdt = x.dtype

    q2 = (
        jnp.dot(x, wq_ref[...], preferred_element_type=jnp.float32)
        + bq_ref[0][None, :]
    ).astype(cdt)  # [L, 128]
    k2 = (
        jnp.dot(x, wk_ref[...], preferred_element_type=jnp.float32)
        + bk_ref[0][None, :]
    ).astype(cdt)
    v2 = (
        jnp.dot(x, wv_ref[...], preferred_element_type=jnp.float32)
        + bv_ref[0][None, :]
    ).astype(cdt)
    # save the projected activations: the backward kernel reads them
    # instead of redoing three [L, E] × [E, 128] matmuls per program
    q2_ref[0] = q2
    k2_ref[0] = k2
    v2_ref[0] = v2

    bias = bias_ref[0, 0]
    seg = seg_ref[0, 0]
    head_dim = _LANES // heads

    outs = []
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        p, m, d = _attend_one_head(
            q2[:, sl], k2[:, sl], bias, seg,
            scale=scale, use_segments=use_segments,
        )
        md_ref[0, 0, :, 2 * h] = m[:, 0]
        md_ref[0, 0, :, 2 * h + 1] = d[:, 0]
        if rate > 0.0:
            p = _dropout(
                p, seed_ref, pl.program_id(0) * (n_groups * heads) + g * heads + h,
                rate=rate,
            )
        o = jnp.dot(
            p.astype(cdt), v2[:, sl], preferred_element_type=jnp.float32
        )  # [L, D]
        outs.append(o)
    o2 = jnp.concatenate(outs, axis=-1).astype(cdt)  # [L, 128]
    o2_ref[0] = o2  # saved for the dWo contraction in backward
    proj = jnp.dot(o2, wo_ref[...], preferred_element_type=jnp.float32)  # [L, E]

    @pl.when(g == 0)
    def _():
        acc_ref[...] = proj

    @pl.when(g > 0)
    def _():
        acc_ref[...] = acc_ref[...] + proj

    @pl.when(g == n_groups - 1)
    def _():
        out_ref[0] = (acc_ref[...] + bo_ref[0][None, :]).astype(out_ref.dtype)


def _fwd_kernel_light(
    x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    bias_ref, seg_ref, seed_ref,
    out_ref,
    acc_ref,
    *, scale: float, use_segments: bool, rate: float, heads: int,
):
    """``_fwd_kernel`` minus the backward residuals — the primal-only
    (never-differentiated) path: eval and serving. The saving forward
    writes md + q2/k2/v2/o2 ([B,G,L,8] + 4×[B,L,P]) to HBM every call —
    ~300 MB/layer of dead stores at the flagship serving shape when no
    backward will ever read them. KEEP THE MATH IN SYNC with
    ``_fwd_kernel``: the custom-VJP contract is that primal and fwd
    return identical values."""
    g = pl.program_id(1)
    n_groups = pl.num_programs(1)
    x = x_ref[0]  # [L, E]
    cdt = x.dtype

    q2 = (
        jnp.dot(x, wq_ref[...], preferred_element_type=jnp.float32)
        + bq_ref[0][None, :]
    ).astype(cdt)  # [L, 128]
    k2 = (
        jnp.dot(x, wk_ref[...], preferred_element_type=jnp.float32)
        + bk_ref[0][None, :]
    ).astype(cdt)
    v2 = (
        jnp.dot(x, wv_ref[...], preferred_element_type=jnp.float32)
        + bv_ref[0][None, :]
    ).astype(cdt)

    bias = bias_ref[0, 0]
    seg = seg_ref[0, 0]
    head_dim = _LANES // heads

    outs = []
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        p, _, _ = _attend_one_head(
            q2[:, sl], k2[:, sl], bias, seg,
            scale=scale, use_segments=use_segments,
        )
        if rate > 0.0:
            p = _dropout(
                p, seed_ref, pl.program_id(0) * (n_groups * heads) + g * heads + h,
                rate=rate,
            )
        o = jnp.dot(
            p.astype(cdt), v2[:, sl], preferred_element_type=jnp.float32
        )  # [L, D]
        outs.append(o)
    o2 = jnp.concatenate(outs, axis=-1).astype(cdt)  # [L, 128]
    proj = jnp.dot(o2, wo_ref[...], preferred_element_type=jnp.float32)  # [L, E]

    @pl.when(g == 0)
    def _():
        acc_ref[...] = proj

    @pl.when(g > 0)
    def _():
        acc_ref[...] = acc_ref[...] + proj

    @pl.when(g == n_groups - 1)
    def _():
        out_ref[0] = (acc_ref[...] + bo_ref[0][None, :]).astype(out_ref.dtype)


def _fwd_kernel_light_full(
    x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    bias_ref, seg_ref, seed_ref,
    out_ref,
    *, scale: float, use_segments: bool, rate: float, heads: int,
    groups: int,
):
    """Fullwidth variant of ``_fwd_kernel_light``: grid (B,) — one
    program projects the full [L, P] q/k/v, attends every head, and
    writes the output directly (no cross-group accumulator staging, no
    output-block revisits). Round-2 microbench measured this grid 15%
    faster forward (3.52 vs 4.16 ms/layer at the flagship shape) but it
    VMEM-OOMs with backward-residual saves — which the light path does
    not have. Dropout stream indices replicate the grouped kernel's
    (b·G·heads + g·heads + h) numbering so masks are identical across
    variants."""
    x = x_ref[0]  # [L, E]
    cdt = x.dtype

    q2 = (
        jnp.dot(x, wq_ref[...], preferred_element_type=jnp.float32)
        + bq_ref[0][None, :]
    ).astype(cdt)  # [L, P]
    k2 = (
        jnp.dot(x, wk_ref[...], preferred_element_type=jnp.float32)
        + bk_ref[0][None, :]
    ).astype(cdt)
    v2 = (
        jnp.dot(x, wv_ref[...], preferred_element_type=jnp.float32)
        + bv_ref[0][None, :]
    ).astype(cdt)

    bias = bias_ref[0, 0]
    seg = seg_ref[0, 0]
    head_dim = _LANES // heads

    outs = []
    for g in range(groups):
        for h in range(heads):
            lo = g * _LANES + h * head_dim
            sl = slice(lo, lo + head_dim)
            p, _, _ = _attend_one_head(
                q2[:, sl], k2[:, sl], bias, seg,
                scale=scale, use_segments=use_segments,
            )
            if rate > 0.0:
                p = _dropout(
                    p, seed_ref,
                    pl.program_id(0) * (groups * heads) + g * heads + h,
                    rate=rate,
                )
            outs.append(
                jnp.dot(
                    p.astype(cdt), v2[:, sl],
                    preferred_element_type=jnp.float32,
                )
            )
    o2 = jnp.concatenate(outs, axis=-1).astype(cdt)  # [L, P]
    proj = jnp.dot(o2, wo_ref[...], preferred_element_type=jnp.float32)
    out_ref[0] = (proj + bo_ref[0][None, :]).astype(out_ref.dtype)


def _bwd_kernel(
    wq_ref, wk_ref, wv_ref, wo_ref,
    bias_ref, seg_ref, seed_ref, md_ref, q2_ref, k2_ref, v2_ref, dout_ref,
    dx_ref, dq2_ref, dk2_ref, dv2_ref,
    acc_ref,
    *, scale: float, use_segments: bool, rate: float, heads: int,
):
    g = pl.program_id(1)
    n_groups = pl.num_programs(1)
    dout = dout_ref[0]  # [L, E]
    cdt = dout.dtype

    q2 = q2_ref[0]  # [L, 128] — saved by the forward kernel
    k2 = k2_ref[0]
    v2 = v2_ref[0]
    # do2 = dout · woᵀ — grad at this head group's attention output
    do2 = jax.lax.dot_general(
        dout, wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt)  # [L, 128]

    bias = bias_ref[0, 0]
    seg = seg_ref[0, 0]
    head_dim = _LANES // heads

    dqs, dks, dvs = [], [], []
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh, kh, vh = q2[:, sl], k2[:, sl], v2[:, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = s + bias[None, :]
        if use_segments:
            s = jnp.where(seg[:, None] != seg[None, :], _NEG, s)
        # saved residuals: skip the max/sum reductions, reproduce the
        # forward's probabilities bitwise
        m = md_ref[0, 0, :, 2 * h][:, None]
        d = md_ref[0, 0, :, 2 * h + 1][:, None]
        p = jnp.exp(s - m) / d
        if rate > 0.0:
            pd = _dropout(
                p, seed_ref, pl.program_id(0) * (n_groups * heads) + g * heads + h,
                rate=rate,
            )
        else:
            pd = p
        pd_lp = pd.astype(cdt)
        doh = do2[:, sl]
        dv = jax.lax.dot_general(
            pd_lp, doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dpd = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(dpd * pd, axis=-1, keepdims=True)
        ds = ((pd * dpd - p * delta) * scale).astype(cdt)
        dq = jnp.dot(ds, kh, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)

    dq2 = jnp.concatenate(dqs, axis=-1).astype(cdt)  # [L, 128]
    dk2 = jnp.concatenate(dks, axis=-1).astype(cdt)
    dv2 = jnp.concatenate(dvs, axis=-1).astype(cdt)
    dq2_ref[0] = dq2
    dk2_ref[0] = dk2
    dv2_ref[0] = dv2

    # dx contribution of this head group through all three projections
    dx = jax.lax.dot_general(
        dq2, wq_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx = dx + jax.lax.dot_general(
        dk2, wk_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx = dx + jax.lax.dot_general(
        dv2, wv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(g == 0)
    def _():
        acc_ref[...] = dx

    @pl.when(g > 0)
    def _():
        acc_ref[...] = acc_ref[...] + dx

    @pl.when(g == n_groups - 1)
    def _():
        dx_ref[0] = acc_ref[...].astype(dx_ref.dtype)


def _specs(B: int, L: int, E: int):
    x = pl.BlockSpec((1, L, E), lambda b, g: (b, 0, 0), memory_space=pltpu.VMEM)
    w_in = pl.BlockSpec((E, _LANES), lambda b, g: (0, g), memory_space=pltpu.VMEM)
    b_in = pl.BlockSpec((1, _LANES), lambda b, g: (0, g), memory_space=pltpu.VMEM)
    w_out = pl.BlockSpec((_LANES, E), lambda b, g: (g, 0), memory_space=pltpu.VMEM)
    b_out = pl.BlockSpec((1, E), lambda b, g: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, 1, L), lambda b, g: (b, 0, 0), memory_space=pltpu.VMEM)
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    md = pl.BlockSpec((1, 1, L, 8), lambda b, g: (b, g, 0, 0), memory_space=pltpu.VMEM)
    group = pl.BlockSpec((1, L, _LANES), lambda b, g: (b, 0, g), memory_space=pltpu.VMEM)
    return x, w_in, b_in, w_out, b_out, row, seed, md, group


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15))
def _block(
    hidden, wq, bq, wk, bk, wv, bv, wo, bo, bias_row, seg_row, seed,
    out_dtype, use_segments, rate, heads,
):
    # primal-only path (eval/serving — jax only calls this when the
    # block is NOT differentiated): the light kernel, no residual stores
    return _block_fwd_light(
        hidden, wq, bq, wk, bk, wv, bv, wo, bo, bias_row, seg_row, seed,
        out_dtype, use_segments, rate, heads,
    )


def _fullwidth_light_ok(L: int, E: int, P: int, itemsize: int) -> bool:
    """Shapes where the fullwidth (B,)-grid light kernel's VMEM working
    set (four [E, P] weights + six [L, P] activations + per-head [L, L]
    temporaries, NO residual saves) fits: measured on v5e at
    L=512/E=P=768 in bf16. In fp32 the same shape needs 22.93M scoped
    VMEM > the 16M limit (chip-measured compile OOM, round 4 — fp32
    reaches here via flax param init, whose one tracing forward runs at
    param dtype) — wider-than-2-byte compute falls back to the grouped
    grid, whose per-program set is per-128-lane-group. Opt in/out with
    PLBERT_ATTN_FULLWIDTH (default on for supported shapes; '0' forces
    the grouped grid for A/Bs)."""
    import os

    if os.environ.get("PLBERT_ATTN_FULLWIDTH", "1") == "0":
        return False
    return L <= 512 and E * P <= 768 * 768 and itemsize <= 2


def _block_fwd_light(
    hidden, wq, bq, wk, bk, wv, bv, wo, bo, bias_row, seg_row, seed,
    out_dtype, use_segments, rate, heads,
):
    B, L, E = hidden.shape
    P = wq.shape[1]
    G = P // _LANES
    scale = 1.0 / ((_LANES // heads) ** 0.5)
    cdt = hidden.dtype
    wq_c, wk_c, wv_c, wo_c = (w.astype(cdt) for w in (wq, wk, wv, wo))
    bq_r = bq.reshape(1, P).astype(jnp.float32)
    bk_r = bk.reshape(1, P).astype(jnp.float32)
    bv_r = bv.reshape(1, P).astype(jnp.float32)
    bo_r = bo.reshape(1, E).astype(jnp.float32)

    x, w_in, b_in, w_out, b_out, row, seed_s, _, _ = _specs(B, L, E)
    cost = pl.CostEstimate(
        flops=2 * B * L * P * (4 * E + 2 * L),
        bytes_accessed=B * L * E * 4 + B * E * P * 8,
        transcendentals=B * G * heads * L * L,
    )
    args = (
        hidden, wq_c, bq_r, wk_c, bk_r, wv_c, bv_r, wo_c, bo_r,
        bias_row, seg_row, seed,
    )
    if _fullwidth_light_ok(L, E, P, jnp.dtype(cdt).itemsize):
        xf = pl.BlockSpec((1, L, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        wf_in = pl.BlockSpec((E, P), lambda b: (0, 0), memory_space=pltpu.VMEM)
        bf_in = pl.BlockSpec((1, P), lambda b: (0, 0), memory_space=pltpu.VMEM)
        wf_out = pl.BlockSpec((P, E), lambda b: (0, 0), memory_space=pltpu.VMEM)
        bf_out = pl.BlockSpec((1, E), lambda b: (0, 0), memory_space=pltpu.VMEM)
        rowf = pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        seedf = pl.BlockSpec(memory_space=pltpu.SMEM)
        (out,) = pl.pallas_call(
            functools.partial(
                _fwd_kernel_light_full, scale=scale,
                use_segments=use_segments, rate=rate, heads=heads, groups=G,
            ),
            grid=(B,),
            in_specs=[xf, wf_in, bf_in, wf_in, bf_in, wf_in, bf_in,
                      wf_out, bf_out, rowf, rowf, seedf],
            out_specs=[xf],
            out_shape=[jax.ShapeDtypeStruct((B, L, E), out_dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                # the bf16 working set is 16.31M with an fp32 out block
                # — 320K over mosaic's DEFAULT 16M scoped cap (v5e has
                # 128M VMEM/core; chip-measured compile OOM, round 4)
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            cost_estimate=cost,
        )(*args)
        return out
    (out,) = pl.pallas_call(
        functools.partial(
            _fwd_kernel_light, scale=scale, use_segments=use_segments,
            rate=rate, heads=heads,
        ),
        grid=(B, G),
        in_specs=[x, w_in, b_in, w_in, b_in, w_in, b_in, w_out, b_out,
                  row, row, seed_s],
        out_specs=[x],
        out_shape=[jax.ShapeDtypeStruct((B, L, E), out_dtype)],
        scratch_shapes=[pltpu.VMEM((L, E), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=cost,
    )(*args)
    return out


def _block_fwd(
    hidden, wq, bq, wk, bk, wv, bv, wo, bo, bias_row, seg_row, seed,
    out_dtype, use_segments, rate, heads,
):
    B, L, E = hidden.shape
    # projection width P may be narrower than E (tensor parallelism:
    # each model shard holds a column slice of wq/wk/wv and the matching
    # row slice of wo — parallel/tp.py psums the partial outputs)
    P = wq.shape[1]
    G = P // _LANES
    scale = 1.0 / ((_LANES // heads) ** 0.5)
    cdt = hidden.dtype
    wq_c, wk_c, wv_c, wo_c = (w.astype(cdt) for w in (wq, wk, wv, wo))
    bq_r = bq.reshape(1, P).astype(jnp.float32)
    bk_r = bk.reshape(1, P).astype(jnp.float32)
    bv_r = bv.reshape(1, P).astype(jnp.float32)
    bo_r = bo.reshape(1, E).astype(jnp.float32)

    x, w_in, b_in, w_out, b_out, row, seed_s, md_s, group = _specs(B, L, E)
    act = jax.ShapeDtypeStruct((B, L, P), cdt)
    out, md, q2s, k2s, v2s, o2s = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, use_segments=use_segments, rate=rate,
            heads=heads,
        ),
        grid=(B, G),
        in_specs=[x, w_in, b_in, w_in, b_in, w_in, b_in, w_out, b_out,
                  row, row, seed_s],
        out_specs=[x, md_s, group, group, group, group],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, E), out_dtype),
            jax.ShapeDtypeStruct((B, G, L, 8), jnp.float32),
            act, act, act, act,
        ],
        scratch_shapes=[pltpu.VMEM((L, E), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * P * (4 * E + 2 * L),
            bytes_accessed=B * L * E * 4 + B * E * P * 8,
            transcendentals=B * G * heads * L * L,
        ),
    )(
        hidden, wq_c, bq_r, wk_c, bk_r, wv_c, bv_r, wo_c, bo_r,
        bias_row, seg_row, seed,
    )
    residuals = (
        hidden, wq_c, wk_c, wv_c, wo_c,
        bias_row, seg_row, seed, md, q2s, k2s, v2s, o2s,
    )
    return out, residuals


def _block_bwd(out_dtype, use_segments, rate, heads, residuals, g):
    (hidden, wq_c, wk_c, wv_c, wo_c,
     bias_row, seg_row, seed, md, q2s, k2s, v2s, o2) = residuals
    B, L, E = hidden.shape
    P = wq_c.shape[1]
    G = P // _LANES
    scale = 1.0 / ((_LANES // heads) ** 0.5)
    cdt = hidden.dtype
    dout = g.astype(cdt)

    x, w_in, b_in, w_out, b_out, row, seed_s, md_s, group = _specs(B, L, E)
    dx, dq2, dk2, dv2 = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, use_segments=use_segments, rate=rate,
            heads=heads,
        ),
        grid=(B, G),
        in_specs=[w_in, w_in, w_in, w_out,
                  row, row, seed_s, md_s, group, group, group, x],
        out_specs=[x, group, group, group],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, E), cdt),
            jax.ShapeDtypeStruct((B, L, P), cdt),
            jax.ShapeDtypeStruct((B, L, P), cdt),
            jax.ShapeDtypeStruct((B, L, P), cdt),
        ],
        scratch_shapes=[pltpu.VMEM((L, E), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * P * (7 * E + 5 * L),
            bytes_accessed=B * L * E * 16 + B * E * P * 8,
            transcendentals=B * G * heads * L * L,
        ),
    )(
        wq_c, wk_c, wv_c, wo_c,
        bias_row, seg_row, seed, md, q2s, k2s, v2s, dout,
    )

    # weight/bias gradients: full-width XLA contractions over the saved
    # per-group gradients (bf16 operands, fp32 accumulation — the same
    # precision the XLA dense backward uses)
    f32 = jnp.float32
    dwq = jnp.einsum("ble,blf->ef", hidden, dq2, preferred_element_type=f32)
    dwk = jnp.einsum("ble,blf->ef", hidden, dk2, preferred_element_type=f32)
    dwv = jnp.einsum("ble,blf->ef", hidden, dv2, preferred_element_type=f32)
    dwo = jnp.einsum("ble,blf->ef", o2, dout, preferred_element_type=f32)
    dbq = jnp.sum(dq2.astype(f32), axis=(0, 1))
    dbk = jnp.sum(dk2.astype(f32), axis=(0, 1))
    dbv = jnp.sum(dv2.astype(f32), axis=(0, 1))
    dbo = jnp.sum(dout.astype(f32), axis=(0, 1))
    return (dx, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo, None, None, None)


_block.defvjp(_block_fwd, _block_bwd)


def attention_block(
    hidden, wq, bq, wk, bk, wv, bv, wo, bo,
    num_heads: int,
    bias=None, segment_ids=None, out_dtype=jnp.bfloat16,
    dropout_rate: float = 0.0, dropout_seed=None,
):
    """Fused multi-head self-attention block.

    ``hidden``: [B, L, E]; ``wq/wk/wv``: [E, P], ``wo``: [P, E]
    (fp32 params); ``bq/bk/bv``: [P], ``bo``: [E]. P = E in the
    single-shard case; under tensor parallelism each model shard passes
    its local column/row slices (P = E / model_axis, ``num_heads`` =
    local head count) and psums the outputs (parallel/tp.py). ``bias``
    is the additive [B, 1, 1, L] padding bias (or None);
    ``segment_ids`` ([B, L] or None) makes attention block-diagonal
    across packed segments. Returns LayerNorm-less ``dense(attn(x))``
    output, [B, L, E] in ``out_dtype`` (residual add + dropout + LN
    happen outside).
    """
    B, L, E = hidden.shape
    head_dim = wq.shape[1] // num_heads
    if not block_supported(L, num_heads, head_dim, global_width=E):
        raise ValueError(
            f"unsupported fused-block shape: L={L} H={num_heads} "
            f"D={head_dim} E={E}"
        )
    if bias is None:
        bias_row = jnp.zeros((B, 1, L), jnp.float32)
    else:
        bias_row = jnp.maximum(bias.reshape(B, 1, L).astype(jnp.float32), _NEG)
    if segment_ids is None:
        seg_row = jnp.zeros((B, 1, L), jnp.float32)
    else:
        seg_row = segment_ids.reshape(B, 1, L).astype(jnp.float32)
    if dropout_seed is None:
        dropout_seed = jnp.zeros((1,), jnp.int32)
        dropout_rate = 0.0
    else:
        dropout_seed = dropout_seed.reshape(1).astype(jnp.int32)

    return _block(
        hidden, wq, bq, wk, bk, wv, bv, wo, bo, bias_row, seg_row,
        dropout_seed, out_dtype, segment_ids is not None, float(dropout_rate),
        _heads_per_group(head_dim),
    )
