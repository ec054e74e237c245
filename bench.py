"""Benchmark harness: phoneme tokens/sec for the full training step.

Measures the flagship configuration end-to-end on the attached TPU
chip: ALBERT-base shape (hidden 768, 12 shared layers, FFN 2048),
188-phoneme vocab, batch 96 × seq 512, bf16 compute, AdamW — the
reference's exact training workload (reference: configs/config.yml).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); the
anchor used here is an analytic estimate of the reference's A100-40GB
throughput — ALBERT-base fp16 at seq 512 with HF kernels and the
per-sample Python loss loop ≈ 230 samples/s ≈ 120k phoneme-tokens/s.
The BASELINE.json north star (≥2× A100 tokens/sec/chip) therefore
corresponds to vs_baseline ≥ 2.0.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_A100_TOKENS_PER_SEC = 120_000.0

BATCH = 96
SEQ = 512
WARMUP_STEPS = 3
MEASURE_STEPS = 20


def main() -> None:
    import jax

    from pl_bert_tpu.config import Config
    from pl_bert_tpu.data.collate import collate_fixed
    from pl_bert_tpu.data.masking import MaskingParams, WholeWordMasker
    from pl_bert_tpu.models.albert import build_model, init_params
    from pl_bert_tpu.parallel.mesh import (
        batch_sharding, make_mesh, param_shardings, shard_params,
    )
    from pl_bert_tpu.training.train_step import (
        TrainState,
        batch_to_arrays,
        make_optimizer,
        make_train_step,
    )
    from pl_bert_tpu.training.train import make_synthetic_corpus

    config = Config.from_dict({})
    tp, dp = config.training_params, config.dataset_params
    tp.batch_size = BATCH

    mesh = make_mesh(-1, 1)
    # attention_impl=auto → Pallas flash kernel on TPU: scores/probs stay
    # in VMEM, so the [B, heads, 512, 512] residuals that OOM'd the plain
    # XLA path never exist and remat isn't needed
    model = build_model(config.model_params, mixed_precision="bf16", remat=False)
    tx = make_optimizer(tp)

    params = init_params(model, SEQ, seed=0)
    params = shard_params(params, mesh)
    opt_state = jax.jit(
        tx.init,
        out_shardings=param_shardings(mesh, jax.eval_shape(tx.init, params)),
    )(params)
    state = TrainState(params, opt_state, jax.device_put(np.int32(0)))

    train_step = make_train_step(model, tx, use_token_ids=False, donate=True)
    rng = jax.random.key(0, impl=tp.prng_impl)
    bsh = batch_sharding(mesh)

    # pre-collate a rotating pool of host batches so host masking is off
    # the measured path (it overlaps the device step in real training)
    corpus = make_synthetic_corpus(BATCH * 4, seed=0)
    masker = WholeWordMasker(MaskingParams(max_seq_length=SEQ), seed=1)
    pool = []
    for b in range(4):
        samples = [
            masker(corpus[b * BATCH + i]["phonemes"], epoch=0, index=i)
            for i in range(BATCH)
        ]
        pool.append(
            jax.device_put(batch_to_arrays(collate_fixed(samples, SEQ)), bsh)
        )

    for i in range(WARMUP_STEPS):
        state, metrics = train_step(state, pool[i % len(pool)], rng)
    float(metrics["loss"])  # host read — forces the async chain to finish
    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        state, metrics = train_step(state, pool[i % len(pool)], rng)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    tokens_per_sec = MEASURE_STEPS * BATCH * SEQ / dt
    print(
        json.dumps(
            {
                "metric": "train_phoneme_tokens_per_sec_per_chip",
                "value": round(tokens_per_sec, 1),
                "unit": "tokens/sec",
                "vs_baseline": round(
                    tokens_per_sec / REFERENCE_A100_TOKENS_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
