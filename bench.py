"""Benchmark harness: phoneme tokens/sec for the full training step.

Measures the flagship configuration end-to-end on the attached TPU
chip: ALBERT-base shape (hidden 768, 12 shared layers, FFN 2048),
188-phoneme vocab, batch 96 × seq 512, bf16 compute, AdamW — the
reference's exact training workload (reference: configs/config.yml).

Default invocation prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"}. The bench corpus generates
samples longer than the 512-char window so every row is fully occupied —
the token count is real tokens, not padding.

Modes (VERDICT r1 items 7/10):
  --gate [FLOOR]   also measure attention_impl=xla and emit the
                   pallas/xla throughput ratio; exit nonzero if the
                   ratio falls below FLOOR (default 1.3) — the perf
                   regression gate runs inside the bench artifact.
  --packed         measure the sequence-packing win on a realistic
                   short-sample corpus: REAL (non-pad) tokens/sec for
                   the padded path vs the packed path, plus occupancy.
  --preprocess     host-pipeline throughput (articles/sec) through the
                   clean stage's sharded engine + the phonemize stage
                   (SURVEY §7.9's "preprocess sentences/sec"); runs on
                   CPU only, no TPU needed. vs_baseline is the sharded
                   engine vs a naive sequential loop over the same
                   normalization functions.
  --multitask      the multi-task variant (phoneme + 60k grapheme head,
                   reference upstream config) at the same batch 96 ×
                   seq 512 — trains via the masked-position-gather
                   chunked CE (ops/masked_ce.py), which is what fits
                   the 60k head in 16 GB HBM at all.
  --inference      the serving path (models/inference.py::PhonemeEncoder,
                   the StyleTTS consumption contract): encoder forward
                   tokens/sec at batch 96 × seq 512, bf16. Add --int8
                   to run the dense projections on the int8 MXU path
                   (ops/quant.py; ~1% hidden-state error).
  --accum          gradient accumulation: effective batch 384 (4 × 96)
                   at a single micro-batch's activation memory, plus
                   the efficiency ratio vs the plain batch-96 step.
  --production     the full production pretraining config as ONE number
                   (VERDICT r4 item 3): multitask 60k head + sequence
                   packing + fused LM-head CE + grad_accum 2 on the
                   realistic short-sample corpus — REAL tokens/sec.

vs_baseline: the reference publishes no numbers (BASELINE.md); the
anchor used here is an analytic estimate of the reference's A100-40GB
throughput — ALBERT-base fp16 at seq 512 with HF kernels and the
per-sample Python loss loop ≈ 230 samples/s ≈ 120k phoneme-tokens/s.
The BASELINE.json north star (≥2× A100 tokens/sec/chip) therefore
corresponds to vs_baseline ≥ 2.0.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REFERENCE_A100_TOKENS_PER_SEC = 120_000.0

BATCH = 96
SEQ = 512
WARMUP_STEPS = 3
MEASURE_STEPS = 20


def _full_length_corpus(n: int, seed: int = 0) -> list[dict]:
    """Synthetic corpus whose samples all exceed the 512-char window, so
    benchmark batches carry zero padding (honest token accounting)."""
    rng = np.random.default_rng(seed)
    alphabet = list("ɑɐɒæbdfɡhijklmnopqrstuvwzʃʒθðŋɹɾʔˈˌː")
    corpus = []
    for _ in range(n):
        words, total = [], 0
        while total < SEQ + 64:  # one separator per word
            k = int(rng.integers(2, 10))
            words.append("".join(rng.choice(alphabet, size=k)))
            total += k + 1
        corpus.append({"phonemes": words})
    return corpus


def _short_corpus(n: int, seed: int = 0) -> list[dict]:
    """Sentence-sized samples (~60-200 chars) — the realistic wiki-crop
    regime where the reference's pad-to-max collation wastes most of the
    batch (reference: dataloader.py:200-223)."""
    rng = np.random.default_rng(seed)
    alphabet = list("ɑɐɒæbdfɡhijklmnopqrstuvwzʃʒθðŋɹɾʔˈˌː")
    corpus = []
    for _ in range(n):
        k_words = int(rng.integers(8, 30))
        words = [
            "".join(rng.choice(alphabet, size=int(rng.integers(2, 10))))
            for _ in range(k_words)
        ]
        corpus.append({"phonemes": words})
    return corpus


def _build(
    config, mesh, masking_params=None, attention_impl=None,
    use_token_ids=False, num_token_vocab=0, remat=None, grad_accum=1,
):
    """(state, train_step, rng, batch_sharding) for the config.

    The single state-construction path every bench mode shares;
    ``attention_impl='xla'`` also enables remat (plain XLA attention
    materializes [B, 12, 512, 512] softmax residuals and OOMs without
    it — BASELINE.md)."""
    import dataclasses

    import jax

    from pl_bert_tpu.models.albert import build_model, init_params
    from pl_bert_tpu.parallel.mesh import (
        batch_sharding, param_shardings, shard_params,
    )
    from pl_bert_tpu.training.train_step import (
        TrainState, make_optimizer, make_train_step,
    )

    mp_overrides = {}
    if attention_impl is not None:
        mp_overrides["attention_impl"] = attention_impl
    if num_token_vocab:
        mp_overrides["num_token_vocab"] = num_token_vocab
    if mp_overrides:
        config = dataclasses.replace(
            config,
            model_params=dataclasses.replace(
                config.model_params, **mp_overrides
            ),
        )

    tp = config.training_params
    if remat is None:
        remat = attention_impl == "xla"
    model = build_model(
        config.model_params, mixed_precision="bf16",
        remat=remat, mesh=mesh,
    )
    tx = make_optimizer(tp)
    params = init_params(model, SEQ, seed=0)
    params = shard_params(params, mesh)
    opt_state = jax.jit(
        tx.init,
        out_shardings=param_shardings(mesh, jax.eval_shape(tx.init, params)),
    )(params)
    state = TrainState(params, opt_state, jax.device_put(np.int32(0)))
    train_step = make_train_step(
        model, tx, use_token_ids=use_token_ids, donate=True,
        masking_params=masking_params, grad_accum=grad_accum,
        # fused grapheme-head CE is the adopted default (round-4 chip
        # A/B: 190.9k vs 181.2k tok/s); PLBERT_FUSED_LM_HEAD=0 forces
        # the chunked path for A/Bs, inert for the phoneme-only modes
        fused_lm_head=os.environ.get("PLBERT_FUSED_LM_HEAD", "1") != "0",
        # masked-gather capacity for the 60k head; PLBERT_LM_CAPACITY
        # overrides for chip A/Bs (config.py::lm_head_capacity)
        lm_head_capacity=int(
            os.environ.get("PLBERT_LM_CAPACITY", tp.lm_head_capacity)
        ),
    )
    rng = jax.random.key(0, impl=tp.prng_impl)
    return state, train_step, rng, batch_sharding(mesh)


def _measure(state, train_step, rng, pool) -> float:
    """Seconds per measured window over the rotating batch pool."""
    for i in range(WARMUP_STEPS):
        state, metrics = train_step(state, pool[i % len(pool)], rng)
    float(metrics["loss"])  # host read — forces the async chain to finish
    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        state, metrics = train_step(state, pool[i % len(pool)], rng)
    float(metrics["loss"])
    return time.perf_counter() - t0


def _host_masked_pool(bsh, batch: int = BATCH, n_batches: int = 4):
    import jax

    from pl_bert_tpu.data.collate import collate_fixed
    from pl_bert_tpu.data.masking import MaskingParams, WholeWordMasker
    from pl_bert_tpu.training.train_step import batch_to_arrays

    BATCH = batch
    corpus = _full_length_corpus(BATCH * n_batches, seed=0)
    masker = WholeWordMasker(MaskingParams(max_seq_length=SEQ), seed=1)
    pool = []
    for b in range(n_batches):
        samples = [
            masker(corpus[b * BATCH + i]["phonemes"], epoch=0, index=i)
            for i in range(BATCH)
        ]
        arrays = batch_to_arrays(collate_fixed(samples, SEQ))
        pool.append(arrays if bsh is None else jax.device_put(arrays, bsh))
    return pool


def _measure_impl(config, mesh, attention_impl: str | None) -> float:
    """tokens/sec of the flagship step under the given attention impl."""
    state, train_step, rng, bsh = _build(
        config, mesh, attention_impl=attention_impl
    )
    pool = _host_masked_pool(bsh)
    dt = _measure(state, train_step, rng, pool)
    return MEASURE_STEPS * BATCH * SEQ / dt


def run_default(config, mesh, gate_floor: float | None = None) -> None:
    # the gate numerator FORCES the fused-block kernel rather than using
    # "auto": if the kernel dispatch regresses (auto silently resolving
    # to xla), the forced path falls back to xla too, the ratio lands
    # near 1, and the gate fails loudly instead of comparing xla to xla
    # under a label that says "pallas"
    tokens_per_sec = _measure_impl(
        config, mesh, "pallas_block" if gate_floor is not None else "auto"
    )
    record = {
        "metric": "train_phoneme_tokens_per_sec_per_chip",
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(tokens_per_sec / REFERENCE_A100_TOKENS_PER_SEC, 3),
    }
    if gate_floor is not None:
        xla_tps = _measure_impl(config, mesh, "xla")
        ratio = tokens_per_sec / xla_tps
        record["xla_tokens_per_sec"] = round(xla_tps, 1)
        record["pallas_vs_xla"] = round(ratio, 3)
        print(json.dumps(record))
        if ratio < gate_floor:
            print(
                f"PERF GATE FAILED: pallas/xla ratio {ratio:.3f} < floor "
                f"{gate_floor}",
                file=sys.stderr,
            )
            raise SystemExit(1)
        return
    print(json.dumps(record))


def run_packed(config, mesh) -> None:
    """Sequence-packing win on a short-sample corpus: REAL tokens/sec of
    the padded on-device path vs the FFD-packed path (VERDICT r1 item 7)."""
    import jax

    from pl_bert_tpu.data.masking import MaskingParams
    from pl_bert_tpu.data.packed import (
        PackedPhonemeDataset, PackedSequenceDataset,
    )

    dp = config.dataset_params
    masking = MaskingParams(
        word_pred_prob=dp.word_pred_prob,
        phoneme_mask_prob=dp.phoneme_mask_prob,
        replace_prob=dp.replace_prob,
        max_seq_length=SEQ,
        word_separator=dp.word_separator,
    )
    corpus = _short_corpus(6000, seed=0)

    results = {}
    for name, ds in (
        ("padded", PackedPhonemeDataset(corpus, SEQ, seed=1)),
        ("packed", PackedSequenceDataset(corpus, SEQ)),
    ):
        state, train_step, rng, bsh = _build(config, mesh, masking_params=masking)
        pool, real_tokens = [], []
        batches = ds.batches(BATCH, epoch=1, seed=1, drop_last=True)
        for i, b in enumerate(batches):
            if i == 4:
                break
            real_tokens.append(int(b["lengths"].sum()))
            pool.append(jax.device_put(b, bsh))
        dt = _measure(state, train_step, rng, pool)
        steps_per_sec = MEASURE_STEPS / dt
        avg_real = float(np.mean(real_tokens))
        results[name] = {
            "real_tokens_per_sec": steps_per_sec * avg_real,
            "occupancy": avg_real / (BATCH * SEQ),
        }

    speedup = (
        results["packed"]["real_tokens_per_sec"]
        / results["padded"]["real_tokens_per_sec"]
    )
    print(
        json.dumps(
            {
                "metric": "sequence_packing_real_tokens_per_sec",
                "value": round(results["packed"]["real_tokens_per_sec"], 1),
                "unit": "tokens/sec",
                "vs_baseline": round(speedup, 3),
                "padded_real_tokens_per_sec": round(
                    results["padded"]["real_tokens_per_sec"], 1
                ),
                "padded_occupancy": round(results["padded"]["occupancy"], 3),
                "packed_occupancy": round(results["packed"]["occupancy"], 3),
            }
        )
    )


def run_multitask(config, mesh) -> None:
    """Multi-task training throughput: the 60k grapheme head on top of
    the flagship step (reference: model.py:5-18, the upstream variant)."""
    import jax

    from pl_bert_tpu.data.collate import collate_fixed
    from pl_bert_tpu.data.masking import MaskingParams, WholeWordMasker
    from pl_bert_tpu.training.train_step import batch_to_arrays

    state, train_step, rng, bsh = _build(
        config, mesh, use_token_ids=True, num_token_vocab=60_000
    )
    corpus = _full_length_corpus(BATCH * 4, seed=0)
    nrng = np.random.default_rng(7)
    masker = WholeWordMasker(MaskingParams(max_seq_length=SEQ), seed=1)
    pool = []
    for b in range(4):
        samples = []
        for i in range(BATCH):
            words = corpus[b * BATCH + i]["phonemes"]
            tids = nrng.integers(5, 60_000, size=len(words)).tolist()
            samples.append(masker(words, epoch=0, index=i, token_ids=tids))
        pool.append(
            jax.device_put(batch_to_arrays(collate_fixed(samples, SEQ)), bsh)
        )

    dt = _measure(state, train_step, rng, pool)
    tokens_per_sec = MEASURE_STEPS * BATCH * SEQ / dt
    print(
        json.dumps(
            {
                "metric": "multitask_train_tokens_per_sec_per_chip",
                "value": round(tokens_per_sec, 1),
                "unit": "tokens/sec",
                "vs_baseline": round(
                    tokens_per_sec / REFERENCE_A100_TOKENS_PER_SEC, 3
                ),
                # the anchor is the PHONEME-ONLY A100 estimate; the
                # reference's multitask A100 rate would be strictly
                # lower, so this ratio is conservative
                "baseline_anchor": "phoneme-only A100 estimate",
                "fused_lm_head": (
                    os.environ.get("PLBERT_FUSED_LM_HEAD", "1") != "0"
                ),
                "lm_head_capacity": int(
                    os.environ.get(
                        "PLBERT_LM_CAPACITY",
                        config.training_params.lm_head_capacity,
                    )
                ),
            }
        )
    )


def run_accum(config, mesh, accum: int = 4) -> None:
    """Gradient accumulation throughput: effective batch ``accum``×96 at
    a single micro-batch's activation memory. Direct batch 384 does NOT
    fit 16 GB HBM without remat (BASELINE.md: batch >96 OOMs); the
    accumulation step (training_params.grad_accum_steps) lax.scans over
    [accum, 96, 512] micro-batches and applies one sample-count-weighted
    optimizer update, numerically identical to the concatenated batch
    (tests/test_grad_accum.py). ``accum_efficiency`` is tokens/sec
    relative to the plain batch-96 step measured in the same run — the
    cost of the scan + one (instead of accum) optimizer applications."""
    import jax

    from pl_bert_tpu.parallel.mesh import microbatch_sharding

    plain_tps = _measure_impl(config, mesh, "auto")

    state, train_step, rng, _ = _build(config, mesh, grad_accum=accum)
    msh = microbatch_sharding(mesh)
    host = _host_masked_pool(None, n_batches=2 * accum)
    pool = []
    for g in range(2):
        group = host[g * accum:(g + 1) * accum]
        stacked = {
            k: np.stack([np.asarray(b[k]) for b in group]) for k in group[0]
        }
        pool.append(jax.device_put(stacked, msh))

    dt = _measure(state, train_step, rng, pool)
    tokens_per_sec = MEASURE_STEPS * accum * BATCH * SEQ / dt
    print(
        json.dumps(
            {
                "metric": "grad_accum_train_tokens_per_sec_per_chip",
                "value": round(tokens_per_sec, 1),
                "unit": "tokens/sec",
                "vs_baseline": round(
                    tokens_per_sec / REFERENCE_A100_TOKENS_PER_SEC, 3
                ),
                "accum_steps": accum,
                "effective_batch": accum * BATCH,
                "plain_tokens_per_sec": round(plain_tps, 1),
                "accum_efficiency": round(tokens_per_sec / plain_tps, 3),
            }
        )
    )


def run_production(config, mesh, accum: int = 2) -> None:
    """The production pretraining configuration as ONE number (VERDICT
    r4 item 3): multi-task (60k grapheme head, reference model.py:5-18)
    + sequence packing (block-diagonal attention over FFD-packed rows)
    + fused LM-head CE (round-4 adopted default) + grad_accum 2
    (effective batch 192) on the realistic short-sample corpus. The
    value is REAL (non-pad) tokens/sec — what a real multi-task
    pretraining run on wiki-crop-length data actually gets per chip."""
    import jax

    from pl_bert_tpu.data.masking import MaskingParams
    from pl_bert_tpu.data.packed import PackedSequenceDataset
    from pl_bert_tpu.parallel.mesh import microbatch_sharding

    dp = config.dataset_params
    masking = MaskingParams(
        word_pred_prob=dp.word_pred_prob,
        phoneme_mask_prob=dp.phoneme_mask_prob,
        replace_prob=dp.replace_prob,
        max_seq_length=SEQ,
        word_separator=dp.word_separator,
    )
    corpus = _short_corpus(6000, seed=0)
    nrng = np.random.default_rng(7)
    for rec in corpus:  # the multi-task column (throughput: ids random)
        rec["token_ids"] = nrng.integers(
            5, 60_000, size=len(rec["phonemes"])
        ).tolist()

    state, train_step, rng, _ = _build(
        config, mesh, masking_params=masking, use_token_ids=True,
        num_token_vocab=60_000, grad_accum=accum,
    )
    msh = microbatch_sharding(mesh)
    ds = PackedSequenceDataset(corpus, SEQ)
    micro, pool, real_tokens = [], [], []
    for b in ds.batches(BATCH, epoch=1, seed=1, drop_last=True):
        micro.append(b)
        if len(micro) == accum:
            stacked = {
                k: np.stack([np.asarray(m[k]) for m in micro])
                for k in micro[0]
            }
            real_tokens.append(
                int(sum(int(m["lengths"].sum()) for m in micro))
            )
            pool.append(jax.device_put(stacked, msh))
            micro = []
        if len(pool) == 2:
            break

    dt = _measure(state, train_step, rng, pool)
    avg_real = float(np.mean(real_tokens))
    tokens_per_sec = MEASURE_STEPS * avg_real / dt
    print(
        json.dumps(
            {
                "metric": "production_train_real_tokens_per_sec_per_chip",
                "value": round(tokens_per_sec, 1),
                "unit": "tokens/sec",
                "vs_baseline": round(
                    tokens_per_sec / REFERENCE_A100_TOKENS_PER_SEC, 3
                ),
                "config": "multitask60k+packed+fused_lm_head"
                          f"+accum{accum}",
                "lm_head_capacity": int(
                    os.environ.get(
                        "PLBERT_LM_CAPACITY",
                        config.training_params.lm_head_capacity,
                    )
                ),
                "effective_batch": accum * BATCH,
                "occupancy": round(avg_real / (accum * BATCH * SEQ), 3),
                # the anchor is the phoneme-only PADDED A100 estimate,
                # counting real tokens on this side only — conservative
                # twice over
                "baseline_anchor": "phoneme-only padded A100 estimate",
            }
        )
    )


def run_inference(config, int8: bool = False) -> None:
    """Serving-path throughput: the PhonemeEncoder forward (the
    reference's downstream contract — AlbertModel.last_hidden_state fed
    to StyleTTS, reference README.md:40-47) at batch 96 × seq 512, bf16.

    Measures the jitted encoder forward only. Host text→id encoding runs
    once up front (outside the timed window; ~50k chars/batch of pure
    numpy lookup), and the device→host fetch of the [96, 512, 768]
    hidden states is excluded too — on this rig that fetch crosses the
    axon tunnel and would measure link bandwidth, not the chip."""
    import jax
    import jax.numpy as jnp

    from pl_bert_tpu.models.albert import build_model, init_params
    from pl_bert_tpu.models.inference import PhonemeEncoder

    model = build_model(config.model_params, "fp32")
    params = init_params(model, SEQ, seed=0)["encoder"]
    enc = PhonemeEncoder(
        params, config.model_params, SEQ,
        quantize="int8" if int8 else None,
    )

    corpus = _full_length_corpus(BATCH * 4, seed=0)
    batches = []
    total_tokens = 0
    for b in range(4):
        strings = [
            " ".join(corpus[b * BATCH + i]["phonemes"]) for i in range(BATCH)
        ]
        ids, mask, lengths = enc.encode_batch(strings)
        batches.append((jnp.asarray(ids), jnp.asarray(mask)))
        total_tokens += int(lengths.sum())

    forward = enc.forward

    out = forward(*batches[0])
    float(jnp.sum(out[:1, :1].astype(jnp.float32)))  # sync
    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        out = forward(*batches[i % 4])
    float(jnp.sum(out[:1, :1].astype(jnp.float32)))
    dt = time.perf_counter() - t0
    tokens_per_sec = MEASURE_STEPS * (total_tokens / 4) / dt

    print(
        json.dumps(
            {
                "metric": "inference_encode_tokens_per_sec_per_chip"
                + ("_int8" if int8 else ""),
                "value": round(tokens_per_sec, 1),
                "unit": "tokens/sec",
                # anchor: the same analytic A100 reference stack,
                # forward-only ≈ 3x its training rate
                "vs_baseline": round(
                    tokens_per_sec / (3 * REFERENCE_A100_TOKENS_PER_SEC), 3
                ),
            }
        )
    )


def _arabic_corpus(n: int, seed: int = 0) -> list[dict]:
    """Synthetic Arabic articles mixing words, digit runs, and punctuation
    so the clean stage exercises number verbalization, the Arabic-only
    filter, and unicode cleanup (the reference's host hot loop,
    reference: preprocess.py:18-30)."""
    rng = np.random.default_rng(seed)
    letters = [chr(c) for c in range(0x0621, 0x064B)]
    corpus = []
    for i in range(n):
        parts = []
        for _ in range(int(rng.integers(60, 140))):
            r = rng.random()
            if r < 0.08:
                parts.append(str(rng.integers(0, 99999)))
            elif r < 0.12:
                parts.append(rng.choice(list(".,:;!?")))
            elif r < 0.15:
                parts.append("latin" + str(rng.integers(10)))
            else:
                k = int(rng.integers(2, 9))
                parts.append("".join(rng.choice(letters, size=k)))
        corpus.append({"id": str(i), "text": " ".join(parts)})
    return corpus


def run_preprocess(n: int = 2000) -> None:
    """Host preprocess throughput: sharded clean engine vs a naive
    sequential loop, plus the phonemize stage (VERDICT/SURVEY §7.9)."""
    import shutil
    import tempfile

    from pl_bert_tpu.config import Config
    from pl_bert_tpu.preprocess.phonemize import get_g2p_backend, phonemize_text
    from pl_bert_tpu.preprocess.pipeline import standardize_text
    from pl_bert_tpu.preprocess.shard_engine import (
        load_processed_dataset, process_dataset,
    )

    config = Config.from_dict({})
    pp = config.preprocess_params

    corpus = _arabic_corpus(n, seed=0)
    chars = sum(len(r["text"]) for r in corpus)

    # baseline: plain sequential map over the same normalization functions
    t0 = time.perf_counter()
    for r in corpus:
        standardize_text(r["text"])
    naive_dt = time.perf_counter() - t0

    # the real path: sharded engine with retry/timeout/atomic-rename
    work = tempfile.mkdtemp(prefix="plb_prep_bench_")
    try:
        t0 = time.perf_counter()
        out = process_dataset(
            dataset=corpus,
            root_directory=work,
            process_fn=standardize_text,
            output_dir=os.path.join(work, "cleaned"),
            max_workers=pp.max_workers,
            timeout=pp.timeout,
            max_try_count=pp.max_try_count,
            num_shards=16,
            hang_safe=True,  # what main_clean passes — measure prod path
        )
        engine_dt = time.perf_counter() - t0
        cleaned = load_processed_dataset(out)

        try:
            backend = get_g2p_backend(
                pp.g2p_backend, language=pp.phonemizer_language,
                with_stress=pp.with_stress,
            )
            g2p_name = pp.g2p_backend
        except Exception:
            backend = get_g2p_backend("identity")
            g2p_name = "identity (libespeak-ng not installed)"
        t0 = time.perf_counter()
        for r in cleaned:
            phonemize_text(r["text"], backend)
        g2p_dt = time.perf_counter() - t0
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "preprocess_clean_articles_per_sec",
                "value": round(n / engine_dt, 1),
                "unit": "articles/sec",
                "vs_baseline": round(naive_dt / engine_dt, 3),
                "clean_chars_per_sec": round(chars / engine_dt, 1),
                "phonemize_articles_per_sec": round(n / g2p_dt, 1),
                "g2p_backend": g2p_name,
            }
        )
    )


def run_store_feed(
    n_samples: int = 50_000, max_batches: int = 400, store_dir: str | None = None,
) -> None:
    """Host data-plane throughput from a memory-mapped packed store
    (data/packed_store.py): packs a synthetic corpus once into /tmp,
    then measures shuffled-batch read rate at the production batch
    shape. The number that matters is the headroom over the device's
    demand (~5.2 batches/sec at the round-2 253k tok/s step rate) —
    the pread data plane must never be the bottleneck."""
    import tempfile

    from pl_bert_tpu.data.packed_store import (
        open_packed_store, write_packed_store,
    )

    if store_dir is None:
        store_dir = os.path.join(tempfile.gettempdir(), "plbert_bench_store")
    if os.path.isdir(store_dir):
        # a cached store from a different bench version/parameters would
        # silently skew the headline — validate or repack
        import json as _json
        import shutil

        try:
            meta = _json.load(
                open(os.path.join(store_dir, "packed_meta.json"))
            )
            stale = (
                meta["num_samples"] != n_samples
                or meta["max_seq_length"] != SEQ
            )
        except (OSError, ValueError, KeyError):
            stale = True
        if stale:
            shutil.rmtree(store_dir, ignore_errors=True)
    if not os.path.isdir(store_dir):
        # fast streaming corpus: a fixed word pool sampled per record
        # (make_synthetic_corpus's per-word rng.choice is ~100× slower)
        pool_rng = np.random.default_rng(11)
        alphabet = np.array(list("ɑɐɒæbdfɡhijklmnopqrstuvwzʃʒθðŋɹɾʔˈˌː"))
        word_pool = [
            "".join(pool_rng.choice(alphabet, size=int(n)))
            for n in pool_rng.integers(2, 10, size=4096)
        ]

        def gen():
            rng = np.random.default_rng(12)
            for _ in range(n_samples):
                k = int(rng.integers(40, 120))
                idx = rng.integers(0, len(word_pool), size=k)
                yield {"phonemes": [word_pool[i] for i in idx]}

        write_packed_store(gen(), store_dir, max_seq_length=SEQ)
    reader = open_packed_store(store_dir)

    # warm the page cache fairly: one throwaway pass over a subset
    rng = np.random.default_rng(0)
    for _ in range(20):
        reader.batch(np.sort(rng.integers(0, len(reader), BATCH)))

    n_batches = 0
    t0 = time.perf_counter()
    for epoch in (1, 2):
        for b in reader.batches(BATCH, epoch, seed=3):
            n_batches += 1
            if n_batches >= max_batches:
                break
        if n_batches >= max_batches:
            break
    dt = time.perf_counter() - t0
    batches_per_sec = n_batches / dt
    tokens_per_sec = batches_per_sec * BATCH * SEQ
    device_demand = 253_000.0  # round-2 flagship step rate, BASELINE.md
    print(
        json.dumps(
            {
                "metric": "packed_store_host_feed_tokens_per_sec",
                "value": round(tokens_per_sec, 1),
                "unit": "tokens/sec",
                "vs_baseline": round(tokens_per_sec / device_demand, 3),
                "baseline_anchor": "round-2 device step rate (253k tok/s)",
                "batches_per_sec": round(batches_per_sec, 1),
                "store_rows": len(reader),
            }
        )
    )


def _flops_per_token(E: int, F: int, layers: int) -> float:
    """Fwd+bwd matmul FLOPs/token (see tools/a100_baseline_estimate.py)."""
    return layers * 2 * (4 * E * E + 2 * E * F + 2 * SEQ * E) * 3


# v5e bf16 dense peak (TFLOP/s) for the MFU column
_V5E_PEAK = 197e12

# (name, hidden, heads, ffn, layers, batch, remat) — head_dim stays 64
# (the fused kernel's tuned shape); remat trades recompute for the
# activation memory the deeper stacks need on 16 GB HBM
_SCALE_SHAPES = [
    ("base-768x12L", 768, 12, 2048, 12, 96, False),
    ("large-1024x24L", 1024, 16, 4096, 24, 96, True),
    ("xlarge-2048x24L", 2048, 32, 8192, 24, 32, True),
]


def run_scaling(config, mesh) -> None:
    """Model-scale sweep: the same training stack at ALBERT-base /
    -large / -xlarge-ish shapes (shared-layer, head_dim 64 throughout).
    The reference only ever runs the 768/12L shape; this shows the
    kernels and step machinery hold (and MFU rises) as the matmuls
    grow — scaling evidence, not a reference-parity number."""
    import dataclasses

    rows = []
    for name, E, H, F, L, batch, remat in _SCALE_SHAPES:
        cfg = dataclasses.replace(
            config,
            model_params=dataclasses.replace(
                config.model_params,
                hidden_size=E, num_attention_heads=H,
                intermediate_size=F, num_hidden_layers=L,
            ),
        )
        state, train_step, rng, bsh = _build(cfg, mesh, remat=remat)
        pool = _host_masked_pool(bsh, batch=batch)
        dt = _measure(state, train_step, rng, pool)
        tps = MEASURE_STEPS * batch * SEQ / dt
        # remat recomputes the fwd in the bwd: count the extra pass
        flops = _flops_per_token(E, F, L) * (4 / 3 if remat else 1.0)
        mfu = tps * flops / _V5E_PEAK
        rows.append({
            "shape": name, "batch": batch, "remat": remat,
            "tokens_per_sec": round(tps, 1), "mfu_lower_bound": round(mfu, 3),
        })
        print(json.dumps(rows[-1]), flush=True)
        del state, train_step, pool
    print(json.dumps({
        "metric": "scaling_sweep", "value": rows[-1]["tokens_per_sec"],
        "unit": "tokens/sec", "vs_baseline": 0.0, "rows": rows,
    }))


_KNOWN_FLAGS = {"--gate", "--packed", "--preprocess", "--multitask",
                "--inference", "--store", "--scale", "--accum", "--int8",
                "--production"}


def main(argv: list[str]) -> None:
    # strict flag validation: a typo'd mode must not silently fall
    # through to the (expensive) default TPU measurement
    it = iter(range(len(argv)))
    for i in it:
        arg = argv[i]
        if arg in _KNOWN_FLAGS:
            if arg == "--gate" and i + 1 < len(argv) and not argv[
                i + 1
            ].startswith("-"):
                next(it, None)  # the floor value
            continue
        raise SystemExit(f"unknown bench argument: {arg!r} (known: "
                         f"{sorted(_KNOWN_FLAGS)})")
    if "--int8" in argv and "--inference" not in argv:
        # before ANY mode dispatch: combined with another mode the flag
        # would otherwise be silently ignored
        raise SystemExit("--int8 only modifies --inference")

    if "--preprocess" in argv:
        return run_preprocess()
    if "--store" in argv:
        return run_store_feed()

    from pl_bert_tpu.config import Config
    from pl_bert_tpu.parallel.mesh import make_mesh

    config = Config.from_dict({})
    config.training_params.batch_size = BATCH
    mesh = make_mesh(-1, 1)

    if "--packed" in argv:
        return run_packed(config, mesh)
    if "--scale" in argv:
        return run_scaling(config, mesh)
    if "--production" in argv:
        return run_production(config, mesh)
    if "--multitask" in argv:
        return run_multitask(config, mesh)
    if "--accum" in argv:
        return run_accum(config, mesh)
    if "--inference" in argv:
        return run_inference(config, int8="--int8" in argv)
    gate_floor = None
    if "--gate" in argv:
        i = argv.index("--gate")
        gate_floor = (
            float(argv[i + 1])
            if i + 1 < len(argv) and not argv[i + 1].startswith("-")
            else 1.3
        )
    run_default(config, mesh, gate_floor)


_PROBE_CODE = (
    "import jax; d = jax.devices(); print(d[0].platform, len(d), flush=True)"
)


def _probe_backend(timeout_s: float, code: str = _PROBE_CODE) -> bool:
    """Bounded subprocess check that the jax backend comes up at all.

    When the axon tunnel is down, ``jax.devices()`` HANGS instead of
    raising (CLAUDE.md) — an in-process first touch would therefore
    hang the whole bench forever. Probing in a killable child turns
    that hang into a clean False within ``timeout_s``.
    """
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return False
    if proc.returncode != 0:
        # a fast failure (not a hang) — surface the child's reason; the
        # in-process run would hit the same error and retry-path it
        print(proc.stderr.strip()[-2000:], file=sys.stderr, flush=True)
        return False
    return True


def _arm_watchdog(
    deadline_s: float, argv: list[str], attempt: int, max_attempts: int
):
    """Daemon timer that aborts a hung measurement after ``deadline_s``.

    Covers the probe's blind spot: the tunnel was up at probe time but
    died mid-run, leaving the main thread stuck in a remote call that
    never raises. On fire it prints the abort marker (so line-parsers
    discard partial progressive-mode rows), then re-execs ONE final
    attempt (``attempt -> max_attempts``) or exits nonzero — never
    hangs the driver's round-end bench.
    """
    import threading

    def _fire():
        print(
            json.dumps(
                {"bench_attempt_aborted": attempt, "reason": "watchdog"}
            ),
            flush=True,
        )
        print(
            f"bench watchdog: attempt {attempt} made no progress within "
            f"{deadline_s:.0f}s (tunnel died mid-run?); "
            + ("re-exec for one final attempt" if attempt < max_attempts
               else "giving up"),
            file=sys.stderr, flush=True,
        )
        if attempt < max_attempts:
            os.environ["PLBERT_BENCH_ATTEMPT"] = str(max_attempts)
            try:
                os.execv(
                    sys.executable,
                    [sys.executable, os.path.abspath(__file__), *argv],
                )
            except OSError:
                pass
        os._exit(1)

    timer = threading.Timer(deadline_s, _fire)
    timer.daemon = True
    timer.start()
    return timer


def _run_with_retry(argv: list[str]) -> None:
    """Run main(); on failure in a device-requiring mode, re-exec this
    process (bounded attempts) instead of dying.

    The axon tunnel to the TPU degrades periodically (CLAUDE.md); a
    blip during the measurement would otherwise turn a healthy build
    into a failed bench record. A failed jax backend handle cannot be
    reused in-process, so retry = fresh exec. Every failure's full
    traceback still goes to stderr (nothing is masked), and a real bug
    fails all attempts and exits nonzero exactly as before.

    Hang insurance (a down tunnel hangs rather than raising): a bounded
    subprocess probe runs before any in-process device touch
    (PLBERT_BENCH_PROBE_TIMEOUT_S, default 180, 0 disables), and a
    watchdog deadline bounds the measurement itself
    (PLBERT_BENCH_DEADLINE_S, default 2400, 0 disables). Probe failures
    ride the same bounded re-exec/backoff path as exceptions, so the
    worst case is a ~20-minute nonzero exit — never an infinite hang.
    """
    host_only = {"--preprocess", "--store"}
    attempt = int(os.environ.get("PLBERT_BENCH_ATTEMPT", "1"))
    max_attempts = int(os.environ.get("PLBERT_BENCH_MAX_ATTEMPTS", "4"))
    device_mode = not (set(argv) & host_only)
    watchdog = None
    try:
        if device_mode:
            probe_timeout = float(
                os.environ.get("PLBERT_BENCH_PROBE_TIMEOUT_S", "180")
            )
            if probe_timeout > 0 and not _probe_backend(probe_timeout):
                raise RuntimeError(
                    f"jax backend did not come up within {probe_timeout:.0f}s"
                    " (axon tunnel down?) — probed in a subprocess because"
                    " an in-process jax.devices() would hang, not raise"
                )
            deadline = float(
                os.environ.get("PLBERT_BENCH_DEADLINE_S", "2400")
            )
            if deadline > 0:
                watchdog = _arm_watchdog(deadline, argv, attempt, max_attempts)
        main(argv)
        if watchdog is not None:
            watchdog.cancel()
    except (SystemExit, KeyboardInterrupt):
        raise
    except BaseException:
        import traceback

        if watchdog is not None:
            watchdog.cancel()  # don't let it fire during the backoff sleep
        traceback.print_exc()
        if not device_mode or attempt >= max_attempts:
            # structured last line so a driver parsing stdout records an
            # explicit environment failure, not an empty/garbled result
            print(
                json.dumps({
                    "bench_failed": f"all {attempt} attempts errored "
                                    "(axon tunnel down?) — see stderr",
                    "mode": " ".join(argv) or "default",
                }),
                flush=True,
            )
            raise
        # progressive modes (--scale, --accum, --gate) may already have
        # printed partial JSON rows; mark the abort on stdout so a
        # line-parser can discard everything before this marker
        print(json.dumps({"bench_attempt_aborted": attempt}), flush=True)
        delay = 90 * attempt
        print(
            f"bench attempt {attempt}/{max_attempts} failed; "
            f"re-exec in {delay}s (transient-tunnel insurance)",
            file=sys.stderr, flush=True,
        )
        time.sleep(delay)
        os.environ["PLBERT_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable, os.path.abspath(__file__), *argv])


if __name__ == "__main__":
    _run_with_retry(sys.argv[1:])
