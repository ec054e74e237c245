"""Measure length-bucketed serving latency on the attached TPU.

Compares per-call wall latency of PhonemeEncoder with and without
``seq_buckets`` across realistic utterance lengths (StyleTTS feeds one
utterance at a time — reference: README.md:40-47, so single-row calls
dominate serving). Run on the TPU rig::

    python tools/measure_bucket_latency.py

Prints one JSON line per (length, mode) plus a summary. Expected shape
of the result: latency scales ~linearly with the padded length, so a
30-phoneme utterance served at bucket 64 instead of 512 should cut
wall latency several-fold (modulo the fixed dispatch overhead of this
rig's tunnel, ~0.4 ms/call).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = 30
LENGTHS = (12, 30, 60, 120, 250, 500)
BUCKETS = (64, 128, 256)


def _encoder(seq_buckets=None):
    from pl_bert_tpu.config import ModelParams
    from pl_bert_tpu.models.albert import build_model, init_params
    from pl_bert_tpu.models.inference import PhonemeEncoder

    mp = ModelParams()  # flagship ALBERT-base shape, vocab 188
    model = build_model(mp, "fp32")
    params = init_params(model, 512, seed=0)["encoder"]
    return PhonemeEncoder(
        params, mp, max_seq_length=512, mixed_precision="bf16",
        batch_size=1, seq_buckets=seq_buckets,
    )


def _utterance(n: int) -> str:
    rng = np.random.default_rng(n)
    alphabet = list("ɑɐɒæbdfɡhijklmnopqrstuvwzʃʒ ")
    return "".join(rng.choice(alphabet, size=n))


def _measure(enc, text: str) -> float:
    # one warm call per bucket shape (compile), then time REPEATS calls;
    # __call__ fetches hidden to host = the honest serving latency
    enc([text])
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        enc([text])
    return (time.perf_counter() - t0) / REPEATS * 1e3


def main() -> None:
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        print(
            f"WARNING: backend is {jax.default_backend()!r}, not TPU — "
            "numbers below are not the serving latencies this tool is for",
            file=sys.stderr,
        )
    full = _encoder()
    bucketed = _encoder(seq_buckets=BUCKETS)
    rows = []
    for n in LENGTHS:
        text = _utterance(n)
        ms_full = _measure(full, text)
        ms_bucketed = _measure(bucketed, text)
        rows.append({
            "utterance_len": n,
            "full_ms": round(ms_full, 2),
            "bucketed_ms": round(ms_bucketed, 2),
            "speedup": round(ms_full / ms_bucketed, 2),
        })
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({
        "metric": "bucketed_serving_latency",
        "rows": rows,
        "buckets": list(BUCKETS) + [512],
        "repeats": REPEATS,
    }))


if __name__ == "__main__":
    main()
