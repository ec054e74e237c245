#!/usr/bin/env python
"""Device-side xprof of the multi-task train step (VERDICT r2 item 7).

Round 2's attempt hit a TPU-backend FailedPrecondition under
``jax.profiler.trace`` for the multitask step (the phoneme-only step
traced fine) — this retries it and, on success, parses the
``.xplane.pb`` into a per-op-category device-time breakdown for
BASELINE.md. Run on the real TPU (axon):

    nohup python tools/profile_multitask.py > /tmp/profile_mt.log 2>&1 &

Pass ``--phoneme-only`` to profile the flagship single-task step
instead (the round-2 reference point).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_profiled_steps(multitask: bool, trace_dir: str, steps: int = 6):
    import jax
    import numpy as np

    import bench
    from pl_bert_tpu.config import Config
    from pl_bert_tpu.data.collate import collate_fixed
    from pl_bert_tpu.data.masking import MaskingParams, WholeWordMasker
    from pl_bert_tpu.parallel.mesh import make_mesh
    from pl_bert_tpu.training.train_step import batch_to_arrays

    config = Config()
    mesh = make_mesh(-1, 1)
    kwargs = (
        {"use_token_ids": True, "num_token_vocab": 60_000} if multitask else {}
    )
    state, train_step, rng, bsh = bench._build(config, mesh, **kwargs)

    corpus = bench._full_length_corpus(bench.BATCH * 2, seed=0)
    nrng = np.random.default_rng(7)
    masker = WholeWordMasker(MaskingParams(max_seq_length=bench.SEQ), seed=1)
    pool = []
    for b in range(2):
        samples = []
        for i in range(bench.BATCH):
            words = corpus[b * bench.BATCH + i]["phonemes"]
            tids = (
                nrng.integers(5, 60_000, size=len(words)).tolist()
                if multitask else None
            )
            samples.append(
                masker(words, epoch=0, index=i, token_ids=tids)
            )
        pool.append(
            jax.device_put(
                batch_to_arrays(collate_fixed(samples, bench.SEQ)), bsh
            )
        )

    # warm up / compile outside the trace
    for i in range(3):
        state, metrics = train_step(state, pool[i % 2], rng)
    _ = float(metrics["phoneme_loss"])  # host read = real sync under axon

    with jax.profiler.trace(trace_dir):
        for i in range(steps):
            state, metrics = train_step(state, pool[i % 2], rng)
        _ = float(metrics["phoneme_loss"])
    print(f"trace OK -> {trace_dir}", flush=True)


def parse_xplane(trace_dir: str, steps: int):
    """Aggregate device-plane op durations by category from the newest
    .xplane.pb under trace_dir (device-side timings are accurate through
    the axon tunnel; wall-clock is not — CLAUDE.md perf ledger)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name:
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        step_ps = sum(
            ev.duration_ps
            for line in plane.lines if line.name == "Steps"
            for ev in line.events
        )
        total_by_name = defaultdict(int)
        for line in plane.lines:
            # EXACTLY the sync op line: 'Async XLA Ops' (in-flight copy
            # spans, overlapping) would triple-count, and so would the
            # control-flow wrappers below, whose inner ops appear as
            # their own events
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                base = name.lstrip("%").split(" ")[0].split(".")[0]
                if base in ("while", "conditional", "call", "copy-start"):
                    continue
                total_by_name[name] += ev.duration_ps
        if not total_by_name:
            continue
        if step_ps:
            print(f"\nSteps line: {step_ps/1e12*1000:.1f} ms total, "
                  f"{step_ps/1e12*1000/steps:.1f} ms/step")

        def cat(name: str) -> str:
            n = name.lower()
            if "pallas" in n or "attention" in n or "custom-call" in n:
                return "attention kernels / custom calls"
            if "fusion" in n:
                return "XLA fusions (FFN/elementwise)"
            if "convolution" in n or "dot" in n:
                return "matmuls"
            if "all-reduce" in n or "all-gather" in n or "reduce-scatter" in n:
                return "collectives"
            if "copy" in n or "transpose" in n or "bitcast" in n:
                return "layout/copies"
            if "sort" in n or "scatter" in n or "gather" in n:
                return "sort/scatter/gather (masked-CE)"
            return "other"

        by_cat = defaultdict(int)
        for name, ps in total_by_name.items():
            by_cat[cat(name)] += ps
        total = sum(by_cat.values())
        print(f"\n== device plane: {plane.name} ==")
        print(f"total device op time: {total/1e12*1000:.2f} ms "
              f"({total/1e12*1000/steps:.2f} ms/step over {steps} steps)")
        for c, ps in sorted(by_cat.items(), key=lambda kv: -kv[1]):
            print(f"  {c:40s} {ps/1e12*1000:8.2f} ms  {100*ps/total:5.1f}%")
        top = sorted(total_by_name.items(), key=lambda kv: -kv[1])[:12]
        print("  top ops:")
        for name, ps in top:
            print(f"    {ps/1e12*1000:8.2f} ms  {name[:90]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phoneme-only", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/xprof_multitask")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if args.phoneme_only and args.trace_dir == "/tmp/xprof_multitask":
        args.trace_dir = "/tmp/xprof_phoneme"
    if not args.parse_only:
        run_profiled_steps(
            not args.phoneme_only, args.trace_dir, args.steps
        )
    parse_xplane(args.trace_dir, args.steps)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
