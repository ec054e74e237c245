"""Measure the checkpoint-save stall: sync vs async_save, on-chip.

Builds the flagship training state (ALBERT-base shape, batch 96 × seq
512 — bench.py's workload), then times a window of train steps that
crosses one checkpoint save for (a) the blocking save_checkpoint path
and (b) AsyncCheckpointWriter. The difference is the per-save stall the
background writer removes from the step loop (the reference blocks on
``accelerator.save`` every 1000 steps; reference: train.py:369-370).

Usage: python tools/measure_async_save.py [out_dir]
Prints one JSON line; run via nohup on the axon rig (tunnel compiles
take minutes).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (the shared state-construction path)
from pl_bert_tpu.config import Config  # noqa: E402
from pl_bert_tpu.parallel.mesh import make_mesh  # noqa: E402
from pl_bert_tpu.training.checkpoint import (  # noqa: E402
    AsyncCheckpointWriter,
    save_checkpoint,
)

STEPS = 8  # window length; the save lands after step 3


def _window(state, train_step, rng, pool, saver) -> tuple[float, object]:
    """Wall time of STEPS steps with one checkpoint save injected."""
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = train_step(state, pool[i % len(pool)], rng)
        if i == 3:
            saver(state)
    float(metrics["loss"])  # host read: drain the async chain
    return time.perf_counter() - t0, state


def main() -> None:
    if len(sys.argv) > 1:
        out_root, created_root = sys.argv[1], False
    else:
        out_root, created_root = tempfile.mkdtemp(prefix="plb_async_save_"), True
    config = Config.from_dict({})
    config.training_params.batch_size = bench.BATCH
    mesh = make_mesh(-1, 1)
    state, train_step, rng, bsh = bench._build(config, mesh)
    pool = bench._host_masked_pool(bsh)

    # warmup: compile + one throwaway save (orbax lazy init)
    for i in range(3):
        state, metrics = train_step(state, pool[i % len(pool)], rng)
    float(metrics["loss"])
    save_checkpoint(os.path.join(out_root, "warm"), 0, state.params,
                    state.opt_state)

    # baseline window with NO save at all
    dt_none, state = _window(state, train_step, rng, pool,
                             lambda s: None)

    dt_sync, state = _window(
        state, train_step, rng, pool,
        lambda s: save_checkpoint(
            os.path.join(out_root, "sync"), 1, s.params, s.opt_state
        ),
    )

    writer = AsyncCheckpointWriter()
    dt_async, state = _window(
        state, train_step, rng, pool,
        lambda s: writer.submit(
            os.path.join(out_root, "async"), 1, s.params, s.opt_state
        ),
    )
    writer.wait()  # the write must really land

    if created_root:  # never delete a user-supplied directory wholesale
        shutil.rmtree(out_root, ignore_errors=True)
    else:
        for sub in ("warm", "sync", "async"):
            shutil.rmtree(os.path.join(out_root, sub), ignore_errors=True)
    print(json.dumps({
        "metric": "checkpoint_save_stall_ms",
        "value": round((dt_sync - dt_none) * 1e3, 1),
        "unit": "ms/save",
        "async_stall_ms": round((dt_async - dt_none) * 1e3, 1),
        "window_no_save_s": round(dt_none, 3),
        "window_sync_save_s": round(dt_sync, 3),
        "window_async_save_s": round(dt_async, 3),
    }))


if __name__ == "__main__":
    main()
