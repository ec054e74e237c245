"""Checkpoint management.

Keeps the reference's artifact contract (reference: train.py:46-105,
412-425): checkpoints named ``step_{N}`` inside the run directory,
latest discovered by parsing names, state = {params, optimizer state,
step, epoch}. Storage is orbax (sharded-array aware, TPU-native)
instead of torch pickles; state trees are round-tripped through
``flax.serialization`` state-dicts so optax container types restore
onto arbitrary templates. Unlike the reference, the data-pipeline
position (epoch, batch index) is saved so resume is order-deterministic
(SURVEY §5).
"""

from __future__ import annotations

import os
import re
import shutil
import threading
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import serialization

_STEP_RE = re.compile(r"^step_(\d+)$")


def find_latest_checkpoint(log_dir: str) -> tuple[bool, int]:
    """Scan run dir for step_* checkpoints → (found, latest_step)."""
    try:
        steps = [
            int(m.group(1))
            for name in os.listdir(log_dir)
            if (m := _STEP_RE.match(name))
            and os.path.isdir(os.path.join(log_dir, name))
        ]
    except OSError:
        return False, 0
    if not steps:
        return False, 0
    return True, max(steps)


def list_checkpoints(log_dir: str) -> list[int]:
    """Every step_N in the run dir, ascending (empty on a missing or
    checkpoint-free dir)."""
    try:
        return sorted(
            int(m.group(1))
            for name in os.listdir(log_dir)
            if (m := _STEP_RE.match(name))
            and os.path.isdir(os.path.join(log_dir, name))
        )
    except OSError:
        return []


def checkpoint_path(log_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(log_dir), f"step_{step}")


def save_checkpoint(
    log_dir: str,
    step: int,
    params: Any,
    opt_state: Any,
    epoch: int = 0,
    batch_in_epoch: int = 0,
    keep: int = 0,
) -> str:
    """Write step_{N}; optionally retain only the newest ``keep``."""
    path = checkpoint_path(log_dir, step)
    payload = {
        "params": serialization.to_state_dict(params),
        "opt_state": serialization.to_state_dict(opt_state),
        "meta": {
            "step": np.int64(step),
            "epoch": np.int64(epoch),
            "batch_in_epoch": np.int64(batch_in_epoch),
        },
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    if keep > 0 and jax.process_index() == 0:  # one janitor per cluster
        found = sorted(
            int(m.group(1))
            for name in os.listdir(log_dir)
            if (m := _STEP_RE.match(name))
        )
        for old in found[:-keep]:
            shutil.rmtree(checkpoint_path(log_dir, old), ignore_errors=True)
    return path


class AsyncCheckpointWriter:
    """Overlap checkpoint writes with training (training_params.async_save).

    ``submit`` snapshots the state into FRESH device buffers via a
    jitted identity (XLA never aliases outputs to inputs without a
    donation annotation, so the snapshot survives the next step's
    donated-buffer reuse), enqueues the device→host transfers, and runs
    the orbax write + retention janitor in a background thread. The
    train loop stalls only for the snapshot dispatch — not the host
    transfer or the disk IO the reference's ``accelerator.save`` blocks
    on every 1000 steps (reference: train.py:369-370, 412-425).

    One write in flight at a time: ``submit`` joins the previous write
    first (a save_interval's worth of compute is the natural write
    budget). Call ``wait()`` before reading checkpoints back or exiting.
    A failed write re-raises from the next ``wait()``/``submit`` — a
    checkpoint that silently never landed would defeat elastic resume.
    """

    def __init__(self) -> None:
        self._thread: threading.Thread | None = None
        self._error: BaseException | None = None
        self._snapshot = jax.jit(lambda tree: tree)

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            error, self._error = self._error, None
            raise error

    def submit(
        self,
        log_dir: str,
        step: int,
        params: Any,
        opt_state: Any,
        epoch: int = 0,
        batch_in_epoch: int = 0,
        keep: int = 0,
    ) -> None:
        self.wait()
        snap = self._snapshot({"params": params, "opt_state": opt_state})
        for leaf in jax.tree.leaves(snap):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()

        def _write() -> None:
            try:
                save_checkpoint(
                    log_dir, step, snap["params"], snap["opt_state"],
                    epoch=epoch, batch_in_epoch=batch_in_epoch, keep=keep,
                )
            except BaseException as e:  # surfaced by the next wait()
                self._error = e

        self._thread = threading.Thread(
            target=_write, name=f"ckpt-write-step-{step}", daemon=True
        )
        self._thread.start()


def _place_like(template: Any, tree: Any) -> Any:
    """Place restored leaves onto the template's shardings (multi-process
    safe: every process restores the full array from disk and contributes
    its addressable shards). An ABSTRACT template (``jax.eval_shape``
    ShapeDtypeStructs, ``sharding=None``) yields host numpy arrays —
    loaders that only need structure/shape validation (serving /reload,
    HF export) use this to avoid compiling a device-side ``model.init``
    just to build the restore template."""
    from pl_bert_tpu.parallel.mesh import put_global

    def place(tmpl, arr):
        sharding = getattr(tmpl, "sharding", None)
        if sharding is not None:
            return put_global(np.asarray(arr, dtype=tmpl.dtype), sharding)
        if isinstance(tmpl, jax.ShapeDtypeStruct):
            return np.asarray(arr, dtype=tmpl.dtype)
        return arr

    return jax.tree.map(place, template, tree)


def load_checkpoint(
    path: str, params_template: Any, opt_state_template: Any
) -> tuple[Any, Any, dict]:
    """Restore (params, opt_state, meta) onto the templates' shardings."""
    with ocp.PyTreeCheckpointer() as ckptr:
        raw = ckptr.restore(os.path.abspath(path))
    params = serialization.from_state_dict(params_template, raw["params"])
    opt_state = serialization.from_state_dict(opt_state_template, raw["opt_state"])
    meta = {k: int(v) for k, v in raw["meta"].items()}
    return (
        _place_like(params_template, params),
        _place_like(opt_state_template, opt_state),
        meta,
    )


def load_checkpoint_meta(path: str) -> dict:
    """Just the ``{'step', 'epoch', ...}`` meta of a checkpoint — an
    orbax ``step_N`` dir or a reference torch ``.pth`` (provenance for
    export metadata; reference records epoch at convert_to_hf.py:58)."""
    if os.path.isfile(path) and path.endswith((".pth", ".pt")):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(ckpt, dict) and "net" in ckpt:
            return {
                "step": int(ckpt.get("step", 0)),
                "epoch": int(ckpt.get("epoch", 0)),
            }
        return {"step": 0, "epoch": 0}
    with ocp.PyTreeCheckpointer() as ckptr:
        raw = ckptr.restore(os.path.abspath(path))
    return {k: int(v) for k, v in raw["meta"].items()}


def load_params_only(path: str, params_template: Any) -> Any:
    """Warm-start: restore params only, ignore optimizer state
    (reference pretrained_model semantics, train.py:274-276). Accepts
    both this build's orbax ``step_N`` directories and the reference's
    torch ``step_N.pth`` pickles (reference: train.py:412-425), so a
    published reference checkpoint continues directly on TPU."""
    if os.path.isfile(path) and path.endswith((".pth", ".pt")):
        from pl_bert_tpu.export.from_torch import import_reference_checkpoint

        params, _, _ = import_reference_checkpoint(path, params_template)
        return params
    with ocp.PyTreeCheckpointer() as ckptr:
        raw = ckptr.restore(os.path.abspath(path))
    params = serialization.from_state_dict(params_template, raw["params"])
    return _place_like(params_template, params)
