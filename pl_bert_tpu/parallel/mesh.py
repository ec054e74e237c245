"""Device mesh construction and sharding rules.

The reference scales with torch DDP over NCCL (reference:
train.py:218-221); the TPU-native equivalent is a 2-D
``Mesh(('data', 'model'))`` over ICI with GSPMD partitioning
(SURVEY §2.3): the batch shards over ``data`` (gradient all-reduce
becomes an XLA psum over ICI), and — beyond the reference's pure-DP
story — the shared ALBERT layer's wide matmuls (FFN, QKV heads) can
shard over ``model`` for tensor parallelism. ``model=1`` reproduces the
reference's exact semantics (fully replicated params).

Multi-slice scaling over DCN needs no code change: a larger mesh with
the same specs is sufficient under SPMD.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1, model: int = 1, devices=None
) -> Mesh:
    """Build a (data, model) mesh; data=-1 consumes remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model < 1 or n % model:
        raise ValueError(f"model axis {model} does not divide {n} devices")
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    grid = np.asarray(devices).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays shard along axis 0 over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def microbatch_sharding(mesh: Mesh) -> NamedSharding:
    """Gradient-accumulation batches [accum, batch, ...] keep the
    micro-step axis replicated (the step lax.scans over it) and shard
    the batch axis over the data axis — no resharding at scan slices."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


# (path-suffix match, PartitionSpec) — first hit wins. Kernels are
# [in, out]; shard FFN/QKV on the output (head/intermediate) dim and the
# contraction input dim of the projections that read sharded activations,
# so each model-parallel rank holds a head/intermediate slice and the
# all-reduce lands after dense/ffn_output (standard Megatron split).
_RULES: list[tuple[tuple[str, ...], P]] = [
    (("attention", "query", "kernel"), P(None, MODEL_AXIS)),
    (("attention", "key", "kernel"), P(None, MODEL_AXIS)),
    (("attention", "value", "kernel"), P(None, MODEL_AXIS)),
    (("attention", "query", "bias"), P(MODEL_AXIS)),
    (("attention", "key", "bias"), P(MODEL_AXIS)),
    (("attention", "value", "bias"), P(MODEL_AXIS)),
    (("attention", "dense", "kernel"), P(MODEL_AXIS, None)),
    (("ffn", "kernel"), P(None, MODEL_AXIS)),
    (("ffn", "bias"), P(MODEL_AXIS)),
    (("ffn_output", "kernel"), P(MODEL_AXIS, None)),
    # vocab-parallel grapheme head: the 60k-vocab projection and its
    # chunked log-softmax shard over the model axis (GSPMD inserts the
    # max/sum all-reduces); 184 MB of fp32 master weights + optimizer
    # state stop being replicated per model rank
    (("token_predictor", "kernel"), P(None, MODEL_AXIS)),
    (("token_predictor", "bias"), P(MODEL_AXIS)),
]


def _spec_for(path: tuple[str, ...]) -> P:
    for suffix, spec in _RULES:
        if len(path) >= len(suffix) and tuple(path[-len(suffix):]) == suffix:
            return spec
    return P()  # replicate everything else (embeddings, LN, heads)


def param_shardings(mesh: Mesh, params) -> dict:
    """Pytree of NamedShardings matching ``params``' structure."""

    def assign(path, leaf):
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        return NamedSharding(mesh, _spec_for(keys))

    return jax.tree_util.tree_map_with_path(assign, params)


def put_global(value, sharding: NamedSharding):
    """``device_put`` that also works when ``sharding`` spans processes.

    Multi-host contract: every process holds the SAME full (global) host
    array — true for this build's deterministic data pipeline (batches
    derive from (seed, epoch) Philox streams over a shared store) and
    for host-initialized/restored params — and each process contributes
    only its addressable shards. Single-process keeps the plain
    ``device_put`` fast path."""
    if jax.process_count() == 1:
        return jax.device_put(value, sharding)
    value = np.asarray(value)
    return jax.make_array_from_callback(
        value.shape, sharding, lambda idx: value[idx]
    )


def shard_params(params, mesh: Mesh):
    """Place params on the mesh according to the rules."""
    shardings = param_shardings(mesh, params)
    return jax.tree.map(put_global, params, shardings)
