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
    """Build a (data, model) mesh; data=-1 consumes remaining devices.

    Without an explicit ``devices`` list, the assignment is
    topology-aware (``mesh_utils.create_device_mesh``): the
    latency-critical MODEL axis (tensor-parallel all-reduces after every
    attention/FFN block) lands on adjacent ICI neighbors instead of
    whatever order ``jax.devices()`` enumerates — which interleaves
    hosts on a pod, putting TP traffic on DCN. An explicit ``devices``
    list is honored verbatim (tests pin specific sub-meshes)."""
    if devices is None:
        n = len(jax.devices())
        if model < 1 or n % model:
            raise ValueError(f"model axis {model} does not divide {n} devices")
        shape = (n // model if data == -1 else data, model)
        if shape[0] * model != n:
            raise ValueError(f"mesh {shape[0]}x{model} != {n} devices")
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_device_mesh(shape)
            return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
        except Exception:
            pass  # fall through to enumeration order (CPU backends etc.)
        devices = jax.devices()
    devices = list(devices)
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


def zero1_shardings(mesh: Mesh, tree) -> dict:
    """ZeRO-1 shardings for the optimizer state: each moment leaf keeps
    its tensor-parallel spec (the path-suffix rules above — optimizer
    paths end in the param path, so suffix matching applies unchanged)
    and ADDITIONALLY shards its first still-replicated, evenly-divisible
    dimension over the data axis.

    The reference replicates AdamW state per DDP rank (torch AdamW under
    accelerate, reference: train.py:272); at the multi-task shape the
    fp32 moments are ~430 MB per chip. Under GSPMD this single
    placement decision makes XLA compute the AdamW update sharded over
    the data axis and all-gather only the parameter delta — optimizer
    memory drops ~1/data_axis with no change to the update math
    (tests/test_zero1.py asserts bitwise step parity vs replicated
    state).

    ``tree`` is the optimizer-state pytree (or its eval_shape); scalars
    (adam counts) and non-divisible dims stay replicated.
    """
    dp = int(mesh.shape.get(DATA_AXIS, 1))

    def assign(path, leaf):
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        shape = tuple(getattr(leaf, "shape", ()))
        base = tuple(_spec_for(keys))
        spec = list(base) + [None] * (len(shape) - len(base))
        if dp > 1:
            for i, dim in enumerate(shape):
                # stack the data axis ONTO any tensor-parallel axes
                # already on this dim (e.g. a TP-sharded bias) when the
                # dim divides by the combined factor
                axes = (
                    () if spec[i] is None
                    else (spec[i],) if isinstance(spec[i], str)
                    else tuple(spec[i])
                )
                factor = dp
                for a in axes:
                    factor *= int(mesh.shape.get(a, 1))
                if dim % factor == 0:
                    spec[i] = (*axes, DATA_AXIS) if axes else DATA_AXIS
                    break
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(assign, tree)


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
