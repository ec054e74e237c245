"""Quantify the flax-vs-HF last_hidden_state gap (VERDICT r3 item 4).

The north star asks for "bitwise last_hidden_state parity vs HF
AlbertModel after export" (BASELINE.json configs[4]; reference export
contract: convert_to_hf.py:49). Bitwise fp32 identity between two BLAS
stacks (torch CPU sgemm vs XLA CPU) is not a meaningful target — their
in-product reduction orders differ, so individual float roundings
differ. What IS checkable:

1. fp64 semantic identity — run BOTH models in float64 on the SAME
   fp32 parameter values. If they agree to ~1e-12, every operation
   (gelu variant, LN eps placement, embedding sum, attention scaling)
   is mathematically identical and the fp32 residual is pure
   rounding, not a semantic divergence.
2. the measured fp32 envelope — the number the test gate should carry.

Run on CPU: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
    python tools/measure_export_parity.py
Prints one JSON line per shape with fp32/fp64 max-abs and max-rel
deviations, at both the unit-test shape and the flagship depth-12 shape.
"""

from __future__ import annotations

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


SHAPES = {
    "small_3L": {
        "hidden_size": 96, "num_attention_heads": 4,
        "intermediate_size": 192, "max_position_embeddings": 64,
        "num_hidden_layers": 3, "embedding_size": 48, "dropout": 0.0,
        "attention_impl": "xla",
    },
    "flagship_12L": {
        "hidden_size": 768, "num_attention_heads": 12,
        "intermediate_size": 2048, "max_position_embeddings": 512,
        "num_hidden_layers": 12, "embedding_size": 128, "dropout": 0.0,
        "attention_impl": "xla",
    },
}


def measure(name: str, mp: dict, seq: int, batch: int = 2) -> dict:
    import torch
    from transformers import AlbertModel as HFAlbert

    from pl_bert_tpu.config import Config, ModelParams
    from pl_bert_tpu.export.to_hf import export_checkpoint
    from pl_bert_tpu.models.albert import (
        AlbertConfig, AlbertModel as FlaxAlbert, build_model, init_params,
    )

    config = Config.from_dict(
        {"model_params": mp, "dataset_params": {"max_seq_length": seq}}
    )
    model = build_model(config.model_params, "fp32")
    params = init_params(model, seq, seed=7)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        export_checkpoint(params, config.to_dict(), tmp, step=0, epoch=0,
                          checkpoint_path="none")
        hf32 = HFAlbert.from_pretrained(tmp).eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 188, size=(batch, seq)).astype(np.int32)
    tids = torch.from_numpy(ids).long()

    with torch.no_grad():
        t32 = hf32(tids).last_hidden_state.numpy()
        t64 = hf32.double()(tids).last_hidden_state.numpy()

    enc = params["encoder"]
    out = {}
    for tag, dtype in (("fp32", jnp.float32), ("fp64", jnp.float64)):
        cfg = AlbertConfig.from_params(
            ModelParams(**mp), dtype=dtype
        )
        cast = jax.tree.map(lambda a: jnp.asarray(a, dtype), enc)
        fx, _ = FlaxAlbert(cfg).apply(
            {"params": cast}, jnp.asarray(ids), deterministic=True
        )
        fx = np.asarray(fx, dtype=np.float64)
        ref = t64 if tag == "fp64" else t32.astype(np.float64)
        denom = np.maximum(np.abs(ref), 1e-3)
        out[f"{tag}_max_abs"] = float(np.abs(fx - ref).max())
        out[f"{tag}_max_rel"] = float((np.abs(fx - ref) / denom).max())
        out[f"{tag}_out_scale"] = float(np.abs(ref).max())
    row = {"shape": name, "seq": seq, **out}
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    measure("small_3L", SHAPES["small_3L"], seq=64)
    measure("flagship_12L", SHAPES["flagship_12L"], seq=512)


if __name__ == "__main__":
    sys.exit(main())
