"""JAX ↔ HuggingFace AlbertModel interop.

Reproduces the reference export contract (reference: convert_to_hf.py:16-102):
the trained encoder saves as an HF ``AlbertModel`` directory that drops
into StyleTTS fine-tuning unchanged, alongside the full model state
(``pl_bert_full_model.pt``), ``training_metadata.txt`` and a config copy.

Fixes the reference's vocab-size bug: the reference omits
``vocab_size=len(symbols)`` when rebuilding ``AlbertConfig`` for export
(reference: convert_to_hf.py:27) so the embedding row-count mismatches
and is silently dropped by ``strict=False``; here the config always
carries the real vocab size.

Weight layout notes: torch ``nn.Linear`` stores [out, in] — transposed
vs Flax Dense kernels [in, out]; embedding tables carry over untransposed.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import yaml

# Flax-side path of every HF AlbertModel tensor, relative to the encoder
# param sub-tree. (hf_suffix, flax_path, transpose)
_HF_LAYER_PREFIX = "encoder.albert_layer_groups.0.albert_layers.0."
_ENCODER_MAP: list[tuple[str, tuple[str, ...], bool]] = [
    ("embeddings.word_embeddings.weight",
     ("embeddings", "word_embeddings", "embedding"), False),
    ("embeddings.position_embeddings.weight",
     ("embeddings", "position_embeddings", "embedding"), False),
    ("embeddings.token_type_embeddings.weight",
     ("embeddings", "token_type_embeddings", "embedding"), False),
    ("embeddings.LayerNorm.weight", ("embeddings", "LayerNorm", "scale"), False),
    ("embeddings.LayerNorm.bias", ("embeddings", "LayerNorm", "bias"), False),
    ("encoder.embedding_hidden_mapping_in.weight",
     ("encoder", "embedding_hidden_mapping_in", "kernel"), True),
    ("encoder.embedding_hidden_mapping_in.bias",
     ("encoder", "embedding_hidden_mapping_in", "bias"), False),
    (_HF_LAYER_PREFIX + "attention.query.weight",
     ("encoder", "albert_layer", "attention", "query", "kernel"), True),
    (_HF_LAYER_PREFIX + "attention.query.bias",
     ("encoder", "albert_layer", "attention", "query", "bias"), False),
    (_HF_LAYER_PREFIX + "attention.key.weight",
     ("encoder", "albert_layer", "attention", "key", "kernel"), True),
    (_HF_LAYER_PREFIX + "attention.key.bias",
     ("encoder", "albert_layer", "attention", "key", "bias"), False),
    (_HF_LAYER_PREFIX + "attention.value.weight",
     ("encoder", "albert_layer", "attention", "value", "kernel"), True),
    (_HF_LAYER_PREFIX + "attention.value.bias",
     ("encoder", "albert_layer", "attention", "value", "bias"), False),
    (_HF_LAYER_PREFIX + "attention.dense.weight",
     ("encoder", "albert_layer", "attention", "dense", "kernel"), True),
    (_HF_LAYER_PREFIX + "attention.dense.bias",
     ("encoder", "albert_layer", "attention", "dense", "bias"), False),
    (_HF_LAYER_PREFIX + "attention.LayerNorm.weight",
     ("encoder", "albert_layer", "attention", "LayerNorm", "scale"), False),
    (_HF_LAYER_PREFIX + "attention.LayerNorm.bias",
     ("encoder", "albert_layer", "attention", "LayerNorm", "bias"), False),
    (_HF_LAYER_PREFIX + "ffn.weight",
     ("encoder", "albert_layer", "ffn", "kernel"), True),
    (_HF_LAYER_PREFIX + "ffn.bias",
     ("encoder", "albert_layer", "ffn", "bias"), False),
    (_HF_LAYER_PREFIX + "ffn_output.weight",
     ("encoder", "albert_layer", "ffn_output", "kernel"), True),
    (_HF_LAYER_PREFIX + "ffn_output.bias",
     ("encoder", "albert_layer", "ffn_output", "bias"), False),
    (_HF_LAYER_PREFIX + "full_layer_layer_norm.weight",
     ("encoder", "albert_layer", "full_layer_layer_norm", "scale"), False),
    (_HF_LAYER_PREFIX + "full_layer_layer_norm.bias",
     ("encoder", "albert_layer", "full_layer_layer_norm", "bias"), False),
    ("pooler.weight", ("pooler", "kernel"), True),
    ("pooler.bias", ("pooler", "bias"), False),
]


def _get(tree: dict, path: tuple[str, ...]):
    for key in path:
        tree = tree[key]
    return tree


def _set(tree: dict, path: tuple[str, ...], value) -> None:
    for key in path[:-1]:
        tree = tree.setdefault(key, {})
    tree[path[-1]] = value


def flax_encoder_to_hf_state_dict(encoder_params: dict) -> dict[str, Any]:
    """Encoder param sub-tree → torch state dict for HF AlbertModel."""
    import torch

    out = {}
    for hf_name, flax_path, transpose in _ENCODER_MAP:
        arr = np.asarray(_get(encoder_params, flax_path), dtype=np.float32)
        if transpose:
            arr = arr.T
        out[hf_name] = torch.from_numpy(np.ascontiguousarray(arr))
    return out


def hf_state_dict_to_flax_encoder(state_dict: dict) -> dict:
    """Torch HF AlbertModel state dict → Flax encoder param sub-tree."""
    tree: dict = {}
    for hf_name, flax_path, transpose in _ENCODER_MAP:
        arr = state_dict[hf_name].detach().cpu().numpy().astype(np.float32)
        if transpose:
            arr = arr.T
        _set(tree, flax_path, arr)
    return tree


def _head_to_hf(params: dict, flax_name: str, hf_prefix: str) -> dict:
    import torch

    head = params[flax_name]
    return {
        f"{hf_prefix}.weight": torch.from_numpy(
            np.ascontiguousarray(np.asarray(head["kernel"], np.float32).T)
        ),
        f"{hf_prefix}.bias": torch.from_numpy(
            np.asarray(head["bias"], np.float32)
        ),
    }


def full_model_state_dict(params: dict) -> dict:
    """Full model (encoder + heads) → torch state dict matching the
    reference MultiTaskModel/PhonemeOnlyModel naming (model.py:5-29)."""
    sd = {
        f"encoder.{k}": v
        for k, v in flax_encoder_to_hf_state_dict(params["encoder"]).items()
    }
    if "phoneme_predictor" in params:
        sd.update(_head_to_hf(params, "phoneme_predictor", "phoneme_predictor"))
    if "token_predictor" in params:
        sd.update(_head_to_hf(params, "token_predictor", "token_predictor"))
    return sd


def hf_albert_config(model_params: dict):
    """Build the HF AlbertConfig for export — including the vocab_size the
    reference forgot."""
    from transformers import AlbertConfig as HFConfig

    return HFConfig(
        vocab_size=int(model_params.get("vocab_size", 188)),
        embedding_size=int(model_params.get("embedding_size", 128)),
        hidden_size=int(model_params["hidden_size"]),
        num_attention_heads=int(model_params["num_attention_heads"]),
        intermediate_size=int(model_params["intermediate_size"]),
        max_position_embeddings=int(model_params["max_position_embeddings"]),
        num_hidden_layers=int(model_params["num_hidden_layers"]),
        # forward the semantically-loaded knobs too: an export of a model
        # trained with a non-default activation or LN epsilon must not
        # silently compute with the HF defaults downstream
        hidden_act=str(model_params.get("hidden_act", "gelu_new")),
        layer_norm_eps=float(model_params.get("layer_norm_eps", 1e-12)),
    )


def export_checkpoint(
    params: dict,
    config: dict,
    output_dir: str,
    step: int = 0,
    epoch: int = 0,
    checkpoint_path: str = "",
) -> None:
    """Write the full reference-compatible export artifact set."""
    import torch
    from transformers import AlbertModel as HFAlbert

    os.makedirs(output_dir, exist_ok=True)
    hf_cfg = hf_albert_config(config.get("model_params", {}))
    hf_model = HFAlbert(hf_cfg)
    missing, unexpected = hf_model.load_state_dict(
        flax_encoder_to_hf_state_dict(params["encoder"]), strict=False
    )
    # only HF-internal buffers (position_ids) may be absent
    real_missing = [m for m in missing if "position_ids" not in m]
    if real_missing or unexpected:
        raise ValueError(f"export mismatch: missing={real_missing} unexpected={unexpected}")
    hf_model.save_pretrained(output_dir)

    torch.save(
        full_model_state_dict(params),
        os.path.join(output_dir, "pl_bert_full_model.pt"),
    )
    with open(os.path.join(output_dir, "training_metadata.txt"), "w") as f:
        f.write(f"Original checkpoint: {checkpoint_path}\n")
        f.write(f"Step: {step}\n")
        f.write(f"Epoch: {epoch}\n")
    with open(os.path.join(output_dir, "config.yml"), "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)


def load_pl_bert_model(model_dir: str):
    """Load an exported directory back as (flax encoder params, config) —
    the inverse utility mirroring reference convert_to_hf.py:66-102."""
    from transformers import AlbertModel as HFAlbert

    with open(os.path.join(model_dir, "config.yml")) as f:
        config = yaml.safe_load(f)
    hf_model = HFAlbert.from_pretrained(model_dir)
    encoder = hf_state_dict_to_flax_encoder(hf_model.state_dict())
    return encoder, config
