"""Reference torch checkpoint ingestion.

The reference trains and resumes from ``step_N.pth`` torch pickles
holding ``{'net': state_dict, 'step', 'epoch', 'optimizer'}``
(reference: train.py:412-425), loaded with a ``module.`` DDP-prefix
strip (reference: train.py:81-105); upstream publishes a 1M-step
checkpoint in this format (README.md:121). This module imports such a
checkpoint as Flax params so a real migration can CONTINUE a reference
run on TPU — the interop direction ``export/to_hf.py`` doesn't cover.

Weight mapping reuses the bidirectional ``_ENCODER_MAP`` (the
reference's ``model.encoder`` IS an HF ``AlbertModel``, so its
state-dict keys are exactly the HF names); the prediction heads are
plain ``nn.Linear`` ([out, in] → transposed Flax kernels). Both head
sets import: ``PhonemeOnlyModel`` (phoneme_predictor only) and
``MultiTaskModel`` (+ token_predictor) — reference model.py:5-29.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from pl_bert_tpu.export.to_hf import hf_state_dict_to_flax_encoder


def _strip_ddp_prefix(state_dict: dict) -> dict:
    # reference: train.py:98 — DDP wraps keys as 'module.<name>'; strip
    # ONLY the leading prefix (a replace() would corrupt any key merely
    # containing 'module.' mid-name)
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def _to_numpy(t) -> np.ndarray:
    return t.detach().cpu().numpy().astype(np.float32)


def reference_state_dict_to_flax(state_dict: dict) -> dict:
    """Torch ``PhonemeOnlyModel``/``MultiTaskModel`` state dict → Flax
    param tree ``{encoder, phoneme_predictor[, token_predictor]}``."""
    state_dict = _strip_ddp_prefix(state_dict)
    encoder_sd = {
        k[len("encoder."):]: v
        for k, v in state_dict.items()
        if k.startswith("encoder.")
    }
    params: dict[str, Any] = {
        "encoder": hf_state_dict_to_flax_encoder(encoder_sd)
    }
    for head in ("phoneme_predictor", "token_predictor"):
        w, b = f"{head}.weight", f"{head}.bias"
        if w in state_dict:
            params[head] = {
                # nn.Linear stores [out, in]; Flax Dense kernels [in, out]
                "kernel": np.ascontiguousarray(_to_numpy(state_dict[w]).T),
                "bias": _to_numpy(state_dict[b]),
            }
    if "phoneme_predictor" not in params:
        raise ValueError(
            "checkpoint has no phoneme_predictor head — not a PL-BERT "
            "model checkpoint (reference model.py:5-29)"
        )
    return params


def _validate_against_template(params: dict, template: Any) -> None:
    """Every template leaf must be present with the right shape — a
    silent shape drop here is exactly the reference's strict=False
    export bug (convert_to_hf.py:27) this build refuses to repeat."""
    import jax

    t_leaves = {
        "/".join(str(k.key) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(template)[0]
    }
    p_leaves = {
        "/".join(str(k.key) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    missing = sorted(set(t_leaves) - set(p_leaves))
    extra = sorted(set(p_leaves) - set(t_leaves))
    bad_shapes = sorted(
        f"{k}: checkpoint {p_leaves[k].shape} != model {t_leaves[k].shape}"
        for k in set(t_leaves) & set(p_leaves)
        if tuple(p_leaves[k].shape) != tuple(t_leaves[k].shape)
    )
    if missing or extra or bad_shapes:
        raise ValueError(
            "reference checkpoint does not match the model:\n"
            f"  missing from checkpoint: {missing}\n"
            f"  not in model: {extra}\n"
            f"  shape mismatches: {bad_shapes}\n"
            "(check vocab_size/num_token_vocab/model shape in the config)"
        )


def import_reference_checkpoint(
    path: str, params_template: Any = None
) -> tuple[dict, int, int]:
    """Load a reference ``step_N.pth`` → ``(flax_params, step, epoch)``.

    Accepts both the full training save ``{'net', 'step', 'epoch',
    'optimizer'}`` and a bare model state dict (step/epoch default 0).
    With ``params_template`` given, the imported tree is validated
    leaf-by-leaf (names AND shapes) and placed onto the template's
    shardings/dtypes. Optimizer state is NOT imported: torch AdamW
    moments don't transfer meaningfully onto optax's tree layout, so a
    continued run re-warms the optimizer (same policy as the
    reference's own warm-start path, train.py:274-276).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "net" in ckpt:
        state_dict, step, epoch = (
            ckpt["net"], int(ckpt.get("step", 0)), int(ckpt.get("epoch", 0))
        )
    else:
        state_dict, step, epoch = ckpt, 0, 0
    params = reference_state_dict_to_flax(state_dict)
    if params_template is not None:
        _validate_against_template(params, params_template)
        from pl_bert_tpu.training.checkpoint import _place_like

        params = _place_like(params_template, params)
    return params, step, epoch
