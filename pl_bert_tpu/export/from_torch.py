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

import os
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
    shardings/dtypes. Optimizer state is NOT imported here — this is
    the reference's warm-start semantics (train.py:274-276). For a
    true mid-flight continuation including the AdamW moments, use
    ``import_reference_run`` (or the module CLI, which converts the
    .pth into a resumable orbax ``step_N`` checkpoint).
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


def _moment_state_dicts(opt_sd: dict, net_sd: dict):
    """torch AdamW optimizer state → ``(exp_avg, exp_avg_sq, step)``
    with the moment dicts keyed by parameter NAME.

    torch keys optimizer state by the INDEX of each parameter in the
    list passed to ``AdamW(model.parameters())`` (reference:
    train.py:272); that order equals the parameter order of the model
    state dict (module registration order — verified against the live
    reference classes in tests). Params the optimizer never stepped
    (the unused ALBERT pooler — the reason the reference needs DDP
    ``find_unused_parameters``, train.py:219) have no state entry and
    get zero moments, matching what optax.adamw initializes for them.
    """
    import torch

    state = opt_sd.get("state") or {}
    if not state:
        raise ValueError(
            "checkpoint carries no optimizer state (empty 'optimizer') — "
            "use the warm-start path (import_reference_checkpoint / "
            "--params_only) instead"
        )
    names = list(net_sd.keys())
    groups = opt_sd.get("param_groups") or []
    n_indexed = sum(len(g["params"]) for g in groups)
    if n_indexed != len(names):
        # some transformers versions persist Albert embedding BUFFERS in
        # the model state dict (position_ids; token_type_ids in several
        # 4.x releases); buffers are never optimizer params
        names = [
            n for n in names
            if not any(b in n for b in ("position_ids", "token_type_ids"))
        ]
    if n_indexed != len(names):
        raise ValueError(
            f"optimizer indexes {n_indexed} params but the model state "
            f"dict has {len(names)} parameter-like keys — cannot align "
            "torch AdamW state by position (non-Albert buffers in the "
            "state dict, or extra optimizer param groups?)"
        )
    exp_avg: dict[str, Any] = {}
    exp_avg_sq: dict[str, Any] = {}
    steps = []
    for i, name in enumerate(names):
        entry = state.get(i, state.get(str(i)))
        if entry is None:
            exp_avg[name] = torch.zeros_like(net_sd[name])
            exp_avg_sq[name] = torch.zeros_like(net_sd[name])
        else:
            exp_avg[name] = entry["exp_avg"]
            exp_avg_sq[name] = entry["exp_avg_sq"]
            steps.append(int(entry["step"]))
    return exp_avg, exp_avg_sq, max(steps)


def _inject_adam_state(template_state, mu, nu, count: int):
    """Rebuild an optax state tree with the Adam moments/count replaced.

    Walks the (possibly chained — grad clipping, schedules) state
    namedtuples: ``ScaleByAdamState`` gets the imported mu/nu/count,
    ``ScaleByScheduleState`` gets the count (so an LR schedule resumes
    at the checkpoint's position); everything else passes through.
    """
    import jax
    import jax.numpy as jnp
    import optax

    c = jnp.asarray(count, jnp.int32)

    def cast_like(template_tree, tree):
        return jax.tree.map(
            lambda t, v: jnp.asarray(v, t.dtype), template_tree, tree
        )

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=c, mu=cast_like(node.mu, mu), nu=cast_like(node.nu, nu)
            )
        if isinstance(node, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(count=c)
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*(walk(getattr(node, f)) for f in node._fields))
        if isinstance(node, tuple):
            return tuple(walk(child) for child in node)
        return node

    return walk(template_state)


def import_reference_run(
    path: str, params_template: Any, tx
) -> tuple[dict, Any, int, int]:
    """Full-state import of a reference training save:
    ``(flax_params, optax_opt_state, step, epoch)``.

    Unlike ``import_reference_checkpoint`` (warm-start: params only),
    this also maps the torch AdamW moments (reference: train.py:272,
    saved at train.py:412-425) onto ``tx``'s optax state, so a
    mid-flight reference run CONTINUES exactly — no moment re-warm bump
    at the resume point. ``exp_avg``/``exp_avg_sq`` pass through the
    identical name/transpose pipeline as their weights; the shared
    update count carries into bias correction (same convention on both
    sides) and into any LR-schedule position. Trajectory parity with
    torch continuing the same run is pinned in
    tests/test_import_reference_checkpoint.py.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if not (isinstance(ckpt, dict) and "net" in ckpt):
        raise ValueError(
            "not a full reference training save ({'net', 'step', 'epoch', "
            "'optimizer'}, reference train.py:412-425) — a bare state "
            "dict has no optimizer state; use import_reference_checkpoint"
        )
    net_sd = _strip_ddp_prefix(ckpt["net"])
    step, epoch = int(ckpt.get("step", 0)), int(ckpt.get("epoch", 0))

    params = reference_state_dict_to_flax(net_sd)
    _validate_against_template(params, params_template)

    exp_avg_sd, exp_avg_sq_sd, count = _moment_state_dicts(
        ckpt.get("optimizer") or {}, net_sd
    )
    # the moments are shaped exactly like their weights, so the same
    # state-dict → Flax mapping (renames AND transposes) applies
    mu = reference_state_dict_to_flax(exp_avg_sd)
    nu = reference_state_dict_to_flax(exp_avg_sq_sd)
    _validate_against_template(mu, params_template)
    _validate_against_template(nu, params_template)

    from pl_bert_tpu.training.checkpoint import _place_like

    params = _place_like(params_template, params)
    opt_state = _inject_adam_state(tx.init(params), mu, nu, count)
    return params, opt_state, step, epoch


def main(argv=None) -> None:
    """CLI: convert a reference ``step_N.pth`` into this build's orbax
    ``step_N`` checkpoint inside a run directory, so a plain
    ``python -m pl_bert_tpu.training.train --run_name <run>`` RESUMES
    the reference run — full optimizer state included — exactly like
    one of its own checkpoints."""
    import argparse
    import json
    import shutil

    parser = argparse.ArgumentParser(
        description="reference step_N.pth → resumable orbax checkpoint"
    )
    parser.add_argument("--pth", required=True, help="reference step_N.pth")
    parser.add_argument(
        "--config_path", default="configs/config.yml",
        help="YAML config with the matching model shape",
    )
    parser.add_argument(
        "--run_dir", required=True,
        help="run directory to write step_N/ into (output_dir/run_name); "
        "the config copy that marks it resumable is written too",
    )
    parser.add_argument(
        "--params_only", action="store_true",
        help="skip the optimizer state (reference warm-start semantics); "
        "required when the .pth carries an empty 'optimizer'",
    )
    ns = parser.parse_args(argv)

    from pl_bert_tpu.config import Config
    from pl_bert_tpu.models.albert import build_model, init_params
    from pl_bert_tpu.training.checkpoint import save_checkpoint
    from pl_bert_tpu.training.train_step import make_optimizer

    config = Config.load(ns.config_path)
    tp, dp, mp = (
        config.training_params, config.dataset_params, config.model_params
    )
    model = build_model(mp, tp.mixed_precision)
    template = init_params(model, dp.max_seq_length, seed=tp.seed)
    tx = make_optimizer(tp)
    if ns.params_only:
        params, step, epoch = import_reference_checkpoint(ns.pth, template)
        opt_state = tx.init(params)
    else:
        params, opt_state, step, epoch = import_reference_run(
            ns.pth, template, tx
        )

    os.makedirs(ns.run_dir, exist_ok=True)
    # the config copy is the resume marker, named after the config file
    # (train.py::setup_config_and_directories; reference train.py:184-208).
    # Write it BEFORE the checkpoint: the reverse order leaves a window
    # where an interrupted conversion produces a marker-less run dir
    # whose step_N the trainer's stale-run cleanup would silently delete.
    shutil.copyfile(
        ns.config_path,
        os.path.join(ns.run_dir, os.path.basename(ns.config_path)),
    )
    path = save_checkpoint(ns.run_dir, step, params, opt_state, epoch=epoch)
    print(json.dumps({
        "checkpoint": path, "step": step, "epoch": epoch,
        "optimizer_state": "fresh" if ns.params_only else "imported",
    }), flush=True)


if __name__ == "__main__":
    main()
