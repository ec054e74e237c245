"""Reference-format training-checkpoint export (TPU → torch).

Writes the reference's own ``step_N.pth`` layout ``{'net', 'step',
'epoch', 'optimizer'}`` (reference: train.py:412-425) INCLUDING the
torch AdamW optimizer state mapped from the optax moments, so a TPU
training run RESUMES on the reference stack via its normal checkpoint
load (reference: train.py:81-105) — the reverse of
``export.from_torch``. Together the two modules make mid-flight
migration bidirectional; round-trip trajectory parity (torch → TPU →
torch vs an uninterrupted torch run) is pinned in
tests/test_import_reference_checkpoint.py.

Alignment convention: torch keys optimizer state by each parameter's
index in ``model.parameters()`` order, which for the reference wrapper
is the HF ``AlbertModel`` state-dict parameter order followed by the
prediction heads (module registration order, reference model.py:5-29).
That order is derived here from a live ``AlbertModel`` instance rather
than hardcoded, and the exported ``net`` dict is emitted in the same
order so a re-import aligns identically.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from pl_bert_tpu.export.to_hf import full_model_state_dict, hf_albert_config


def _reference_param_order(model_params: dict, heads: list[str]) -> list[str]:
    """Parameter names in the reference wrapper's registration order."""
    from transformers import AlbertModel as HFAlbert

    encoder = HFAlbert(hf_albert_config(model_params))
    names = [
        f"encoder.{k}"
        for k, _ in encoder.named_parameters()  # params only, no buffers
    ]
    for head in heads:
        names += [f"{head}.weight", f"{head}.bias"]
    return names


def _find_adam_state(node):
    import optax

    if isinstance(node, optax.ScaleByAdamState):
        return node
    if isinstance(node, tuple):
        children = (
            [getattr(node, f) for f in node._fields]
            if hasattr(node, "_fields") else list(node)
        )
        for child in children:
            found = _find_adam_state(child)
            if found is not None:
                return found
    return None


def export_reference_checkpoint(
    params: dict,
    opt_state: Any,
    training_params,
    path: str,
    step: int = 0,
    epoch: int = 0,
) -> None:
    """Write ``params``/``opt_state`` as a reference ``step_N.pth``.

    The AdamW moments pass through the same name/transpose mapping as
    their weights (``full_model_state_dict``); the optax update count
    becomes every entry's torch ``step`` tensor. Params with all-zero
    moments (the unused pooler) get NO state entry — exactly what the
    reference's own saves contain for never-stepped params, and what
    lets its DDP ``find_unused_parameters`` runs reload cleanly.
    """
    import torch

    adam = _find_adam_state(opt_state)
    if adam is None:
        raise ValueError("opt_state contains no ScaleByAdamState — "
                         "not an AdamW-family optimizer state")
    count = int(np.asarray(adam.count))

    net_unordered = full_model_state_dict(params)
    mu_sd = full_model_state_dict(adam.mu)
    nu_sd = full_model_state_dict(adam.nu)

    heads = [h for h in ("phoneme_predictor", "token_predictor") if h in params]
    names = _reference_param_order(
        {
            "vocab_size": params["encoder"]["embeddings"]["word_embeddings"][
                "embedding"
            ].shape[0],
            "embedding_size": params["encoder"]["embeddings"][
                "word_embeddings"
            ]["embedding"].shape[1],
            "hidden_size": net_unordered["encoder.pooler.weight"].shape[0],
            "num_attention_heads": 1,  # irrelevant to parameter ordering
            "intermediate_size": net_unordered["encoder." + (
                "encoder.albert_layer_groups.0.albert_layers.0.ffn.weight"
            )].shape[0],
            "max_position_embeddings": net_unordered[
                "encoder.embeddings.position_embeddings.weight"
            ].shape[0],
            "num_hidden_layers": 1,  # shared layer: ordering-irrelevant
        },
        heads,
    )
    missing = set(names) - set(net_unordered)
    extra = set(net_unordered) - set(names)
    if missing or extra:
        raise ValueError(
            "export naming drift vs the reference parameter order: "
            f"missing {sorted(missing)}, extra {sorted(extra)}"
        )
    net_sd = {name: net_unordered[name] for name in names}

    # torch AdamW group template taken from a live instance so the dict
    # carries every option key this torch version's step() reads
    probe = torch.optim.AdamW(
        [torch.nn.Parameter(torch.zeros(1))],
        lr=training_params.learning_rate,
        betas=(training_params.adam_b1, training_params.adam_b2),
        eps=training_params.adam_eps,
        weight_decay=training_params.weight_decay,
    )
    group = {k: v for k, v in probe.param_groups[0].items() if k != "params"}
    group["params"] = list(range(len(names)))

    state = {}
    for i, name in enumerate(names):
        exp_avg, exp_avg_sq = mu_sd[name], nu_sd[name]
        if not (exp_avg.abs().any() or exp_avg_sq.abs().any()):
            continue  # never-stepped param (reference saves omit these)
        state[i] = {
            "step": torch.tensor(float(count)),
            "exp_avg": exp_avg,
            "exp_avg_sq": exp_avg_sq,
        }

    torch.save(
        {
            "net": net_sd,
            "step": int(step),
            "epoch": int(epoch),
            "optimizer": {"state": state, "param_groups": [group]},
        },
        path,
    )


def main(argv=None) -> None:
    """CLI: orbax ``step_N`` → reference ``step_N.pth`` (full state)."""
    import argparse
    import json

    parser = argparse.ArgumentParser(
        description="export an orbax step_N checkpoint as a reference "
        "torch step_N.pth the reference trainer can resume"
    )
    parser.add_argument(
        "--checkpoint", required=True,
        help="orbax step_N dir (or a run dir — latest step picked)",
    )
    parser.add_argument("--config_path", default="configs/config.yml")
    parser.add_argument("--output", required=True, help="output .pth path")
    ns = parser.parse_args(argv)

    from pl_bert_tpu.config import Config
    from pl_bert_tpu.models.albert import build_model, init_params
    from pl_bert_tpu.training.checkpoint import load_checkpoint
    from pl_bert_tpu.training.evaluate import _resolve_checkpoint
    from pl_bert_tpu.training.train_step import make_optimizer

    config = Config.load(ns.config_path)
    tp, dp, mp = (
        config.training_params, config.dataset_params, config.model_params
    )
    model = build_model(mp, tp.mixed_precision)
    template = init_params(model, dp.max_seq_length, seed=tp.seed)
    tx = make_optimizer(tp)
    params, opt_state, meta = load_checkpoint(
        _resolve_checkpoint(ns.checkpoint), template, tx.init(template)
    )
    export_reference_checkpoint(
        params, opt_state, tp, ns.output,
        step=meta["step"], epoch=meta["epoch"],
    )
    print(json.dumps({
        "output": ns.output, "step": meta["step"], "epoch": meta["epoch"],
    }), flush=True)


if __name__ == "__main__":
    main()
