"""Standalone checkpoint evaluation: phoneme loss + masked accuracy on
the validation split, without a training run.

The reference can only validate from INSIDE its training loop
(reference: train.py:288-304 ``run_validation_and_log``) — comparing
two saved checkpoints means spinning the trainer up twice and reading
wandb. This CLI evaluates any checkpoint against the dataset configured
in the YAML using the training stack's exact validation semantics: the
same 95/5 split (reference: dataloader.py:231), the same deterministic
masking stream, the same padding and sharding.

Accepted checkpoint forms (everything ``load_params_only`` takes):
  - this build's orbax ``step_N`` directory,
  - a run directory — the latest ``step_N`` inside is picked, matching
    the resume rule (reference: train.py:46-79),
  - a reference torch ``step_N.pth`` (export/from_torch), so a
    published reference checkpoint can be scored on TPU directly.

    python -m pl_bert_tpu.training.evaluate \
        --config_path configs/config.yml --checkpoint ckpt/run/step_1000

Prints ONE JSON line:
    {"checkpoint", "val_phoneme_loss", "val_masked_accuracy",
     "val_batches"} — plus {"val_token_loss", "val_token_accuracy"}
    when the config runs the multi-task model (use_token_ids).

With ``--all`` the checkpoint argument is a run directory and EVERY
step_N inside is scored (one JSON line each, ascending, sharing one
jitted eval step), followed by a summary line naming the best by
val_phoneme_loss — post-hoc checkpoint selection over a whole run.
"""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile

from pl_bert_tpu.config import Config
from pl_bert_tpu.training.checkpoint import (
    checkpoint_path,
    find_latest_checkpoint,
)


def _resolve_checkpoint(path: str) -> str:
    """A run directory resolves to its latest step_N; anything else
    (an orbax step dir, a torch .pth) passes through."""
    if os.path.isdir(path):
        found, latest = find_latest_checkpoint(path)
        if found:
            return checkpoint_path(path, latest)
    return path


def _load_config(args: dict) -> Config:
    config = Config.load(args["config_path"])
    # evaluation must not depend on the warm-start path (and must not
    # double-load): the scored params come from --checkpoint alone
    config.model_params = dataclasses.replace(
        config.model_params, pretrained_model=""
    )
    if args.get("dataset_path"):
        # score on an arbitrary corpus/store instead of the configured
        # training dataset (e.g. a held-out pack)
        config.training_params = dataclasses.replace(
            config.training_params, training_dataset=args["dataset_path"]
        )
    return config


def _score(trainer, ckpt: str) -> dict:
    """Load ``ckpt``'s params into the live trainer and validate —
    sharing one Trainer across checkpoints reuses the jitted eval step
    and the host-side split/masking pipeline."""
    from pl_bert_tpu.training.checkpoint import load_params_only

    params = load_params_only(ckpt, trainer.state.params)
    trainer.state = trainer.state._replace(params=params)
    result = trainer.validate()
    if result is None:
        raise SystemExit(
            "no usable validation batches (empty split, or masking "
            "selected zero positions everywhere) — nothing to evaluate"
        )
    loss, acc = result
    out = {
        "checkpoint": ckpt,
        "val_phoneme_loss": round(loss, 6),
        "val_masked_accuracy": round(acc, 6),
        "val_batches": trainer._last_val_batches,
    }
    if trainer.last_val_extras:  # multi-task: grapheme-head metrics
        out.update(
            {k: round(v, 6) for k, v in trainer.last_val_extras.items()}
        )
    print(json.dumps(out), flush=True)
    return out


def evaluate(args: dict, dataset=None) -> dict:
    """Programmatic entry; ``dataset`` overrides the configured one
    (same contract as training.train.train)."""
    from pl_bert_tpu.training.train import Trainer

    config = _load_config(args)
    ckpt = _resolve_checkpoint(args["checkpoint"])

    with tempfile.TemporaryDirectory() as tmp:
        # eval_only: no AdamW state allocation, no train step — scoring
        # a checkpoint must not cost 2x-params of dead HBM
        trainer = Trainer(config, tmp, False, dataset=dataset, eval_only=True)
        try:
            return _score(trainer, ckpt)
        finally:
            trainer.metrics.close()


def evaluate_all(args: dict, dataset=None) -> list[dict]:
    """Score EVERY step_N checkpoint in a run directory (ascending),
    one JSON line each, then a summary line naming the best (lowest
    val_phoneme_loss) — checkpoint selection the reference can only do
    by re-reading wandb across restarts. Validation masking is a fixed
    stream, so the scores are directly comparable across steps."""
    from pl_bert_tpu.training.checkpoint import list_checkpoints
    from pl_bert_tpu.training.train import Trainer

    run_dir = args["checkpoint"]
    steps = list_checkpoints(run_dir)
    if not steps:
        raise SystemExit(f"no step_N checkpoints under {run_dir!r}")
    config = _load_config(args)

    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(config, tmp, False, dataset=dataset, eval_only=True)
        try:
            results = [
                _score(trainer, checkpoint_path(run_dir, step))
                for step in steps
            ]
        finally:
            trainer.metrics.close()
    best = min(results, key=lambda r: r["val_phoneme_loss"])
    print(
        json.dumps(
            {
                "best_checkpoint": best["checkpoint"],
                "best_val_phoneme_loss": best["val_phoneme_loss"],
                "checkpoints_scored": len(results),
            }
        ),
        flush=True,
    )
    return results


def main(argv=None) -> None:
    import argparse

    parser = argparse.ArgumentParser(
        description="Evaluate a checkpoint on the configured dataset's "
        "validation split (loss + masked accuracy)."
    )
    parser.add_argument(
        "--checkpoint", required=True,
        help="orbax step_N dir, a run dir (latest step picked), or a "
        "reference torch step_N.pth",
    )
    parser.add_argument(
        "--config_path", default="configs/config.yml",
        help="YAML config naming the dataset and model shape",
    )
    parser.add_argument(
        "--dataset_path", default="",
        help="override training_params.training_dataset — score on this "
        "corpus/packed store instead",
    )
    parser.add_argument(
        "--all", action="store_true",
        help="--checkpoint is a run dir: score every step_N in it "
        "(ascending) and report the best by val_phoneme_loss",
    )
    ns = parser.parse_args(argv)
    fn = evaluate_all if ns.all else evaluate
    fn({
        "checkpoint": ns.checkpoint,
        "config_path": ns.config_path,
        "dataset_path": ns.dataset_path,
    })


if __name__ == "__main__":
    main()
