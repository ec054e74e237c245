"""Checkpoint → HuggingFace export CLI.

Equivalent of ``python convert_to_hf.py --checkpoint_path ...
--config_path ... --output_dir ...`` (reference: convert_to_hf.py:9-64):
loads a training checkpoint (orbax ``step_N`` directory), rebuilds the
model, and writes the HF ``AlbertModel`` directory + full-model torch
state + metadata + config copy.
"""

from __future__ import annotations

import argparse
import os
import re

from pl_bert_tpu.config import Config
from pl_bert_tpu.export.to_hf import export_checkpoint
from pl_bert_tpu.models.albert import build_model, init_params
from pl_bert_tpu.training.checkpoint import load_params_only


def main(argv=None) -> str:
    parser = argparse.ArgumentParser(
        description="Convert a PL-BERT TPU checkpoint to HuggingFace format"
    )
    parser.add_argument("--checkpoint_path", type=str, required=True,
                        help="orbax step_N checkpoint directory")
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    args = parser.parse_args(argv)

    config = Config.load(args.config_path)
    model = build_model(config.model_params, mixed_precision="fp32")
    # abstract template: export only needs structure/shape validation and
    # host arrays — a concrete init would compile a device forward for
    # nothing (checkpoint.py::_place_like handles the abstract case)
    import jax

    template = jax.eval_shape(
        lambda: init_params(
            model, config.dataset_params.max_seq_length, seed=0
        )
    )
    params = load_params_only(args.checkpoint_path, template)

    m = re.search(r"step_(\d+)", os.path.basename(args.checkpoint_path.rstrip("/")))
    step = int(m.group(1)) if m else 0
    # real provenance for training_metadata.txt (the reference records
    # checkpoint['epoch'], convert_to_hf.py:58)
    epoch = 0
    try:
        from pl_bert_tpu.training.checkpoint import load_checkpoint_meta

        meta = load_checkpoint_meta(args.checkpoint_path)
        epoch = meta.get("epoch", 0)
        step = meta.get("step", step)
    except Exception:
        pass  # filename-parsed step + epoch 0 (best effort)

    export_checkpoint(
        params,
        config.to_dict(),
        args.output_dir,
        step=step,
        epoch=epoch,
        checkpoint_path=args.checkpoint_path,
    )
    print(f"Model successfully converted and saved to {args.output_dir}")
    return args.output_dir


if __name__ == "__main__":
    main()
