"""Round-4 integrated MULTI-TASK feature run (on-chip).

Round 3's integrated run proved the training plumbing (accum + cosine
LR + async saves + crash/auto-resume) phoneme-only. This run proves the
full multi-task surface end to end on real hardware, with grapheme
labels the head can actually LEARN:

- corpus: ``synthetic-derivable:20000`` — closed word pool, token_id =
  crc32(word) %% 60k (train.py::make_synthetic_corpus), so token_loss
  must fall well below ln(60k) if the grapheme head works;
- flagship ALBERT-base shape, both heads, fused LM-head CE (the
  round-4 adopted default), bf16, grad_accum 2, cosine LR with warmup,
  async checkpoints, retention 3;
- a fault injected at step 700 (PLBERT_CRASH_AT_STEP) under the
  elastic orchestrator — auto-resume must hold in multi-task mode too;
- validation every 300 steps reports the grapheme head
  (ops/masked_ce.py::masked_lm_metrics — the session-2 addition);
- afterwards ``training.evaluate --all`` sweeps every retained
  checkpoint and names the best.

Prints ONE summary JSON line (for BENCH_LEDGER.jsonl via
tools/onchip_batch.sh `mtrun`).

Usage: python tools/run_integrated_multitask.py [--workdir DIR]
       [--steps 1200] [--crash_at 700]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIG = """\
preprocess_params:
  tokenizer: "aubmindlab/bert-base-arabertv2"

training_params:
  output_dir: "{out}"
  mixed_precision: "bf16"
  batch_size: 96
  save_interval: 300
  log_interval: 20
  num_steps: {steps}
  learning_rate: 1e-4
  training_dataset: "synthetic-derivable:20000"
  max_epochs: 100
  seed: 1
  grad_accum_steps: 2
  lr_schedule: cosine
  warmup_steps: 100
  lr_min_ratio: 0.1
  async_save: true
  keep_checkpoints: 3
  fused_lm_head: true

dataset_params:
  word_separator: 87
  max_seq_length: 512

model_params:
  vocab_size: 188
  hidden_size: 768
  num_attention_heads: 12
  intermediate_size: 2048
  max_position_embeddings: 512
  num_hidden_layers: 12
  embedding_size: 128
  num_token_vocab: 60000
"""


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--workdir", default="/tmp/r4_mtrun")
    p.add_argument("--steps", type=int, default=1200)
    p.add_argument("--crash_at", type=int, default=700)
    p.add_argument("--smoke", action="store_true",
                   help="tiny-shape CPU machinery check (not a run): "
                   "2-layer/64-hidden, 40 steps, crash at 25")
    args = p.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    cfg_path = os.path.join(args.workdir, "mtrun.yml")
    out_dir = os.path.join(args.workdir, "ckpt")
    cfg = CONFIG.format(out=out_dir, steps=args.steps)
    if args.smoke:
        args.steps, args.crash_at = 40, 25
        cfg = CONFIG.format(out=out_dir, steps=args.steps)
        for old, new in (
            ("hidden_size: 768", "hidden_size: 64"),
            ("num_attention_heads: 12", "num_attention_heads: 4"),
            ("intermediate_size: 2048", "intermediate_size: 128"),
            ("num_hidden_layers: 12", "num_hidden_layers: 2"),
            ("embedding_size: 128", "embedding_size: 32"),
            ("num_token_vocab: 60000", "num_token_vocab: 2000"),
            ("max_seq_length: 512", "max_seq_length: 64"),
            ("max_position_embeddings: 512", "max_position_embeddings: 64"),
            ('training_dataset: "synthetic-derivable:20000"',
             'training_dataset: "synthetic-derivable:512"'),
            ("batch_size: 96", "batch_size: 8"),
            ("save_interval: 300", "save_interval: 10"),
            ("log_interval: 20", "log_interval: 5"),
            ("warmup_steps: 100", "warmup_steps: 5"),
            ('mixed_precision: "bf16"', 'mixed_precision: "fp32"'),
        ):
            assert old in cfg, old
            cfg = cfg.replace(old, new)
    with open(cfg_path, "w") as f:
        f.write(cfg)

    env = dict(os.environ)
    if args.crash_at:
        env["PLBERT_CRASH_AT_STEP"] = str(args.crash_at)

    t0 = time.time()
    train = subprocess.run(
        [sys.executable, "-m", "pl_bert_tpu.training.orchestrate",
         "--config_path", cfg_path, "--run_name", "mtrun",
         "--max_restarts", "3", "--restart_delay", "2"],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    wall = time.time() - t0
    run_dir = os.path.join(out_dir, "mtrun")
    sys.stderr.write(train.stdout[-8000:] + "\n")

    # --- digest metrics.jsonl -------------------------------------------------
    rows = []
    metrics_path = os.path.join(run_dir, "metrics.jsonl")
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            rows = [json.loads(line) for line in f if line.strip()]
    train_rows = [r for r in rows if "token_loss" in r]
    val_rows = [r for r in rows if "val_token_loss" in r]
    tps = [r["tokens_per_sec"] for r in train_rows if "tokens_per_sec" in r]

    restarts = 0
    tracker = os.path.join(run_dir, "restart_tracker.json")
    if os.path.exists(tracker):
        restarts = json.load(open(tracker)).get("count", 0)

    # --- evaluate --all: score every retained checkpoint ----------------------
    # the run dir keeps the config copy under its ORIGINAL basename
    ev = subprocess.run(
        [sys.executable, "-m", "pl_bert_tpu.training.evaluate",
         "--checkpoint", run_dir, "--all",
         "--config_path", os.path.join(run_dir, "mtrun.yml")],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    sys.stderr.write(ev.stdout[-4000:] + "\n")
    eval_rows = [
        json.loads(s) for s in ev.stdout.splitlines()
        if s.strip().startswith("{")
        and ("val_phoneme_loss" in s or "best_checkpoint" in s)
    ]

    summary = {
        "metric": "integrated_multitask_run",
        "steps": args.steps,
        "crash_at": args.crash_at,
        "restarts": restarts,
        "train_rc": train.returncode,
        "wall_s": round(wall, 1),
        "tokens_per_sec_median": (
            round(sorted(tps)[len(tps) // 2], 1) if tps else None
        ),
        "first_train": train_rows[0] if train_rows else None,
        "last_train": train_rows[-1] if train_rows else None,
        "validations": [
            {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in r.items()} for r in val_rows
        ],
        "evaluate_all_rc": ev.returncode,
        "evaluate_all": eval_rows,
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
