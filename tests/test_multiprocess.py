"""Multi-process distributed training (VERDICT r2 item 3).

Launches the REAL CLI entry point (`python -m pl_bert_tpu.training.train`)
as 2 jax.distributed processes × 4 CPU devices each (gloo collectives —
the CPU stand-in for a 2-host TPU pod slice) and asserts:

- training steps run to completion on an 8-device global mesh;
- metrics/prints emit only from process 0 (rank gating);
- checkpoints save with every process participating, and a relaunch
  resumes from the saved step;
- the distributed loss trajectory matches a single-process 8-device run
  bit-for-bit-ish (same global mesh semantics, SPMD invariance).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIG = """
preprocess_params: {{}}
training_params:
  output_dir: {out}
  batch_size: 8
  num_steps: {num_steps}
  save_interval: 2
  log_interval: 1
  data_axis: -1
  model_axis: 1
  training_dataset: "synthetic:64"
dataset_params:
  max_seq_length: 64
  ondevice_masking: true
model_params:
  hidden_size: 32
  num_attention_heads: 2
  intermediate_size: 64
  num_hidden_layers: 1
  embedding_size: 16
  max_position_embeddings: 64
  attention_impl: xla
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(cfg_path, run_name, port, pid, num_procs, local_devices):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",  # keep the axon hook from pinning the TPU
        XLA_FLAGS=f"--xla_force_host_platform_device_count={local_devices}",
        PLBERT_DISTRIBUTED="1",
        PLBERT_COORDINATOR=f"localhost:{port}",
        PLBERT_NUM_PROCESSES=str(num_procs),
        PLBERT_PROCESS_ID=str(pid),
        PYTHONPATH=REPO,
    )
    return subprocess.Popen(
        [sys.executable, "-m", "pl_bert_tpu.training.train",
         "--config_path", cfg_path, "--run_name", run_name],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _run_pair(cfg_path, run_name, timeout=600):
    port = _free_port()
    procs = [
        _launch(cfg_path, run_name, port, pid, 2, 4) for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{out[-3000:]}"
    return outs


def _run_single(cfg_path, run_name, timeout=600):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",  # keep the axon hook from pinning the TPU
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        PYTHONPATH=REPO,
    )
    env.pop("PLBERT_DISTRIBUTED", None)
    out = subprocess.run(
        [sys.executable, "-m", "pl_bert_tpu.training.train",
         "--config_path", cfg_path, "--run_name", run_name],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    return out.stdout


def _read_metrics(run_dir):
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        return [json.loads(l) for l in f]


def test_two_process_training_saves_resumes_and_matches_single(tmp_path):
    out_dir = str(tmp_path / "ckpt")
    cfg_path = str(tmp_path / "config.yml")
    with open(cfg_path, "w") as f:
        f.write(CONFIG.format(out=out_dir, num_steps=2))

    outs = _run_pair(cfg_path, "mp")
    run_dir = os.path.join(out_dir, "mp")

    # both ranks initialized the cluster
    assert "process 0 of 2" in outs[0]
    assert "process 1 of 2" in outs[1]
    # rank gating: step/validation logs only on rank 0
    assert "Validation at step" in outs[0]
    assert "Validation at step" not in outs[1]
    assert "step 1  epoch 1" in outs[0]
    assert "step 1  epoch 1" not in outs[1]

    # checkpoint written with all processes participating
    assert os.path.isdir(os.path.join(run_dir, "step_2"))
    # single metrics stream, no duplicate-rank writes
    metrics = _read_metrics(run_dir)
    train_steps = [r["step"] for r in metrics if "phoneme_loss" in r]
    assert train_steps == sorted(set(train_steps))
    mp_losses = {
        r["step"]: r["phoneme_loss"] for r in metrics if "phoneme_loss" in r
    }
    assert mp_losses and all(
        l == l and abs(l) < 1e6 for l in mp_losses.values()  # finite
    )

    # resume: extend the run's saved config (the resume marker) and
    # relaunch — must load step_2 and continue to step_4
    run_cfg = os.path.join(run_dir, "config.yml")
    text = open(run_cfg).read().replace("num_steps: 2", "num_steps: 4")
    with open(run_cfg, "w") as f:
        f.write(text)
    outs2 = _run_pair(cfg_path, "mp")
    assert "step_2 loaded" in outs2[0]
    assert "step_2 loaded" in outs2[1]  # every process restores
    assert os.path.isdir(os.path.join(run_dir, "step_4"))

    # SPMD invariance: a single-process 8-device run over the same
    # config produces the same global math → same losses (CPU, fp32
    # reductions; gloo vs local all-reduce may reorder → tolerance)
    with open(cfg_path, "w") as f:
        f.write(CONFIG.format(out=out_dir, num_steps=2))
    _run_single(cfg_path, "sp")
    sp_losses = {
        r["step"]: r["phoneme_loss"]
        for r in _read_metrics(os.path.join(out_dir, "sp"))
        if "phoneme_loss" in r
    }
    assert set(sp_losses) == set(mp_losses)
    for step, l in sp_losses.items():
        assert abs(l - mp_losses[step]) < 1e-4, (step, l, mp_losses[step])


TP_CONFIG = CONFIG.replace(
    "model_axis: 1", "model_axis: 2\n  zero1: true"
).replace(
    "attention_impl: xla",
    "attention_impl: xla\n  num_token_vocab: 128\n"
    "  sequence_parallel: true",
)


def test_two_process_tensor_parallel_step(tmp_path):
    """Tensor parallelism ACROSS process boundaries: a (4 data, 2 model)
    mesh over 2 processes with the multi-task model — the vocab-parallel
    grapheme head's kernel shards live on different processes, so
    put_global's callback placement and GSPMD's cross-process
    collectives both engage (with sequence_parallel on, so the
    L-sharded activation layout spans processes too, and zero1 on, so
    the AdamW moments are partitioned across process boundaries).
    Two steps to completion + finite losses."""
    out_dir = str(tmp_path / "ckpt")
    cfg_path = str(tmp_path / "config.yml")
    with open(cfg_path, "w") as f:
        f.write(TP_CONFIG.format(out=out_dir, num_steps=2))
    outs = _run_pair(cfg_path, "tp")
    metrics = _read_metrics(os.path.join(out_dir, "tp"))
    steps = [r for r in metrics if "phoneme_loss" in r]
    assert len(steps) == 2
    for r in steps:
        assert abs(r["phoneme_loss"]) < 1e6
        assert abs(r["token_loss"]) < 1e6
