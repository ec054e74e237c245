"""MetricsLogger unit tests: interval emission, rolling mean, flush."""

import json

from pl_bert_tpu.training.metrics import MetricsLogger


def _records(log_dir):
    with open(log_dir / "metrics.jsonl") as f:
        return [json.loads(l) for l in f]


def test_emits_on_interval_and_flushes_tail(tmp_path):
    m = MetricsLogger(str(tmp_path), log_interval=3)
    for step in range(1, 8):  # 7 steps, interval 3 → emits at 3 and 6
        m.log_step(step, 1, {"loss": float(step), "phoneme_loss": float(step)})
    m.flush()  # step 7 was pending
    m.close()
    recs = _records(tmp_path)
    steps = [r["step"] for r in recs]
    assert steps == [3, 6, 7]
    # rolling mean over the last 3 losses at step 6: mean(4,5,6)
    assert abs(recs[1]["phoneme_loss_avg"] - 5.0) < 1e-9


def test_flush_noop_after_interval_emit(tmp_path):
    m = MetricsLogger(str(tmp_path), log_interval=2)
    m.log_step(1, 1, {"loss": 1.0})
    m.log_step(2, 1, {"loss": 2.0})  # emits, clears pending
    m.flush()
    m.close()
    assert [r["step"] for r in _records(tmp_path)] == [2]


def test_validation_records(tmp_path):
    m = MetricsLogger(str(tmp_path), log_interval=10)
    m.log_validation(100, 2, 3.25, 0.5)
    m.close()
    rec = _records(tmp_path)[0]
    assert rec == {
        "step": 100, "epoch": 2,
        "val_phoneme_loss": 3.25, "val_masked_accuracy": 0.5,
    }
