"""End-to-end training with the on-device masking path enabled."""

from pl_bert_tpu.config import Config
from pl_bert_tpu.training.train import train


def test_ondevice_masking_end_to_end(tmp_path):
    raw = {
        "training_params": {
            "output_dir": str(tmp_path / "ckpt"),
            "batch_size": 8,
            "save_interval": 100,
            "log_interval": 2,
            "num_steps": 4,
            "learning_rate": 1e-3,
            "training_dataset": "synthetic:64",
            "mixed_precision": "fp32",
        },
        "dataset_params": {"max_seq_length": 64, "ondevice_masking": True},
        "model_params": {
            "hidden_size": 64,
            "num_attention_heads": 4,
            "intermediate_size": 128,
            "max_position_embeddings": 64,
            "num_hidden_layers": 2,
            "embedding_size": 32,
            "attention_impl": "xla",
        },
    }
    cfg_path = tmp_path / "config.yml"
    Config.from_dict(raw).save(str(cfg_path))
    final = train({"config_path": str(cfg_path), "run_name": "odm"})
    assert final == 4
    import json

    records = [
        json.loads(l)
        for l in open(tmp_path / "ckpt" / "odm" / "metrics.jsonl")
    ]
    # validation ran with real (nonzero) loss and training steps logged
    val = [r for r in records if "val_phoneme_loss" in r]
    assert val and val[0]["val_phoneme_loss"] > 0
    steps = [r for r in records if "loss" in r]
    assert len(steps) == 2  # every log_interval (=2) of 4 steps
