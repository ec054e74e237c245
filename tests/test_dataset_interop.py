"""Dataset-source interop: HF datasets objects, preprocess jsonl output,
and synthetic corpora all feed the same pipeline."""

import numpy as np
import pytest

from pl_bert_tpu.data.pipeline import build_dataloader
from pl_bert_tpu.training.train import load_training_dataset


def _word_lists(n=12):
    rng = np.random.default_rng(0)
    alphabet = list("ɑɐbtkmnls")
    return [
        [
            "".join(rng.choice(alphabet, size=int(rng.integers(2, 6))))
            for _ in range(int(rng.integers(4, 10)))
        ]
        for _ in range(n)
    ]


def test_hf_dataset_feeds_pipeline():
    datasets = pytest.importorskip("datasets")
    ds = datasets.Dataset.from_dict({"phonemes": _word_lists()})
    train, val = build_dataloader(
        ds, batch_size=4, dataset_config={"max_seq_length": 32}
    )
    batch = next(iter(train.batches(epoch=0)))
    assert batch.masked_ids.shape == (4, 32)


def test_preprocess_jsonl_output_feeds_training(tmp_path):
    """The phonemize stage's output directory is directly consumable as
    training_dataset."""
    import json
    import os

    out = tmp_path / "phonemized"
    os.makedirs(out)
    with open(out / "records.jsonl", "w") as f:
        for words in _word_lists():
            f.write(json.dumps({"phonemes": words}) + "\n")
    ds = load_training_dataset(str(out), "train")
    assert len(ds) == 12
    assert isinstance(ds[0]["phonemes"], list)
    train, _ = build_dataloader(
        ds, batch_size=4, dataset_config={"max_seq_length": 32}
    )
    batch = next(iter(train.batches(epoch=0)))
    assert batch.masked_ids.shape == (4, 32)


def test_synthetic_dataset():
    ds = load_training_dataset("synthetic:16", "train")
    assert len(ds) == 16
