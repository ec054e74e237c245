"""Packed-store verification tool (data/verify_store.py): a healthy
store passes both modes; every class of corruption it claims to catch
is actually caught, with the failure located in the message."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from pl_bert_tpu.data.packed_store import write_packed_store
from pl_bert_tpu.data.verify_store import StoreCorruption, verify_store
from pl_bert_tpu.training.train import make_synthetic_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def store(tmp_path):
    corpus = make_synthetic_corpus(120, seed=3, token_vocab=300)
    return write_packed_store(
        iter(corpus), str(tmp_path / "st"), max_seq_length=128, shard_rows=50
    )


def test_healthy_store_passes(store):
    stats = verify_store(store)
    assert stats["rows"] == 120
    assert stats["shards"] == 3
    assert stats["tokens"] > 0
    quick = verify_store(store, quick=True)
    assert quick["rows"] == stats["rows"]
    assert quick["tokens"] == stats["tokens"]


def test_healthy_sequence_store_passes(tmp_path):
    corpus = make_synthetic_corpus(80, seed=4, token_vocab=300)
    store = write_packed_store(
        iter(corpus), str(tmp_path / "sp"), max_seq_length=256,
        sequence_packing=True, shard_rows=60,
    )
    stats = verify_store(store)
    assert stats["kind"] == "packed_rows"
    assert stats["tokens"] > 0


def _meta(store):
    with open(os.path.join(store, "packed_meta.json")) as f:
        return json.load(f)


def _write_meta(store, meta):
    with open(os.path.join(store, "packed_meta.json"), "w") as f:
        json.dump(meta, f)


def test_catches_truncated_shard_file(store):
    path = os.path.join(store, "shard_00001", "label_ids.npy")
    size = os.path.getsize(path)
    with open(path, "r+b") as f:
        f.truncate(size - 1024)
    with pytest.raises(StoreCorruption, match="truncated|promises"):
        verify_store(store, quick=True)  # even quick mode catches it


def test_catches_missing_field(store):
    os.remove(os.path.join(store, "shard_00002", "word_ids.npy"))
    with pytest.raises(StoreCorruption, match="missing word_ids"):
        verify_store(store, quick=True)


def test_catches_row_count_drift(store):
    meta = _meta(store)
    meta["shards"][0]["rows"] += 1
    _write_meta(store, meta)
    with pytest.raises(StoreCorruption, match="rows"):
        verify_store(store, quick=True)


def test_catches_out_of_range_label(store):
    # flip one in-length phoneme label beyond the 188-symbol table
    path = os.path.join(store, "shard_00000", "label_ids.npy")
    arr = np.load(path)
    arr[7, 0] = 4096
    np.save(path, arr)
    with pytest.raises(StoreCorruption, match="phoneme label"):
        verify_store(store)
    assert verify_store(store, quick=True)  # quick mode skips data scans


def test_catches_token_max_drift(store):
    # the dangerous direction: data holds ids BEYOND what the meta (and
    # therefore Trainer's vocab check) records → CE would silently clamp
    meta = _meta(store)
    meta["max_token_id"] -= 5
    _write_meta(store, meta)
    with pytest.raises(StoreCorruption, match="max token id"):
        verify_store(store)


def test_small_vocab_store_passes(tmp_path):
    """Separator positions carry token_separator (87) in the packed
    token planes; a corpus whose raw vocab sits BELOW 87 must still
    verify clean (regression: counting separator ids flagged every
    small-vocab store as corrupt)."""
    corpus = make_synthetic_corpus(40, seed=7, token_vocab=50)
    store = write_packed_store(
        iter(corpus), str(tmp_path / "sv"), max_seq_length=128, shard_rows=20
    )
    stats = verify_store(store)
    assert stats["max_token_id"] < 87 <= _meta(store)["token_separator"] + 1


def test_catches_swapped_long_stream_file(tmp_path):
    store = _long_tail_store(tmp_path)
    d = os.path.join(store, "shard_00000")
    short = np.load(os.path.join(d, "long_words.npy"))[:-10]
    np.save(os.path.join(d, "long_words.npy"), short)
    with pytest.raises(StoreCorruption, match="long_words"):
        verify_store(store)


def test_catches_total_token_drift(store):
    meta = _meta(store)
    meta["total_tokens"] -= 3
    _write_meta(store, meta)
    with pytest.raises(StoreCorruption, match="tokens"):
        verify_store(store)


def test_cli(store):
    out = subprocess.run(
        [sys.executable, "-m", "pl_bert_tpu.data.verify_store", store],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.startswith("OK (full scan)")

    os.remove(os.path.join(store, "shard_00000", "lengths.npy"))
    out = subprocess.run(
        [sys.executable, "-m", "pl_bert_tpu.data.verify_store", store,
         "--quick"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 1
    assert "CORRUPT" in out.stderr


def _long_tail_store(tmp_path):
    """Corpus whose GLOBAL max token id appears only in the tail of a
    long sample — beyond the head-crop window, visible only in the
    long_tokens stream (regression: the verifier must scan streams, not
    just cropped rows, or it flags healthy stores as corrupt)."""
    records = [
        {"phonemes": ["ab"] * 100, "token_ids": [1] * 99 + [299]},
    ] + [
        {"phonemes": ["cd"] * 5, "token_ids": [2] * 5} for _ in range(10)
    ]
    return write_packed_store(
        iter(records), str(tmp_path / "lt"), max_seq_length=128,
        shard_rows=50,
    )


def test_healthy_long_tail_store_passes(tmp_path):
    store = _long_tail_store(tmp_path)
    meta = _meta(store)
    assert meta["max_token_id"] == 299  # really only in the tail
    stats = verify_store(store)
    assert stats["max_token_id"] == 299


def test_catches_corrupt_long_stream(tmp_path):
    store = _long_tail_store(tmp_path)
    path = os.path.join(store, "shard_00000", "long_labels.npy")
    arr = np.load(path)
    arr[-1] = 9999  # out of the 188-symbol table, in the tail only
    np.save(path, arr)
    with pytest.raises(StoreCorruption, match="long-stream phoneme"):
        verify_store(store)
