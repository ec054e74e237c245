"""Sequence packing: segment-aware attention + packed dataset + e2e."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from pl_bert_tpu.config import Config
from pl_bert_tpu.data.packed import PackedSequenceDataset
from pl_bert_tpu.ops.attention import xla_attention
from pl_bert_tpu.ops.flash_attention import flash_attention
from pl_bert_tpu.text.symbols import SEPARATOR_ID


def _word_lists(n, seed=0, lo=3, hi=12):
    rng = np.random.default_rng(seed)
    alphabet = list("ɑɐbtkmnls")
    return [
        {
            "phonemes": [
                "".join(rng.choice(alphabet, size=int(rng.integers(2, 6))))
                for _ in range(int(rng.integers(lo, hi)))
            ]
        }
        for _ in range(n)
    ]


def test_segment_mask_blocks_cross_attention():
    """With segment ids, tokens must not attend across segments: packing
    two sequences in one row gives the same output as running them in
    separate rows."""
    B, L, H, D = 1, 128, 4, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    seg = jnp.concatenate(
        [jnp.zeros((B, 64), jnp.int32), jnp.ones((B, 64), jnp.int32)], axis=1
    )
    with pltpu.force_tpu_interpret_mode():
        packed = flash_attention(q, k, v, None, seg, out_dtype=jnp.float32)
        first = flash_attention(
            q[:, :64], k[:, :64], v[:, :64], None, None, out_dtype=jnp.float32
        )
        second = flash_attention(
            q[:, 64:], k[:, 64:], v[:, 64:], None, None, out_dtype=jnp.float32
        )
    np.testing.assert_allclose(np.asarray(packed[:, :64]), np.asarray(first), atol=2e-5)
    np.testing.assert_allclose(np.asarray(packed[:, 64:]), np.asarray(second), atol=2e-5)
    # xla fallback agrees
    ref = xla_attention(q, k, v, None, seg, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_packed_dataset_structure():
    data = _word_lists(40)
    ds = PackedSequenceDataset(data, max_seq_length=128)
    assert len(ds) < 40  # actually packed multiple samples per row
    assert ds.packing_efficiency > 0.6
    total_chars = int(ds.lengths.sum())
    row = 0
    segs = ds.segment_ids[row]
    n = ds.lengths[row]
    # segments are contiguous ascending from 0; padding is -1
    seg_vals = segs[:n]
    assert seg_vals[0] == 0
    assert (np.diff(seg_vals) >= 0).all()
    assert (segs[n:] == -1).all()
    # position ids restart per segment
    pos = ds.position_ids[row][:n]
    starts = np.flatnonzero(np.diff(seg_vals)) + 1
    for s in [0, *starts.tolist()]:
        assert pos[s] == 0
    # word ids unique per segment (offsets applied): a word id never spans
    # two segments
    wids = ds.word_ids[row][:n]
    for w in np.unique(wids[wids >= 0]):
        assert len(np.unique(seg_vals[wids == w])) == 1
    # every row ends each sample with a separator before the next
    assert ds.label_ids[row][n - 1] == SEPARATOR_ID


def test_packing_end_to_end_training(tmp_path):
    raw = {
        "training_params": {
            "output_dir": str(tmp_path / "ckpt"),
            "batch_size": 8,
            "save_interval": 100,
            "log_interval": 2,
            "num_steps": 3,
            "learning_rate": 1e-3,
            "training_dataset": "synthetic:64",
            "mixed_precision": "fp32",
        },
        "dataset_params": {
            "max_seq_length": 128,
            "ondevice_masking": True,
            "sequence_packing": True,
        },
        "model_params": {
            "hidden_size": 64,
            "num_attention_heads": 4,
            "intermediate_size": 128,
            "max_position_embeddings": 128,
            "num_hidden_layers": 2,
            "embedding_size": 32,
            "attention_impl": "xla",
        },
    }
    from pl_bert_tpu.training.train import train

    cfg_path = tmp_path / "config.yml"
    Config.from_dict(raw).save(str(cfg_path))
    final = train({"config_path": str(cfg_path), "run_name": "pack"})
    assert final == 3
