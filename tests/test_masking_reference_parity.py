"""Bit-exact masking parity against the reference implementation.

Skipped when the reference checkout (/root/reference) or torch is
unavailable; the parity oracle itself is always covered by
test_masking.py.
"""

import os
import random
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def test_bit_exact_vs_reference():
    torch = pytest.importorskip("torch")  # noqa: F841
    sys.path.insert(0, REF)
    try:
        from dataloader import MaskedPhonemeDataset as RefDS
    finally:
        sys.path.remove(REF)
    from pl_bert_tpu.data import MaskingParams, mask_sample_reference_parity

    rng = np.random.default_rng(42)
    alphabet = list("ɑɐɒæbtkmnlsʃθð")

    def words(n):
        return [
            "".join(rng.choice(alphabet, size=int(rng.integers(2, 9))))
            for _ in range(n)
        ]

    data = [{"phonemes": words(int(rng.integers(3, 60)))} for _ in range(20)]
    data.append({"phonemes": words(200)})  # crop path

    ref = RefDS(
        data, word_pred_prob=0.15, phoneme_mask_prob=0.8, replace_prob=0.1,
        word_separator=87, max_seq_length=128, use_token_ids=False,
    )
    params = MaskingParams(max_seq_length=128)
    for i in range(len(data)):
        np.random.seed(100 + i)
        random.seed(100 + i)
        labels_r, masked_r, idx_r = ref[i]
        np.random.seed(100 + i)
        random.seed(100 + i)
        mine = mask_sample_reference_parity(data[i]["phonemes"], params)
        assert (masked_r.numpy().astype(np.int32) == mine.masked_ids).all()
        assert (labels_r.numpy().astype(np.int32) == mine.label_ids).all()
        assert sorted(idx_r) == np.nonzero(mine.mask_positions)[0].tolist()


def test_bit_exact_vs_reference_multitask():
    """use_token_ids=True path: the per-word grapheme ids expanded to
    per-phoneme with a word_separator id between words (reference
    dataloader.py:59-81) and random-crop re-based with everything else
    (dataloader.py:110-126) must match the reference bit for bit."""
    torch = pytest.importorskip("torch")  # noqa: F841
    sys.path.insert(0, REF)
    try:
        from dataloader import MaskedPhonemeDataset as RefDS
    finally:
        sys.path.remove(REF)
    from pl_bert_tpu.data import MaskingParams, mask_sample_reference_parity

    rng = np.random.default_rng(7)
    alphabet = list("ɑɐɒæbtkmnlsʃθð")

    def sample(n):
        return {
            "phonemes": [
                "".join(rng.choice(alphabet, size=int(rng.integers(2, 9))))
                for _ in range(n)
            ],
            "token_ids": [int(t) for t in rng.integers(0, 60000, size=n)],
        }

    data = [sample(int(rng.integers(3, 60))) for _ in range(20)]
    data.append(sample(200))  # crop path

    ref = RefDS(
        data, word_pred_prob=0.15, phoneme_mask_prob=0.8, replace_prob=0.1,
        word_separator=87, max_seq_length=128, use_token_ids=True,
    )
    params = MaskingParams(max_seq_length=128)
    for i in range(len(data)):
        np.random.seed(300 + i)
        random.seed(300 + i)
        tids_r, labels_r, masked_r, idx_r = ref[i]
        np.random.seed(300 + i)
        random.seed(300 + i)
        mine = mask_sample_reference_parity(
            data[i]["phonemes"], params, token_ids=data[i]["token_ids"]
        )
        assert (masked_r.numpy().astype(np.int32) == mine.masked_ids).all()
        assert (labels_r.numpy().astype(np.int32) == mine.label_ids).all()
        assert (tids_r.numpy().astype(np.int32) == mine.token_ids).all()
        assert sorted(idx_r) == np.nonzero(mine.mask_positions)[0].tolist()
