"""Masking/data-layer tests (reference contract: dataloader.py:19-142).

The statistical tests pin the masking distribution; the parity oracle
(`mask_sample_reference_parity`) replicates the reference's exact RNG
call sequence and is used to check structural equivalence.
"""

import random

import numpy as np
import pytest

from pl_bert_tpu.data import (
    MaskedPhonemeDataset,
    MaskingParams,
    WholeWordMasker,
    collate_fixed,
    mask_sample_reference_parity,
)
from pl_bert_tpu.data.pipeline import DataPipeline, build_dataloader, split_train_val
from pl_bert_tpu.text.symbols import MASK_ID, SEPARATOR_ID, encode

WORDS = ["ˈmaʕna", "θaːbit", "kitaːb", "qalam", "bajt", "ʃams"]


def _random_words(rng, n):
    alphabet = "ɑɐɒæbtkmnlsʃθð"
    return ["".join(rng.choice(list(alphabet), size=rng.integers(2, 9))) for _ in range(n)]


def test_parity_oracle_structure():
    np.random.seed(1)
    random.seed(1)
    params = MaskingParams(max_seq_length=512)
    s = mask_sample_reference_parity(WORDS, params)
    total = sum(len(w) for w in WORDS) + len(WORDS)
    assert len(s.masked_ids) == len(s.label_ids) == len(s.token_ids) == total
    # labels = words joined by separators
    expected_labels = encode(" ".join(WORDS) + " ")
    assert np.array_equal(s.label_ids, expected_labels)
    # unmasked positions agree between input and labels
    assert np.array_equal(s.masked_ids[~s.mask_positions], s.label_ids[~s.mask_positions])
    # separator after every word in token ids
    sep_positions = np.cumsum([len(w) + 1 for w in WORDS]) - 1
    assert (s.token_ids[sep_positions] == params.word_separator).all()


def test_fast_masker_matches_oracle_structure():
    masker = WholeWordMasker(MaskingParams(), seed=7)
    s = masker(WORDS, epoch=0, index=3)
    expected_labels = encode(" ".join(WORDS) + " ")
    assert np.array_equal(s.label_ids, expected_labels)
    assert np.array_equal(
        s.masked_ids[~s.mask_positions], s.label_ids[~s.mask_positions]
    )
    # masked positions never land on separators
    assert not (s.label_ids[s.mask_positions] == SEPARATOR_ID).any()


def test_fast_masker_deterministic_per_key():
    masker = WholeWordMasker(MaskingParams(), seed=7)
    a = masker(WORDS, epoch=2, index=5)
    b = masker(WORDS, epoch=2, index=5)
    c = masker(WORDS, epoch=2, index=6)
    assert np.array_equal(a.masked_ids, b.masked_ids)
    assert not np.array_equal(a.masked_ids, c.masked_ids) or not np.array_equal(
        a.mask_positions, c.mask_positions
    )


def test_masking_rates_statistical():
    """Word selection ≈15%; of selected: ~80% fully masked, ~10% replaced,
    ~10% kept (kept words are untracked — same as reference)."""
    rng = np.random.default_rng(0)
    masker = WholeWordMasker(MaskingParams(max_seq_length=10**9), seed=3)
    n_words = 0
    n_sel_chars = 0
    n_mask_chars = 0
    n_total_chars = 0
    for i in range(400):
        words = _random_words(rng, 30)
        s = masker(words, epoch=0, index=i)
        n_words += len(words)
        n_total_chars += sum(len(w) for w in words)
        n_sel_chars += int(s.mask_positions.sum())
        n_mask_chars += int((s.masked_ids == MASK_ID).sum())
    # tracked (mask+replace) chars ≈ 0.15 * 0.9 = 13.5% of word chars
    sel_rate = n_sel_chars / n_total_chars
    assert 0.11 < sel_rate < 0.16, sel_rate
    # fully-masked chars ≈ 0.15*0.8 = 12% of word chars
    mask_rate = n_mask_chars / n_total_chars
    assert 0.095 < mask_rate < 0.145, mask_rate
    # replaced ≈ 1/9 of tracked chars (minus coincidental same-id draws)
    repl_rate = (n_sel_chars - n_mask_chars) / n_sel_chars
    assert 0.05 < repl_rate < 0.18, repl_rate


def test_whole_word_spans():
    """Masking is whole-word: within a word, either all or none of the
    chars are tracked (replaced chars may coincide with originals)."""
    masker = WholeWordMasker(MaskingParams(), seed=11)
    words = WORDS * 3
    s = masker(words, epoch=1, index=0)
    pos = 0
    for w in words:
        span = s.mask_positions[pos : pos + len(w)]
        assert span.all() or not span.any()
        pos += len(w) + 1


def test_long_sequence_crop():
    rng = np.random.default_rng(5)
    words = _random_words(rng, 300)
    params = MaskingParams(max_seq_length=128)
    masker = WholeWordMasker(params, seed=2)
    s = masker(words, epoch=0, index=0)
    assert len(s.masked_ids) == 128
    assert len(s.label_ids) == 128
    assert s.mask_positions.shape == (128,)
    # parity oracle crops the same way
    np.random.seed(1); random.seed(1)
    o = mask_sample_reference_parity(words, params)
    assert len(o.masked_ids) == 128


def test_collate_fixed_shape():
    masker = WholeWordMasker(MaskingParams(max_seq_length=64), seed=2)
    samples = [masker(WORDS[: 2 + i], epoch=0, index=i) for i in range(4)]
    batch = collate_fixed(samples, 64)
    assert batch.masked_ids.shape == (4, 64)
    assert batch.attention_mask.shape == (4, 64)
    for i, s in enumerate(samples):
        n = len(s.masked_ids)
        assert batch.lengths[i] == n
        assert (batch.masked_ids[i, n:] == 0).all()
        assert batch.attention_mask[i, :n].all()
        assert not batch.attention_mask[i, n:].any()


def test_split_semantics():
    train, val = split_train_val(100_000, seed=1)
    assert len(val) == 5000
    assert len(train) == 95_000
    assert len(np.intersect1d(train, val)) == 0
    # cap at 10k
    train2, val2 = split_train_val(1_000_000, seed=1)
    assert len(val2) == 10_000


def test_pipeline_epochs_and_resume():
    data = [{"phonemes": WORDS[: 2 + (i % 4)]} for i in range(40)]
    train, val = build_dataloader(
        data, batch_size=4, dataset_config={"max_seq_length": 32}, seed=1
    )
    b0 = list(train.batches(epoch=0))
    b0_again = list(train.batches(epoch=0))
    b1 = list(train.batches(epoch=1))
    assert len(b0) == len(train)
    assert all(
        np.array_equal(x.masked_ids, y.masked_ids) for x, y in zip(b0, b0_again)
    )
    # different epoch → different order (first batch differs with high prob)
    assert not np.array_equal(b0[0].masked_ids, b1[0].masked_ids)
    # resume mid-epoch reproduces the tail
    tail = list(train.batches(epoch=0, start_batch=3))
    assert all(
        np.array_equal(x.masked_ids, y.masked_ids) for x, y in zip(b0[3:], tail)
    )


def test_use_token_ids_expansion():
    ds = MaskedPhonemeDataset(
        [{"phonemes": ["ab", "cde"], "token_ids": [10, 20]}],
        use_token_ids=True,
        max_seq_length=512,
        word_separator=87,
    )
    s = ds.get(0)
    assert s.token_ids.tolist() == [10, 10, 87, 20, 20, 20, 87]
