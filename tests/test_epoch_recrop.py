"""Per-epoch random cropping in the on-device masking path.

Long samples must see a different 512-window each epoch (reference
semantics: dataloader.py:110-126), deterministically keyed by
(seed, epoch)."""

import numpy as np

from pl_bert_tpu.data.packed import PackedPhonemeDataset


def _corpus():
    rng = np.random.default_rng(0)
    alphabet = list("ɑɐbtkmnls")
    # 4 long samples (~600+ chars) + 4 short ones
    long = [
        {
            "phonemes": [
                "".join(rng.choice(alphabet, size=6)) for _ in range(120)
            ]
        }
        for _ in range(4)
    ]
    short = [
        {
            "phonemes": [
                "".join(rng.choice(alphabet, size=4)) for _ in range(5)
            ]
        }
        for _ in range(4)
    ]
    return long + short


def test_long_samples_recrop_per_epoch():
    ds = PackedPhonemeDataset(_corpus(), max_seq_length=128, seed=1)
    assert len(ds._long_idx) == 4

    def snapshot(epoch):
        list(ds.batches(4, epoch=epoch, shuffle=False))
        return ds.label_ids.copy(), ds.word_ids.copy()

    l1, w1 = snapshot(1)
    l2, w2 = snapshot(2)
    l1again, _ = snapshot(1)

    # different epochs → different windows for long samples
    assert not np.array_equal(l1[ds._long_idx], l2[ds._long_idx])
    # deterministic per epoch (resume safety)
    assert np.array_equal(l1, l1again)
    # short samples untouched
    short_idx = np.setdiff1d(np.arange(8), ds._long_idx)
    assert np.array_equal(l1[short_idx], l2[short_idx])
    # invariants hold after recrop: word ids rebased to < L, full rows
    assert (ds.lengths[ds._long_idx] == 128).all()
    assert ds.word_ids.max() < 128


def test_short_only_corpus_never_repacks():
    corpus = _corpus()[4:]
    ds = PackedPhonemeDataset(corpus, max_seq_length=128, seed=1)
    assert len(ds._long_idx) == 0
    l0 = ds.label_ids.copy()
    list(ds.batches(2, epoch=3, shuffle=False))
    assert np.array_equal(ds.label_ids, l0)
