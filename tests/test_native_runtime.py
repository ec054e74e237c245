"""Native C++ batch packer: build, parity with the numpy path, safety."""

import numpy as np
import pytest

from pl_bert_tpu.ops.ondevice_masking import pack_sample
from pl_bert_tpu.runtime import native_available, pack_batch_native


def _samples(n=8, words=40, seed=0):
    rng = np.random.default_rng(seed)
    alphabet = list("ɑɐɒæbtkmnlsʃθð")
    return [
        [
            "".join(rng.choice(alphabet, size=int(rng.integers(2, 9))))
            for _ in range(words)
        ]
        for _ in range(n)
    ]


def test_native_builds_and_loads():
    # the compiler is part of the toolchain; the extension must build
    assert native_available()


def test_native_matches_numpy_path():
    samples = _samples()
    labels, words, lengths = pack_batch_native(samples, 128)
    for i, s in enumerate(samples):
        l2, w2, n2 = pack_sample(s, 128)
        assert (labels[i] == l2).all()
        assert (words[i] == w2).all()
        assert lengths[i] == n2


def test_native_oov_and_crop():
    samples = [["عxyz漢", "ab"]]  # OOV chars → UNKNOWN id
    labels, words, lengths = pack_batch_native(samples, 4)  # forced crop
    from pl_bert_tpu.text.symbols import UNKNOWN_ID, encode

    assert lengths[0] == 4
    assert labels[0][0] == UNKNOWN_ID  # ع
    assert (labels[0][:4] == encode("عxyz")).all()


def test_native_empty_sample():
    labels, words, lengths = pack_batch_native([[]], 8)
    assert lengths[0] == 0
    assert (labels[0] == 0).all()
    assert (words[0] == -1).all()


def test_native_rejects_bad_types():
    if not native_available():
        pytest.skip("native ext missing")
    with pytest.raises(TypeError):
        pack_batch_native([[42]], 8)
