"""Packed dataset for the on-device masking path.

Each sample is encoded ONCE on the host into static arrays
(label ids + word ids + length); per-epoch masking randomness then runs
on device (ops/ondevice_masking.py). Batches here are pure stacking —
the host hot loop shrinks from per-item RNG + string encoding to a
memcpy.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from pl_bert_tpu.ops.ondevice_masking import pack_sample


class PackedPhonemeDataset:
    def __init__(self, dataset, max_seq_length: int = 512) -> None:
        from pl_bert_tpu.runtime import pack_batch_native

        self.max_seq_length = max_seq_length
        samples = [dataset[i]["phonemes"] for i in range(len(dataset))]
        # one native C pass over the whole corpus (falls back to numpy)
        self.label_ids, self.word_ids, self.lengths = pack_batch_native(
            samples, max_seq_length
        )

    def __len__(self) -> int:
        return len(self.lengths)

    def batch(self, indices: np.ndarray) -> dict:
        return {
            "label_ids": self.label_ids[indices],
            "word_ids": self.word_ids[indices],
            "lengths": self.lengths[indices],
        }

    def batches(
        self,
        batch_size: int,
        epoch: int,
        seed: int = 1,
        shuffle: bool = True,
        drop_last: bool = True,
        indices: np.ndarray | None = None,
        start_batch: int = 0,
    ) -> Iterator[dict]:
        order = (
            np.arange(len(self)) if indices is None else np.asarray(indices)
        )
        if shuffle:
            rng = np.random.Generator(
                np.random.Philox(key=seed, counter=[0, 0, 0, epoch])
            )
            order = order[rng.permutation(len(order))]
        n = len(order)
        stop = n - (n % batch_size) if drop_last else n
        for lo in range(start_batch * batch_size, stop, batch_size):
            yield self.batch(order[lo : lo + batch_size])
