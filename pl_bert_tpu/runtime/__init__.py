"""Native host runtime: C++ batch packing with transparent fallback.

``pack_batch_native(samples, max_len)`` packs a whole batch of per-word
phoneme strings into (label_ids, word_ids, lengths) int32 arrays in one
C pass (runtime/native/packer.cc). When the extension is absent or not
yet built, the numpy path (ops/ondevice_masking.pack_sample) is used —
same output, slower host loop. Build with
``python -m pl_bert_tpu.runtime.build``; the first import also attempts
an automatic build if a compiler is available.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import sys

import numpy as np

from pl_bert_tpu.text.symbols import (
    SEPARATOR_ID,
    UNKNOWN_ID,
    _LOOKUP,
)

_native = None
_initialised = False


def _load_native():
    global _native, _initialised
    if _initialised:
        return _native
    _initialised = True
    from pl_bert_tpu.runtime.build import build, so_path

    path = so_path()
    if not os.path.exists(path):
        try:
            build(verbose=False)
        except Exception:
            return None
    try:
        spec = importlib.util.spec_from_file_location("_plbert_native", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.modules["_plbert_native"] = mod
        mod.set_symbol_table(
            np.asarray(_LOOKUP, dtype=np.int32).tobytes(),
            int(UNKNOWN_ID),
            int(SEPARATOR_ID),
        )
        _native = mod
    except Exception:
        _native = None
    return _native


def native_available() -> bool:
    return _load_native() is not None


def pack_batch_native(
    samples: list[list[str]],
    max_len: int,
    offsets: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch of per-word phoneme strings → (label_ids [B, L], word_ids
    [B, L], lengths [B]). ``offsets`` ([B] int32, default zeros) crops
    each sample's window to start at that char-stream position (the
    per-epoch random crop). Uses the C++ packer when available."""
    b = len(samples)
    labels = np.zeros((b, max_len), np.int32)
    words = np.full((b, max_len), -1, np.int32)
    lengths = np.zeros(b, np.int32)
    if offsets is None:
        offsets = np.zeros(b, np.int32)
    offsets = np.ascontiguousarray(offsets, dtype=np.int32)
    native = _load_native()
    if native is not None:
        # the C side walks samples via the PySequence API — only coerce
        # non-sequences; re-copying every sample per call would re-add
        # Python-level O(total words) work to the hot loop this
        # extension exists to remove (per-epoch re-crops pass the whole
        # long-sample set through here)
        batch = [
            s if isinstance(s, (list, tuple)) else list(s) for s in samples
        ]
        native.pack_batch(
            batch, max_len,
            memoryview(labels).cast("B"),
            memoryview(words).cast("B"),
            memoryview(lengths).cast("B"),
            offsets.tobytes(),
        )
        return labels, words, lengths
    from pl_bert_tpu.ops.ondevice_masking import pack_sample

    for i, sample in enumerate(samples):
        labels[i], words[i], lengths[i] = pack_sample(
            sample, max_len, offset=int(offsets[i])
        )
    return labels, words, lengths
