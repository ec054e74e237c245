#!/usr/bin/env python
"""Capture espeak-ng golden IPA outputs into tests/goldens/espeak_ar_goldens.json.

Run this the moment a libespeak-ng appears in the image (check with
``ldconfig -p | grep espeak``): it phonemizes every sentence in the
goldens file through the ctypes binding
(pl_bert_tpu/preprocess/phonemize.py::EspeakBackend — the same code path
production preprocessing uses), records the library version, flips
``captured`` to true, and rewrites the file. Commit the result; from then
on ``tests/test_espeak_binding.py`` strictly compares binding output
against these goldens and fails on any drift (a mode-bit or
clause-advance bug would show up as a diff here, reference contract:
preprocess.py:435).

Usage:  python tools/gen_espeak_goldens.py [--goldens PATH]
"""

from __future__ import annotations

import argparse
import ctypes
import ctypes.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT_GOLDENS = REPO / "tests" / "goldens" / "espeak_ar_goldens.json"


def espeak_version() -> str:
    path = ctypes.util.find_library("espeak-ng") or ctypes.util.find_library(
        "espeak"
    )
    lib = ctypes.cdll.LoadLibrary(path)
    lib.espeak_Info.restype = ctypes.c_char_p
    ptr = ctypes.c_char_p()
    version = lib.espeak_Info(ctypes.byref(ptr))
    return (version or b"unknown").decode()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--goldens", type=Path, default=DEFAULT_GOLDENS)
    args = ap.parse_args()

    from pl_bert_tpu.preprocess.phonemize import EspeakBackend, strip_stress

    doc = json.loads(args.goldens.read_text(encoding="utf-8"))
    backend = EspeakBackend(language=doc["voice"], with_stress=True)
    for entry in doc["sentences"]:
        out = backend.phonemize_segment(entry["text"])
        entry["ipa_with_stress"] = out
        entry["ipa_no_stress"] = strip_stress(out)
        print(f"{entry['text']!r} -> {out!r}")
    doc["captured"] = True
    doc["espeak_ng_version"] = espeak_version()
    args.goldens.write_text(
        json.dumps(doc, ensure_ascii=False, indent=2) + "\n", encoding="utf-8"
    )
    print(f"\ncaptured {len(doc['sentences'])} goldens "
          f"(espeak-ng {doc['espeak_ng_version']}) -> {args.goldens}")
    print("commit the updated goldens file.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
