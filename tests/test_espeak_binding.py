"""espeak-ng binding parity (VERDICT r1 item 5 / next-round item 6).

The reference phonemizes through ``phonemizer.EspeakBackend(language='ar',
preserve_punctuation=True, with_stress=True)`` (reference:
preprocess.py:435). Neither ``phonemizer`` nor ``libespeak-ng`` exists in
this environment (CLAUDE.md), so parity is tested in two layers:

1. The pure configuration logic — the exact ``phonememode`` word passed
   to ``espeak_TextToPhonemes`` and the stress post-processing — is
   asserted against the documented espeak-ng API semantics that
   ``phonemizer`` relies on (speak_lib.h: bit 1 = IPA, bit 7 + bits 8-23
   = tie character; stress marks are emitted unconditionally in IPA mode
   and stripped by ``phonemizer`` only when with_stress=False).
2. An ARMED golden test (tests/goldens/espeak_ar_goldens.json): the
   moment ``libespeak-ng`` IS loadable, an uncaptured goldens file fails
   the suite with instructions to run ``tools/gen_espeak_goldens.py``;
   once captured, every sentence's binding output is strictly compared
   to the goldens (plus structural checks: IPA lands inside the
   188-symbol training vocabulary, with_stress=False output equals the
   stripped with_stress=True output) and any drift fails.
"""

import ctypes.util
import json
import pathlib

import pytest

from pl_bert_tpu.preprocess.phonemize import (
    EspeakBackend,
    espeak_phoneme_mode,
    strip_stress,
)


def test_phoneme_mode_matches_phonemizer_configuration():
    # phonemizer passes exactly 0x02 (IPA, bit 1) when no tie is used —
    # its default and the reference's configuration
    assert espeak_phoneme_mode() == 0x02
    # bit 0 must NOT be set: in the pre-NG espeak API it enabled ties
    # inside multi-letter phonemes, which would leak U+0361 into the
    # training vocabulary
    assert espeak_phoneme_mode() & 0x01 == 0


def test_phoneme_mode_tie_encoding():
    mode = espeak_phoneme_mode(tie=True)
    assert mode & 0x02  # still IPA
    assert mode & 0x80  # tie flag
    assert (mode >> 8) == 0x361  # combining double inverted breve


def test_strip_stress_matches_phonemizer_with_stress_false():
    assert strip_stress("ʔalsˈalaːmu ʕalˌajkum") == "ʔalsalaːmu ʕalajkum"
    assert strip_stress("no marks") == "no marks"
    assert strip_stress("") == ""


def test_reference_runs_with_stress_kept():
    # the reference's with_stress=True keeps espeak's stress marks; the
    # backend must default the same way
    import inspect

    sig = inspect.signature(EspeakBackend.__init__)
    assert sig.parameters["with_stress"].default is True


_HAS_ESPEAK = (
    ctypes.util.find_library("espeak-ng") or ctypes.util.find_library("espeak")
) is not None

_GOLDENS = pathlib.Path(__file__).parent / "goldens" / "espeak_ar_goldens.json"


def _load_goldens():
    return json.loads(_GOLDENS.read_text(encoding="utf-8"))


def test_goldens_file_well_formed():
    """The armed goldens file must stay structurally valid even while
    uncaptured, so the capture tool and the armed test below always have
    a working contract to execute against."""
    doc = _load_goldens()
    assert doc["voice"] == "ar"  # reference: preprocess.py:435
    assert len(doc["sentences"]) >= 10
    for entry in doc["sentences"]:
        assert entry["text"].strip()
        if doc["captured"]:
            assert entry["ipa_with_stress"]
            assert entry["ipa_no_stress"] == strip_stress(
                entry["ipa_with_stress"]
            )


@pytest.mark.skipif(not _HAS_ESPEAK, reason="libespeak-ng not installed")
def test_espeak_goldens_captured():
    """ARMED: fails the moment libespeak-ng becomes loadable while the
    goldens are still uncaptured — fabricated IPA would plant false
    alarms, so capture is forced through the real binding instead
    (VERDICT r2 item 4)."""
    doc = _load_goldens()
    assert doc["captured"], (
        "libespeak-ng is now available but the espeak goldens have never "
        "been captured — run `python tools/gen_espeak_goldens.py` and "
        "commit the updated goldens file"
    )


@pytest.mark.skipif(not _HAS_ESPEAK, reason="libespeak-ng not installed")
def test_espeak_integration_golden_parity():
    """Strict golden comparison: any binding-output drift (mode-bit bug,
    clause-advance bug, espeak version change) fails here."""
    from pl_bert_tpu.text.symbols import UNKNOWN_ID, encode

    doc = _load_goldens()
    stressed = EspeakBackend(language="ar", with_stress=True)
    plain = EspeakBackend(language="ar", with_stress=False)
    for entry in doc["sentences"]:
        s = entry["text"]
        out_s = stressed.phonemize_segment(s)
        out_p = plain.phonemize_segment(s)
        assert out_s.strip(), s
        # with_stress=False output IS the stripped with_stress=True output
        assert out_p == strip_stress(out_s)
        # word structure preserved: one phoneme word per input word
        assert len(out_s.split()) == len(s.split())
        # IPA output must land inside the 188-symbol table — an OOV char
        # here would silently skew the training vocabulary distribution
        ids = encode(out_s.replace(" ", ""))
        assert (ids != UNKNOWN_ID).all(), (s, out_s)
        if doc["captured"]:
            assert out_s == entry["ipa_with_stress"], (
                f"binding output drifted from golden for {s!r} "
                f"(golden espeak-ng {doc['espeak_ng_version']}): "
                f"{out_s!r} != {entry['ipa_with_stress']!r}"
            )
            assert out_p == entry["ipa_no_stress"]
