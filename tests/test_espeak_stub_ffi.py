"""Execute EspeakBackend's ctypes FFI loop against an in-repo ABI stub.

VERDICT round 3, next-round item 3: the binding
(pl_bert_tpu/preprocess/phonemize.py::EspeakBackend) had never executed
its FFI path because libespeak-ng is absent from this image. These tests
compile tests/espeak_stub/espeak_stub.c — a C library implementing the
exact espeak-ng ABI surface the binding uses (speak_lib.h semantics:
clause-chunked espeak_TextToPhonemes with pointer advancement and a
static reused result buffer) — and drive the real binding through it via
the PLBERT_ESPEAK_LIB override.

The real-espeak goldens (tests/goldens/espeak_ar_goldens.json) stay
armed and untouched: the stub is deliberately NOT discoverable by
ctypes.util.find_library, so the capture trigger cannot misfire.
"""

import ctypes
import subprocess
import sys

import pytest

from pl_bert_tpu.preprocess.phonemize import (
    EspeakBackend,
    get_g2p_backend,
    phonemize_text,
)

SRC = "tests/espeak_stub/espeak_stub.c"


@pytest.fixture(scope="session")
def stub_lib(tmp_path_factory):
    out = tmp_path_factory.mktemp("espeak_stub") / "libespeak-stub.so"
    subprocess.run(
        ["gcc", "-O2", "-shared", "-fPIC", "-o", str(out), SRC], check=True
    )
    return str(out)


@pytest.fixture()
def stub_backend(stub_lib, monkeypatch):
    monkeypatch.setenv("PLBERT_ESPEAK_LIB", stub_lib)
    return EspeakBackend(language="ar")


def stub_model(text: str) -> str:
    """Python mirror of the stub's phoneme model (see espeak_stub.c
    header): per word, U+02C8 prefix + lowercase + a->ɑ, e->ɛ; clause
    boundaries at '.' are invisible after the binding's re-join."""
    words = text.replace(".", " ").split()
    return " ".join(
        "ˈ" + w.lower().replace("a", "ɑ").replace("e", "ɛ") for w in words
    )


def test_stub_single_clause(stub_backend):
    assert stub_backend.phonemize_segment("salam alekum") == (
        "ˈsɑlɑm ˈɑlɛkum"
    )


def test_stub_multi_clause_chunked_loop(stub_backend):
    # three '.' clauses -> three espeak_TextToPhonemes calls; the
    # binding's while-loop must advance the pointer through all of them
    # and join the static-buffer snapshots it decoded per call
    text = "abc def. ghi. jkl"
    assert stub_backend.phonemize_segment(text) == stub_model(text)


def test_stub_utf8_passthrough(stub_backend):
    # multi-byte UTF-8 (Arabic) must round-trip the byte buffer intact
    text = "مرحبا world"
    assert stub_backend.phonemize_segment(text) == stub_model(text)


def test_stub_punctuation_only_clause(stub_backend):
    # a clause that contains no word yields the empty phoneme string;
    # the binding's split/join must not manufacture tokens from it
    assert stub_backend.phonemize_segment(".") == ""
    assert stub_backend.phonemize_segment("a. . b") == stub_model("a b")


def test_stub_with_stress_false_strips_stub_stress_marks(stub_lib, monkeypatch):
    monkeypatch.setenv("PLBERT_ESPEAK_LIB", stub_lib)
    backend = EspeakBackend(language="ar", with_stress=False)
    # the stub emits U+02C8 per word; with_stress=False must strip it —
    # the phonemizer package's post-processing the binding reproduces
    assert backend.phonemize_segment("salam alekum") == "sɑlɑm ɑlɛkum"


def test_stub_initialize_failure_raises(stub_lib, monkeypatch):
    monkeypatch.setenv("PLBERT_ESPEAK_LIB", stub_lib)
    monkeypatch.setenv("ESPEAK_STUB_FAIL_INIT", "1")
    with pytest.raises(RuntimeError, match="espeak_Initialize failed"):
        EspeakBackend(language="ar")


def test_stub_unknown_voice_raises(stub_lib, monkeypatch):
    monkeypatch.setenv("PLBERT_ESPEAK_LIB", stub_lib)
    with pytest.raises(RuntimeError, match="voice 'xx' unavailable"):
        EspeakBackend(language="xx")


def test_stub_binding_passes_documented_mode_words(stub_backend, stub_lib):
    stub_backend.phonemize_segment("check modes")
    lib = ctypes.CDLL(stub_lib)  # same process-wide handle/state
    # espeakCHARS_UTF8 = 1 (text encoding), phonememode 0x02 = IPA
    # without ties — the exact words phonemizer passes (phonemize.py
    # docstrings; reference preprocess.py:435 configuration)
    assert lib.espeak_stub_last_textmode() == 1
    assert lib.espeak_stub_last_phonememode() == 0x02
    # AUDIO_OUTPUT_SYNCHRONOUS (2) + espeakINITIALIZE_DONT_EXIT (0x8000):
    # anything else either opens an audio device or lets a missing
    # espeak-ng-data exit(1) the whole training process
    assert lib.espeak_stub_last_output_mode() == 2
    assert lib.espeak_stub_last_options() & 0x8000


def test_stub_voice_reasserted_per_segment(stub_backend, stub_lib):
    lib = ctypes.CDLL(stub_lib)
    before = lib.espeak_stub_voice_calls()
    stub_backend.phonemize_segment("one")
    stub_backend.phonemize_segment("two")
    # espeak's voice is process-global: the binding re-asserts it on
    # every call so a second backend with another language can't
    # silently retarget this one
    assert lib.espeak_stub_voice_calls() - before == 2


def test_stub_through_full_phonemize_text(stub_lib, monkeypatch):
    # end-to-end through the punctuation re-interleave (reference:
    # preprocess.py:66-107) with the real FFI backend underneath
    monkeypatch.setenv("PLBERT_ESPEAK_LIB", stub_lib)
    backend = get_g2p_backend("espeak", language="ar")
    out = phonemize_text("salam alekum , ya marhaba !", backend)
    assert out == ["ˈsɑlɑm", "ˈɑlɛkum", ",", "ˈyɑ", "ˈmɑrhɑbɑ", "!"]


def test_stub_long_text_many_chunks(stub_backend):
    # enough clauses to loop the FFI call dozens of times and enough
    # text to exercise buffer re-reads across static-buffer overwrites
    words = [f"w{i}a" for i in range(200)]
    text = ". ".join(words)
    assert stub_backend.phonemize_segment(text) == stub_model(text)
