"""Symbol-table contract tests (reference: char_indexer.py:5-25)."""

import numpy as np

from pl_bert_tpu.text.symbols import (
    MASK_ID,
    NUM_SYMBOLS,
    PAD_ID,
    SEPARATOR_ID,
    SYMBOL_TO_ID,
    UNKNOWN_ID,
    CharacterIndexer,
    decode,
    encode,
    symbols,
)


def test_table_shape_and_special_ids():
    assert NUM_SYMBOLS == 188
    assert len(symbols) == len(set(symbols))
    assert PAD_ID == 0 and symbols[0] == "P"
    assert MASK_ID == 185 and symbols[185] == "M"
    assert SEPARATOR_ID == 186 and symbols[186] == " "
    assert UNKNOWN_ID == 187 and symbols[187] == "U"


def test_encode_bijective_on_vocab():
    all_syms = "".join(symbols)
    ids = encode(all_syms)
    assert ids.tolist() == list(range(NUM_SYMBOLS))
    assert decode(ids) == all_syms


def test_oov_maps_to_unknown():
    # Arabic letters, uppercase Latin (except P/M/U which ARE symbols),
    # CJK — all out-of-vocab.
    for ch in "عAZ漢é":
        assert encode(ch).tolist() == [UNKNOWN_ID]
    assert encode("P")[0] == PAD_ID  # P is the pad glyph, in-vocab


def test_known_punctuation_ids():
    for ch in ";:,.!?،؛؟«»—…":
        assert SYMBOL_TO_ID[ch] == encode(ch)[0]
        assert SYMBOL_TO_ID[ch] != UNKNOWN_ID


def test_character_indexer_callable_matches_encode():
    text = "ɑbˈxyz θ! عQÆ"
    ci = CharacterIndexer()
    assert ci(text) == encode(text).tolist()


def test_empty_string():
    out = encode("")
    assert isinstance(out, np.ndarray) and out.shape == (0,)


# --- differential vs the actual reference table (gated on the checkout) ---

import os
import random
import sys

import pytest


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference checkout absent"
)
def test_differential_vs_reference_char_indexer():
    """Every id the reference CharacterIndexer produces — over its whole
    vocab and 4000 random unicode chars (OOV fallback included) — must
    match ours bit for bit (reference: char_indexer.py:19-25)."""
    sys.path.insert(0, "/root/reference")
    try:
        from char_indexer import CharacterIndexer as RefIndexer
        from char_indexer import symbols as ref_symbols
    finally:
        sys.path.remove("/root/reference")

    assert list(symbols) == list(ref_symbols)
    ref = RefIndexer()
    mine = CharacterIndexer()

    vocab_text = "".join(ref_symbols)
    assert mine(vocab_text) == ref(vocab_text)

    rng = random.Random("indexer-fuzz")
    chars = [chr(rng.randint(1, 0x2FFF)) for _ in range(4000)]
    text = "".join(chars)
    assert mine(text) == ref(text)
