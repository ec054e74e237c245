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
