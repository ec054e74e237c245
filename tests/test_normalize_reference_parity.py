"""Randomized differential parity: normalize layer vs the actual reference.

Imports /root/reference/text_normalize.py (stubbing its absent
num2words/singleton_decorator deps — none of the functions compared here
call them) and runs seeded random adversarial text through both stacks:
Arabic letters, tashkeel marks, punctuation, exotic Unicode whitespace,
control/format chars, Latin noise, and Arabic-Indic digits.

An exploratory 2000-case/function sweep found ZERO divergences; the
committed test keeps 400/function as a fast regression net. Skipped when
the reference checkout is unavailable (the behavior itself is covered by
test_normalize.py's goldens).
"""

import os
import random
import sys
import types
import warnings

import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

ARABIC = "ابتثجحخدذرزسشصضطظعغفقكلمنهوييةءآأؤإئى"
TASHKEEL = "ًٌٍَُِّْٰ"
PUNCT = "؟،؛!?,.;:\"'()[]{}«»…-—/\\#$%&*+<=>@^_`|~"
WHITESPACE = " \t\n\r  　"
CONTROLS = "\x00\x07\x1b​‎‏‪﻿"
LATIN = "abcdefgXYZ"
DIGITS = "0123456789٠١٢٣٤٥٦٧٨٩"


@pytest.fixture(scope="module")
def ref_tn():
    for name in ("singleton_decorator",):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.singleton = lambda cls: cls
            sys.modules[name] = mod
    if "num2words" not in sys.modules:
        mod = types.ModuleType("num2words")

        def _stub(*a, **k):
            raise RuntimeError("num2words stub: not expected to be called")

        mod.num2words = _stub
        sys.modules["num2words"] = mod
    sys.path.insert(0, REF)
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import text_normalize as tn
        return tn
    finally:
        sys.path.remove(REF)


def _rand_text(rng):
    pools = [ARABIC * 4, TASHKEEL, PUNCT, WHITESPACE, CONTROLS, LATIN, DIGITS]
    weights = [10, 2, 3, 4, 1, 2, 2]
    return "".join(
        rng.choice(rng.choices(pools, weights)[0])
        for _ in range(rng.randint(0, 80))
    )


@pytest.mark.parametrize(
    "fn",
    ["clean_text", "remove_diacritics", "separate_words_and_punctuation",
     "filter_non_arabic_words"],
)
def test_randomized_differential_parity(ref_tn, fn):
    from pl_bert_tpu.text import normalize as mine

    ref_f = getattr(ref_tn, fn)
    my_f = getattr(mine, fn)
    rng = random.Random(f"norm-{fn}")
    mismatches = []
    for _ in range(400):
        t = _rand_text(rng)
        expected = ref_f(t)
        got = my_f(t)
        if expected != got:
            mismatches.append((t, expected, got))
    assert not mismatches, mismatches[:10]
