"""Normalization-layer tests (reference behavior: text_normalize.py:77-293)."""

import pytest

from pl_bert_tpu.text.arabic_numbers import arabic_number_words
from pl_bert_tpu.text.normalize import (
    clean_text,
    convert_numbers_to_arabic_words,
    filter_non_arabic_words,
    normalize_text,
    remove_accents,
    remove_diacritics,
    separate_words_and_punctuation,
)


def test_clean_text_controls_and_whitespace():
    assert clean_text("a\x00b�c") == "abc"
    assert clean_text("a\tb\nc") == "a b c"
    assert clean_text("a​b") == "ab"  # zero-width space is Cf
    assert clean_text("a b") == "a b"  # nbsp is Zs


@pytest.mark.parametrize(
    "n,words",
    [
        (0, "صفر"),
        (1, "واحد"),
        (2, "اثنان"),
        (11, "أحد عشر"),
        (21, "واحد وعشرون"),
        (100, "مائة"),
        (125, "مائة وخمسة وعشرون"),
        (200, "مائتان"),
        (1000, "ألف"),
        (2000, "ألفان"),
        (3000, "ثلاثة آلاف"),
        (1000000, "مليون"),
        (-5, "سالب خمسة"),
        (1986, "ألف وتسعمائة وستة وثمانون"),
    ],
)
def test_arabic_numbers(n, words):
    assert arabic_number_words(n) == words


def test_convert_numbers_in_arabic_text():
    out = convert_numbers_to_arabic_words("عام 1986 كان")
    assert "1986" not in out
    assert "ألف وتسعمائة وستة وثمانون" in out
    # longest-first replacement: "19" inside "1986" must not be clobbered
    out2 = convert_numbers_to_arabic_words("19 و 1986")
    assert "تسعة عشر" in out2 and "ألف وتسعمائة وستة وثمانون" in out2


def test_filter_non_arabic_words():
    assert filter_non_arabic_words("مرحبا hello بالعالم") == "مرحبا بالعالم"
    assert filter_non_arabic_words("abc 123") == ""
    # mixed-script words are dropped entirely
    assert filter_non_arabic_words("عربيx") == ""


def test_remove_diacritics():
    assert remove_diacritics("مَرْحَبًا") == "مرحبا"
    assert remove_diacritics("الشَّدَّة") == "الشدة"
    assert remove_diacritics("بدون") == "بدون"


def test_separate_words_and_punctuation():
    assert separate_words_and_punctuation("مرحبا، بالعالم!") == [
        "مرحبا", "،", "بالعالم", "!",
    ]
    assert separate_words_and_punctuation("a.b") == ["a", ".", "b"]


def test_remove_accents():
    assert remove_accents("café naïve") == "cafe naive"


def test_normalize_text_english():
    # The reference documents this exact smoke input
    # (reference: text_normalize.py:295-298) but its implementation crashes
    # on an undefined remove_accents; ours runs.
    out = normalize_text("hello (23 Jan 2020, 12:10 AM)")
    assert "the twenty third of" in out
    assert "twenty twenty" in out
    assert "twelve ten" in out
    assert not any(c.isdigit() for c in out)


def _convert_numbers_longest_first(text: str) -> str:
    """Oracle: the pre-optimization algorithm (and the reference's shape,
    text_normalize.py:112-134) — distinct digit runs, longest first, each
    globally substituted with digit-boundary anchors."""
    import re

    numbers = sorted(set(re.findall(r"\d+", text)), key=len, reverse=True)
    for num in numbers:
        try:
            words = arabic_number_words(int(num))
        except (ValueError, NotImplementedError):
            continue
        text = re.sub(rf"(?<!\d){re.escape(num)}(?!\d)", words, text)
    return text


def test_convert_numbers_single_pass_equivalence():
    """The single-pass \\d+ callback must match the longest-first anchored
    substitution on randomized digit-heavy text: repeated runs, leading
    zeros, runs adjacent to letters, Arabic-Indic digits (\\d matches
    them and int() parses them), and huge runs the engine refuses
    (NotImplementedError keeps the digits)."""
    import random

    rng = random.Random(0xA11CE)
    pieces = [
        "19", "1986", "007", "٥", "٩٨", "1٥", "0", "25",
        "1" * 40,  # beyond the engine's scales -> kept as digits
        "كان", "عام", "abc", "x", "،", " ", "  ", "-", ".",
    ]
    for _ in range(400):
        text = "".join(
            rng.choice(pieces) for _ in range(rng.randint(0, 30))
        )
        assert convert_numbers_to_arabic_words(text) == (
            _convert_numbers_longest_first(text)
        ), repr(text)
