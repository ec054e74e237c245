"""Text normalization / cleaning driver (L1).

Behavioral parity with the reference normalization layer
(reference: text_normalize.py:77-293):

- Unicode cleanup (control-char removal, whitespace canonicalization)
- Arabic pipeline: digits → Arabic number words, Arabic-only word filter,
  tashkeel (diacritic) stripping
- punctuation/word splitting against the shared PUNCTUATION set
- the English token-class router (``normalize_text``) — which in the
  reference is dead code because it calls an undefined ``remove_accents``
  (reference: text_normalize.py:282); implemented working here.
"""

from __future__ import annotations

import re
import unicodedata

from pl_bert_tpu.text.converters import labels
from pl_bert_tpu.text.arabic_numbers import arabic_number_words
from pl_bert_tpu.text.symbols import PUNCTUATION


def is_whitespace(char: str) -> bool:
    if char in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(char) == "Zs"


def is_control(char: str) -> bool:
    if char in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(char) in ("Cc", "Cf")


def clean_text(text: str) -> str:
    """Drop NUL/replacement/control chars; canonicalize whitespace to ' '."""
    out = []
    for char in text:
        cp = ord(char)
        if cp == 0 or cp == 0xFFFD or is_control(char):
            continue
        out.append(" " if is_whitespace(char) else char)
    return "".join(out)


_DIGITS = re.compile(r"\d+")


def convert_numbers_to_arabic_words(text: str) -> str:
    """Replace every digit run with its Arabic verbalization, longest
    runs first so "19" inside "1986" is not clobbered."""
    numbers = sorted(set(_DIGITS.findall(text)), key=len, reverse=True)
    for num in numbers:
        try:
            words = arabic_number_words(int(num))
        except (ValueError, NotImplementedError):
            continue
        # digit-boundary anchors: never rewrite a run embedded in a longer
        # run (e.g. when a huge ID failed verbalization and kept its digits)
        text = re.sub(rf"(?<!\d){re.escape(num)}(?!\d)", words, text)
    return text


_ARABIC_WORD = re.compile(
    r"^[؀-ۿݐ-ݿࢠ-ࣿ٠-٩]+$"
)


def filter_non_arabic_words(text: str) -> str:
    """Keep only words made entirely of Arabic-block characters."""
    return " ".join(w for w in text.split() if _ARABIC_WORD.fullmatch(w))


# The nine tashkeel marks: tanween (fath/damm/kasr), fatha, damma, kasra,
# shadda, sukoon, superscript alef.
_TASHKEEL = re.compile("[ً-ْٰ]")


def remove_diacritics(text: str) -> str:
    return _TASHKEEL.sub("", text)


_PUNCT_CLASS = re.escape("".join(PUNCTUATION))
_TOKEN_SPLIT = re.compile(f"([{_PUNCT_CLASS}])|([^\\s{_PUNCT_CLASS}]+)")


def separate_words_and_punctuation(text: str) -> list[str]:
    """Tokenize into words and standalone punctuation marks."""
    return [a if a else b for a, b in _TOKEN_SPLIT.findall(text)]


def remove_accents(text: str) -> str:
    """Strip combining marks ("café" → "cafe")."""
    decomposed = unicodedata.normalize("NFD", text)
    return "".join(c for c in decomposed if unicodedata.category(c) != "Mn")


# ---------------------------------------------------------------------------
# English token-class router (vestigial in the reference fork, kept for
# capability parity; reference: text_normalize.py:217-293)
# ---------------------------------------------------------------------------

MONTHS = frozenset(
    [
        "jan", "feb", "mar", "apr", "jun", "jul", "aug", "sep", "oct",
        "nov", "dec", "january", "february", "march", "april", "june",
        "july", "august", "september", "october", "november", "december",
    ]
)


def _has_numbers(s: str) -> bool:
    return any(c.isdigit() for c in s)


def _has_month(s: str) -> bool:
    return s.lower() in MONTHS or s == "May"


def normalize_single(text: str, prev_text: str = "", next_text: str = "") -> str:
    """Route one token to a converter by shape + neighbor context."""
    if "//" in text or ".com" in text or ".html" in text:
        text = labels["ELECTRONIC"].convert(text).upper()
    elif _has_numbers(text):
        if _has_month(prev_text):
            # month stays its own token; emit only the converted day part
            month = labels["DATE"].get_month(prev_text.lower())
            text = labels["DATE"].convert(f"{month} {text}").replace(month, "").strip()
        elif _has_month(next_text):
            month = labels["DATE"].get_month(next_text.lower())
            text = labels["DATE"].convert(f"{text} {month}").replace(month, "").strip()
        elif text.endswith(("th", "nd", "st", "rd")):
            text = labels["ORDINAL"].convert(text)
        elif ":" in text:
            text = labels["TIME"].convert(text)
        elif text.startswith(("$", "€", "£", "¥")):
            text = labels["MONEY"].convert(text)
        elif "/" in text:
            text = labels["FRACTION"].convert(text)
        elif "." in text:
            text = labels["DECIMAL"].convert(text)
        elif "," in text or len(text) <= 3:
            text = labels["CARDINAL"].convert(text)
        elif "-" in text:
            text = labels["RANGE"].convert(text)
        else:
            text = labels["DATE"].convert(text)
        if _has_numbers(text):
            text = labels["CARDINAL"].convert(text)
    elif text == "#" and _has_numbers(next_text):
        text = "number"
    return text.replace("$", "")


import functools


@functools.lru_cache(maxsize=1)
def _nltk_tokenizers():
    """Construct once (the reference caches at module scope,
    text_normalize.py:176): TweetTokenizer compiles its regexes at
    construction, a per-record cost in corpus-scale loops otherwise."""
    from nltk.tokenize import TweetTokenizer
    from nltk.tokenize.treebank import TreebankWordDetokenizer

    return TweetTokenizer(), TreebankWordDetokenizer()


def normalize_text(text: str) -> str:
    """Normalize an English sentence by routing each token through the
    converter registry with one-token lookahead/lookbehind context."""
    tokenizer, detokenizer = _nltk_tokenizers()

    text = (
        remove_accents(text)
        .replace("–", " to ")
        .replace("-", " - ")
        .replace(":p", ": p")
        .replace(":P", ": P")
        .replace(":d", ": d")
        .replace(":D", ": D")
    )
    words = tokenizer.tokenize(text)
    out = []
    for i, word in enumerate(words):
        prev_w = words[i - 1] if i > 0 else ""
        next_w = words[i + 1] if i + 1 < len(words) else ""
        out.append(normalize_single(word, prev_w, next_w))
    return (
        detokenizer
        .detokenize(out)
        .replace("’ s", "'s")
        .replace(" 's", "'s")
    )
