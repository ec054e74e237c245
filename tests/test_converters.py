"""Golden tests for the 18 token-class converters.

Goldens derive from the reference's documented behavior (docstring
example tables in reference converters/*.py) — they pin the
verbalization conventions: no "and"/hyphens in cardinals, digit zero as
"o", year style "nineteen o six", etc.
"""

import pytest

from pl_bert_tpu.text.converters import labels


@pytest.mark.parametrize(
    "token,expected",
    [
        ("0", "zero"),
        ("000", "zero"),
        ("5", "five"),
        ("13", "thirteen"),
        ("21", "twenty one"),
        ("100", "one hundred"),
        ("101", "one hundred one"),
        ("123", "one hundred twenty three"),
        ("1000", "one thousand"),
        ("2400", "two thousand four hundred"),
        ("1000000", "one million"),
        ("1,234,567", "one million two hundred thirty four thousand five hundred sixty seven"),
        ("-2", "minus two"),
        ("--2", "two"),
        ("II", "two"),
        ("I.", "one"),
        ("IV's", "four's"),
        ("MCMXC", "one thousand nine hundred ninety"),
        ("1010", "one thousand ten"),
    ],
)
def test_cardinal(token, expected):
    assert labels["CARDINAL"].convert(token) == expected


@pytest.mark.parametrize(
    "token,expected",
    [
        ("5th", "fifth"),
        ("1st", "first"),
        ("2nd", "second"),
        ("3rd", "third"),
        ("12th", "twelfth"),
        ("20th", "twentieth"),
        ("22nd", "twenty second"),
        ("100th", "one hundredth"),
        ("1000th", "one thousandth"),
        ("II", "the second"),
        ("9th", "ninth"),
        ("40th", "fortieth"),
    ],
)
def test_ordinal(token, expected):
    assert labels["ORDINAL"].convert(token) == expected


def test_roman():
    roman = labels["ROMAN"]
    assert roman.check_if_roman("XIV")
    assert roman.check_if_roman("IVth")
    assert not roman.check_if_roman("hello")
    assert roman.convert("XIV") == ("14", "")
    assert roman.convert("IIs") == ("2", "'s")
    assert roman.convert("MMXXV") == ("2025", "")


@pytest.mark.parametrize(
    "token,expected",
    [
        ("007", "double o seven"),
        ("003", "o o three"),
        ("120", "one two o"),
        ("5", "five"),
    ],
)
def test_digit(token, expected):
    assert labels["DIGIT"].convert(token) == expected


@pytest.mark.parametrize(
    "token,expected",
    [
        ("3.5", "three point five"),
        (".5", "point five"),
        ("3.0", "three point zero"),
        ("3.5 million", "three point five million"),
        ("1.02", "one point o two"),
        ("3.66E-49", "three point six six times ten to the minus forty nine"),
        ("-1.5", "minus one point five"),
    ],
)
def test_decimal(token, expected):
    assert labels["DECIMAL"].convert(token) == expected


@pytest.mark.parametrize(
    "token,expected",
    [
        ("1/4", "one quarter"),
        ("3/4", "three quarters"),
        ("4/1", "four over one"),
        ("1/2", "one half"),
        ("3/2", "three halves"),
        ("2/9", "two ninths"),
        ("1/9", "one ninth"),
        ("½", "one half"),
        ("1½", "one and a half"),
        ("8 1/2", "eight and a half"),
        ("⅛", "one eighth"),
        ("1⅛", "one and an eighth"),
        ("100 000/24", "one hundred thousand twenty fourths"),
    ],
)
def test_fraction(token, expected):
    assert labels["FRACTION"].convert(token) == expected


@pytest.mark.parametrize(
    "token,expected",
    [
        ("$0.15", "fifteen cents"),
        ("$1.56", "one dollar and fifty six cents"),
        ("$1", "one dollar"),
        ("$5", "five dollars"),
        ("£50", "fifty pounds"),
        ("US$75,000", "seventy five thousand dollars"),
        ("€3.5 million", "three point five million euros"),
        ("¥6,000,000", "six million yen"),
        ("9,500,000USD", "nine million five hundred thousand united states dollars"),
        ("$77,208", "seventy seven thousand two hundred eight dollars"),
        ("400 DKK", "four hundred danish kroner"),
        ("NOK 750,000", "seven hundred fifty thousand norwegian kroner"),
        ("16 DM", "sixteen german marks"),
        ("RS 1000", "one thousand rupees"),
        ("A$18.5 million", "eighteen point five million dollars"),
        ("$3bn", "three billion dollars"),
        ("Rs.6299", "six thousand two hundred ninety nine rupees"),
    ],
)
def test_money(token, expected):
    assert labels["MONEY"].convert(token) == expected


@pytest.mark.parametrize(
    "token,expected",
    [
        ("100km", "one hundred kilometers"),
        ("1 km", "one kilometer"),
        ("100km/h", "one hundred kilometers per hour"),
        ("5%", "five percent"),
        ("10 mA", "ten milliamperes"),
        ("3 cm3", "three c c"),
        ("55 mph", "fifty five miles per hour"),
        ("2.3 kg", "two point three kilograms"),
        ("30 km2", "thirty square kilometers"),
        ("1/2 kg", "one half of a kilogram"),
        ("5 GB", "five gigabytes"),
    ],
)
def test_measure(token, expected):
    assert labels["MEASURE"].convert(token) == expected


@pytest.mark.parametrize(
    "token,expected",
    [
        ("12:10 AM", "twelve ten a m"),
        ("3:00", "three o'clock"),
        ("15:00", "fifteen hundred"),
        ("12:00 pm", "twelve p m"),
        ("4:05", "four o five"),
        ("13:30", "thirteen thirty"),
        ("PM3", "three p m"),
        ("1:20:05", "one hour twenty minutes and five seconds"),
    ],
)
def test_time(token, expected):
    assert labels["TIME"].convert(token) == expected


@pytest.mark.parametrize(
    "token,expected",
    [
        ("23 Jan 2020", "the twenty third of january twenty twenty"),
        ("Jan 23 2020", "january twenty third twenty twenty"),
        ("2020", "twenty twenty"),
        ("1906", "nineteen o six"),
        ("90s", "nineties"),
        ("1990s", "nineteen nineties"),
        ("2000s", "two thousands"),
        ("13 AD", "thirteen a d"),
        ("5th July", "the fifth of july"),
        ("July 5", "july fifth"),
        ("2001", "two thousand one"),
        ("1800", "eighteen hundred"),
        ("12/25/2010", "december twenty fifth twenty ten"),
        ("Thursday 5 May", "thursday the fifth of may"),
    ],
)
def test_date(token, expected):
    assert labels["DATE"].convert(token) == expected


@pytest.mark.parametrize(
    "token,expected",
    [
        ("123-4567", "one two three sil four five six seven"),
        ("(02) 1234", "o two sil one two three four"),
        ("5-800", "five sil eight hundred"),
        ("8000", "eight thousand"),
    ],
)
def test_telephone(token, expected):
    assert labels["TELEPHONE"].convert(token) == expected


def test_electronic():
    e = labels["ELECTRONIC"]
    assert e.convert("::") == "::"
    assert e.convert("#Tag") == "hash tag tag"
    assert e.convert("#hello123") == "hash tag hello one two three"
    assert (
        e.convert("http://x.com/a")
        == "h t t p colon slash slash x dot com slash a"
    )
    # bare domain: letters spelled, "dot" kept whole
    assert e.convert("a.org") == "a dot o r g"


def test_address():
    a = labels["ADDRESS"]
    assert a.convert("I02W") == "i o two west"
    assert a.convert("A380") == "a three eighty"
    assert a.convert("B-52") == "b fifty two"


def test_letters():
    lt = labels["LETTERS"]
    assert lt.convert("ABC") == "a b c"
    assert lt.convert("ABCs") == "a b c's"
    assert lt.convert("mr.") == "m r"


def test_verbatim():
    v = labels["VERBATIM"]
    assert v.convert("&") == "and"
    assert v.convert("#") == "number"
    assert v.convert("π") == "pi"
    assert v.convert("Ω") == "omega"
    assert v.convert(".6-cM") == "dot s i x d a s h c m"
    assert v.convert("Q") == "Q"  # single unknown char preserved


def test_plain():
    p = labels["PLAIN"]
    assert p.convert("colour") == "color"
    assert p.convert("organising") == "organizing"
    assert p.convert("vs") == "versus"
    assert p.convert("DR") == "drive"
    assert p.convert("hello") == "hello"
    assert p.convert("Ringstrasse") == "ring strasse"


def test_punct_and_range():
    assert labels["PUNCT"].convert(";") == ";"
    assert labels["RANGE"].convert("3-5") == "three to five"
    assert labels["RANGE"].convert("10-20") == "ten to twenty"


def test_registry_complete():
    assert len(labels) == 18
    for name, conv in labels.items():
        assert hasattr(conv, "convert"), name
