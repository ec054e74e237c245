"""Differential converter parity against the actual reference code.

Runs a broad token sample through both implementations; skipped when the
reference checkout is unavailable. (The goldens in test_converters.py
cover behavior without the checkout.)
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


@pytest.fixture(scope="module")
def ref_converters():
    # the reference imports a tiny 'singleton_decorator' package we don't
    # ship — stub it
    if "singleton_decorator" not in sys.modules:
        mod = types.ModuleType("singleton_decorator")
        mod.singleton = lambda cls: cls
        sys.modules["singleton_decorator"] = mod
    sys.path.insert(0, REF)
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import converters.Address as A
            import converters.Cardinal as C
            import converters.Date as Dt
            import converters.Decimal as De
            import converters.Digit as Di
            import converters.Electronic as E
            import converters.Fraction as F
            import converters.Letters as L
            import converters.Measure as Me
            import converters.Money as Mo
            import converters.Ordinal as O
            import converters.Range as R
            import converters.Telephone as Te
            import converters.Time as Ti
            import converters.Verbatim as V
        return {
            "CARDINAL": C.Cardinal(), "ORDINAL": O.Ordinal(),
            "DIGIT": Di.Digit(), "DECIMAL": De.Decimal(),
            "FRACTION": F.Fraction(), "TIME": Ti.Time(), "DATE": Dt.Date(),
            "TELEPHONE": Te.Telephone(), "MONEY": Mo.Money(),
            "MEASURE": Me.Measure(), "ADDRESS": A.Address(),
            "ELECTRONIC": E.Electronic(), "LETTERS": L.Letters(),
            "VERBATIM": V.Verbatim(), "RANGE": R.Range(),
        }
    finally:
        sys.path.remove(REF)


CASES = {
    "CARDINAL": ["0", "007", "1,234", "-5", "--8", "II", "MCM", "XIVs",
                 "123456789", "1000000007"],
    "ORDINAL": ["1st", "22nd", "103rd", "11th", "II", "IVth", "XXIIs"],
    "DIGIT": ["007", "000", "0", "123450"],
    "DECIMAL": ["3.5 million", ".5", "3.0", "2.5E-10", "1.02 billion", "-7.25"],
    "FRACTION": ["½", "8 ½", "1½", "100 000/24", "4/1", "3/2", "1⅛", "7/8"],
    "TIME": ["12:10 AM", "3:00", "15:00", "12:00 pm", "4:05", "13:30", "PM3",
             "1:20:05", "11:59pm", "9.30 am", "10:05:30.75"],
    "DATE": ["23 Jan 2020", "Jan 23 2020", "2020", "1906", "90s", "1990s",
             "2000s", "13 AD", "5th July", "July 5", "2001", "1800",
             "12/25/2010", "Thursday 5 May", "2010-11-23", "14 February 1998",
             "March 1999", "2000 BC", "the 4th of July", "Mon 3 Jun 1990"],
    "TELEPHONE": ["123-4567", "(02) 1234", "5-800", "8000",
                  "1 (800) 555-0199 x12"],
    "MONEY": ["$0.15", "$1.56", "$1", "£50", "US$75,000", "€3.5 million",
              "¥6,000,000", "9,500,000USD", "400 DKK", "NOK 750,000",
              "16 DM", "RS 1000", "A$18.5 million", "$3bn", "Rs.6299",
              "INR 3,858 crore", "DKK 1.03", "Rs 10 lakh", "CA$1.7 million",
              "2016 dollars", "1 billion yen"],
    "MEASURE": ["100km", "1 km", "100km/h", "5%", "10 mA", "3 cm3", "55 mph",
                "2.3 kg", "30 km2", "1/2 kg", "5 GB", "6 ft", "20 kHz",
                "3.5 kWh", "75 kg/m3", "8 ½ in", "1000/year", '5"'],
    "ADDRESS": ["I02W", "A380", "B-52", "M25", "US 50", "I-80", "C3"],
    "ELECTRONIC": ["::", "#Tag", "#hello123", "http://x.com/a", "a.org",
                   "www.google.com", "site.com", "x.html"],
    "LETTERS": ["ABC", "ABCs", "mr.", "USAs", "é", "IQ", "DNA", "w-"],
    "VERBATIM": ["&", "#", "π", "Ω", ".6-cM", "Q", "%", "=", "_", "µ"],
    "RANGE": ["3-5", "10-20", "1-2-3", "7"],
}


def test_differential_parity(ref_converters):
    from pl_bert_tpu.text.converters import labels

    random.seed(0)
    mismatches = []
    for name, tokens in CASES.items():
        ref = ref_converters[name]
        mine = labels[name]
        for t in tokens:
            try:
                expected = ref.convert(t)
            except Exception:
                continue  # reference crashes → nothing to match
            got = mine.convert(t)
            if expected != got:
                mismatches.append((name, t, expected, got))
    assert not mismatches, mismatches[:10]
