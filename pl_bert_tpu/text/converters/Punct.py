"""PUNCT converter — identity (behavioral parity: reference converters/Punct.py:5-18)."""


class Punct:
    def convert(self, token: str) -> str:
        return token
