from pl_bert_tpu.text.symbols import (  # noqa: F401
    CharacterIndexer,
    LATIN_LETTERS,
    LETTERS_IPA,
    PAD,
    PHONEME_MASK,
    PHONEME_SEPARATOR,
    PUNCTUATION,
    UNKNOWN,
    symbols,
)
