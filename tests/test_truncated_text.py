"""TruncatedTextDataset: sentence-boundary-aware random cropping
(reference: dataloader.py:144-197)."""

from pl_bert_tpu.data.dataset import TruncatedTextDataset
from pl_bert_tpu.text.symbols import PUNCTUATION


def _records(text):
    return [{"id": "1", "url": "u", "title": "t", "text": text}]


def test_short_text_unchanged():
    ds = TruncatedTextDataset(_records("جملة قصيرة."), max_seq_length=512)
    assert ds[0]["text"] == "جملة قصيرة."
    assert ds[0]["id"] == "1"  # other columns preserved


def test_long_text_cropped_at_sentence_boundaries():
    sentence = "هذه جملة تجريبية طويلة نوعا ما. "
    text = sentence * 60  # ~1900 chars
    ds = TruncatedTextDataset(_records(text), max_seq_length=300, seed=3)
    out = ds[0]["text"]
    # bounded with the 20% forward slack
    assert len(out) <= 300 + int(0.2 * 300) + 1
    # starts right after a sentence boundary (or at the text start)
    start = text.find(out)
    assert start != -1
    assert start == 0 or text[start - 1] in PUNCTUATION
    # ends with punctuation when a boundary was reachable
    assert out.rstrip()[-1] in PUNCTUATION


def test_crop_is_random_but_seeded():
    text = "كلمة. " * 400
    a = TruncatedTextDataset(_records(text), max_seq_length=100, seed=1)[0]["text"]
    ds_b = TruncatedTextDataset(_records(text), max_seq_length=100, seed=1)
    assert ds_b[0]["text"] == a  # same seed, same crop
