"""Word-tokenizer differential parity vs the actual reference tokenizer.py.

Builds a 60k-style word vocabulary from the same random corpus through
both implementations (reference: tokenizer.py:13-68 builds from an
on-disk HF dataset; ours from any text iterable) and checks:

- identical vocab (specials + frequency order, Counter tie-break included)
- identical encode/decode on held-out random text
- OUR loader reads a REFERENCE-produced tokenizer directory unchanged
  (migration interop: the tokenizer.json contract is shared)

Skipped without the reference checkout or the `datasets` package.
"""

import os
import random
import sys

import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

ARABIC = "ابتثجحخدذرزسشصضطظعغفقكلمنهويية"


def _rand_word(rng):
    return "".join(rng.choice(ARABIC) for _ in range(rng.randint(1, 8)))


def _corpus(rng, n_articles=300, n_base_words=500):
    # Zipf-ish: draw from a small word pool so frequencies collide and the
    # Counter tie-break (insertion order) is actually exercised
    pool = [_rand_word(rng) for _ in range(n_base_words)]
    texts = []
    for _ in range(n_articles):
        k = rng.randint(3, 40)
        texts.append(" ".join(
            pool[min(int(rng.expovariate(1 / 60)), n_base_words - 1)]
            for _ in range(k)
        ))
    return texts


def test_differential_vocab_and_encode(tmp_path):
    datasets = pytest.importorskip("datasets")
    from pl_bert_tpu.text.word_tokenizer import WordTokenizer, create_word_tokenizer

    rng = random.Random("tokenizer-fuzz")
    texts = _corpus(rng)

    ds_dir = tmp_path / "corpus"
    datasets.Dataset.from_list([{"text": t} for t in texts]).save_to_disk(
        str(ds_dir)
    )

    sys.path.insert(0, REF)
    try:
        from tokenizer import ArabicWordTokenizer as RefTok
        from tokenizer import create_custom_tokenizer
    finally:
        sys.path.remove(REF)

    ref_dir = tmp_path / "ref_tok"
    ref_dict = create_custom_tokenizer(
        str(ds_dir), vocab_size=200, output_dir=str(ref_dir)
    )
    mine = create_word_tokenizer(texts, vocab_size=200)

    assert mine.vocab == ref_dict["vocab"]

    ref_tok = RefTok(str(ref_dir))
    held_out = _corpus(rng, n_articles=50) + ["كلمة غير معروفة أبدا"]
    for t in held_out:
        assert mine.encode(t) == ref_tok.encode(t)
        assert mine.decode(mine.encode(t)) == ref_tok.decode(ref_tok.encode(t))

    # migration interop: our loader consumes the reference-written
    # directory as-is (split_mode defaults to the reference's whitespace)
    loaded = WordTokenizer.load(str(ref_dir))
    assert loaded.vocab == ref_dict["vocab"]
    for t in held_out[:10]:
        assert loaded.encode(t) == ref_tok.encode(t)
