#!/usr/bin/env python
"""Full-pipeline scale rehearsal: 100k articles end to end.

The reference's configured corpus is wikimedia 20231101.ar (~1.2M
articles, configs/config.yml:9-10); this rig has zero egress and no
cached wiki shard (re-checked every round), so a REAL-corpus run stays
blocked (VERDICT r2 item 6). This rehearsal is the closest achievable
stand-in: a generated pseudo-Arabic corpus — Zipf-sampled Arabic-script
vocabulary, embedded digit runs (exercises the number-to-words
converter), Latin noise (exercises the Arabic-only filter), and real
Arabic punctuation — pushed through every production stage at 100k
articles on this host:

    clean (sharded engine) → phonemize → tokenize (60k-word vocab
    build) → pack (memory-mapped store) → 5-step training smoke

Prints one JSON line per stage plus a summary. Run:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python tools/pipeline_scale_rehearsal.py [--articles 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARABIC_LETTERS = list("ابتثجحخدذرزسشصضطظعغفقكلمنهوي")
PUNCT = ["،", ".", "؟", "!", ":"]


def generate_corpus(path: str, n_articles: int, seed: int = 0) -> None:
    import numpy as np

    rng = np.random.default_rng(seed)
    # Zipf-ish vocabulary of pseudo-Arabic words
    vocab_size = 50_000
    vocab = [
        "".join(rng.choice(ARABIC_LETTERS, size=int(n)))
        for n in rng.integers(2, 9, size=vocab_size)
    ]
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    t0 = time.perf_counter()
    with open(path, "w", encoding="utf-8") as f:
        for _ in range(n_articles):
            n_words = int(rng.integers(40, 120))
            idx = rng.choice(vocab_size, size=n_words, p=probs)
            words = [vocab[i] for i in idx]
            # sprinkle digits, Latin noise, punctuation
            for j in range(0, n_words, 17):
                words[j] = str(rng.integers(1, 4000))
            for j in range(5, n_words, 43):
                words[j] = "noise"
            for j in range(8, n_words, 11):
                words[j] = words[j] + rng.choice(PUNCT)
            f.write(" ".join(words) + "\n")
    print(json.dumps({
        "stage": "generate", "articles": n_articles,
        "seconds": round(time.perf_counter() - t0, 1),
    }), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--articles", type=int, default=100_000)
    ap.add_argument("--work", default="/tmp/plbert_scale_rehearsal")
    args = ap.parse_args()

    import dataclasses

    from pl_bert_tpu.config import Config
    from pl_bert_tpu.preprocess import pipeline as pp

    work = args.work
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    corpus_path = os.path.join(work, "corpus.txt")
    generate_corpus(corpus_path, args.articles)

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        preprocess_params=dataclasses.replace(
            cfg.preprocess_params,
            num_shards=100, max_workers=4, max_try_count=2, timeout=600,
            preprocess_dir=os.path.join(work, "prep"),
            cleaned_output_dir="cleaned", g2p_backend="identity",
        ),
        # pack and the training smoke must agree on L
        dataset_params=dataclasses.replace(
            cfg.dataset_params, max_seq_length=128
        ),
    )

    stages = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        stages[name] = dt
        print(json.dumps({
            "stage": name, "seconds": round(dt, 1),
            "articles_per_sec": round(args.articles / dt, 1),
        }), flush=True)
        return out

    cleaned = timed("clean", lambda: pp.main_clean(cfg, corpus_path))
    phonemized = timed(
        "phonemize", lambda: pp.main_phonemize(cfg, cleaned)
    )
    tokenized = timed(
        "tokenize",
        lambda: pp.main_tokenize(
            cfg, phonemized,
            tokenizer_dir=os.path.join(work, "word_tokenizer"),
        ),
    )
    packed = timed("pack", lambda: pp.main_pack(cfg, tokenized))

    # training smoke straight off the packed store
    from pl_bert_tpu.data.packed_store import open_packed_store
    from pl_bert_tpu.training.train import Trainer

    reader = open_packed_store(packed)
    assert len(reader) == args.articles, (len(reader), args.articles)
    tcfg = dataclasses.replace(
        cfg,
        training_params=dataclasses.replace(
            cfg.training_params, batch_size=8, data_axis=1, model_axis=1,
            num_steps=5, save_interval=1000,
            output_dir=os.path.join(work, "ckpt"),
        ),
        dataset_params=dataclasses.replace(
            cfg.dataset_params, max_seq_length=128, ondevice_masking=True,
        ),
        model_params=dataclasses.replace(
            cfg.model_params, hidden_size=64, num_attention_heads=2,
            intermediate_size=128, num_hidden_layers=2, embedding_size=32,
            max_position_embeddings=128, attention_impl="xla",
            num_token_vocab=60_000,
        ),
    )

    def train_smoke():
        t = Trainer(
            tcfg, os.path.join(work, "ckpt/run"), False, dataset=reader
        )
        t.train()
        assert t.current_step == 5
        return t

    timed("train_smoke_5steps", train_smoke)

    total = sum(stages.values())
    print(json.dumps({
        "stage": "TOTAL", "articles": args.articles,
        "seconds": round(total, 1),
        "end_to_end_articles_per_sec": round(args.articles / total, 1),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
