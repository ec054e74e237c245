"""Memory-mapped packed store (VERDICT r2 item 1): parity with the
in-RAM packed datasets, the pack preprocessing stage, Trainer adoption,
and the bounded-RSS guarantee at ≥1M-sample scale."""

import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from pl_bert_tpu.data.packed import PackedPhonemeDataset, PackedSequenceDataset
from pl_bert_tpu.data.packed_store import (
    MemmapPackedDataset,
    MemmapPackedSequenceDataset,
    is_packed_store,
    open_packed_store,
    write_packed_store,
)
from pl_bert_tpu.training.train import make_synthetic_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def corpus():
    # word lengths 2-10 × 40-120 words → a healthy mix of short rows and
    # long rows needing per-epoch re-crops at L=128
    return make_synthetic_corpus(400, seed=3, token_vocab=300)


def test_rows_store_bit_parity_with_packed_dataset(tmp_path, corpus):
    """The memmap reader must replicate PackedPhonemeDataset batches
    bit-for-bit across epochs, including the Philox re-crop stream of
    long samples (multi-shard store so shard stitching is exercised)."""
    store = write_packed_store(
        iter(corpus), str(tmp_path / "st"), max_seq_length=128,
        shard_rows=90,
    )
    assert is_packed_store(store)
    reader = open_packed_store(store, seed=5)
    assert isinstance(reader, MemmapPackedDataset)
    ref = PackedPhonemeDataset(corpus, 128, seed=5)
    assert len(reader) == len(ref)
    assert reader.has_tokens
    # epochs must be visited in ascending order: PackedPhonemeDataset
    # mutates its arrays per epoch while the reader is stateless
    for epoch in (0, 1, 2, 7):
        got = list(reader.batches(32, epoch, seed=9))
        want = list(ref.batches(32, epoch, seed=9))
        assert len(got) == len(want) > 0
        for b1, b2 in zip(got, want):
            assert set(b1) == set(b2)
            for k in b2:
                np.testing.assert_array_equal(b1[k], b2[k], err_msg=f"{epoch}/{k}")


def test_rows_store_no_tokens(tmp_path):
    corpus = make_synthetic_corpus(50, seed=1)  # no token_ids column
    store = write_packed_store(
        iter(corpus), str(tmp_path / "st"), max_seq_length=64, shard_rows=20
    )
    reader = open_packed_store(store)
    assert not reader.has_tokens
    b = next(reader.batches(10, epoch=1))
    assert set(b) == {"label_ids", "word_ids", "lengths"}
    assert b["label_ids"].shape == (10, 64)


def test_packed_rows_store_single_chunk_parity(tmp_path, corpus):
    """With one write chunk the FFD binning scope equals the in-RAM
    global binning → bit parity with PackedSequenceDataset."""
    store = write_packed_store(
        iter(corpus), str(tmp_path / "st"), max_seq_length=256,
        sequence_packing=True, shard_rows=10_000,
    )
    reader = open_packed_store(store)
    assert isinstance(reader, MemmapPackedSequenceDataset)
    ref = PackedSequenceDataset(corpus, 256)
    assert len(reader) == len(ref)
    assert abs(reader.packing_efficiency - ref.packing_efficiency) < 1e-9
    for b1, b2 in zip(
        reader.batches(16, 1, seed=2), ref.batches(16, 1, seed=2)
    ):
        for k in b2:
            np.testing.assert_array_equal(b1[k], b2[k])


def test_packed_rows_store_chunked_occupancy(tmp_path, corpus):
    """Per-chunk FFD (multi-shard) must stay within a few percent of the
    global FFD's occupancy and keep row invariants."""
    store = write_packed_store(
        iter(corpus), str(tmp_path / "st"), max_seq_length=256,
        sequence_packing=True, shard_rows=100,
    )
    reader = open_packed_store(store)
    ref = PackedSequenceDataset(corpus, 256)
    assert reader.packing_efficiency > ref.packing_efficiency - 0.05
    b = next(reader.batches(8, 1))
    # segment ids: -1 padding, contiguous non-negative segments
    assert (b["segment_ids"] >= -1).all()
    # position ids restart at each segment
    for r in range(8):
        segs = b["segment_ids"][r]
        for s in np.unique(segs[segs >= 0]):
            pos = b["position_ids"][r][segs == s]
            np.testing.assert_array_equal(pos, np.arange(len(pos)))


def test_store_meta_and_validation_errors(tmp_path, corpus):
    store = write_packed_store(
        iter(corpus), str(tmp_path / "st"), max_seq_length=128, shard_rows=90
    )
    meta = json.load(open(os.path.join(store, "packed_meta.json")))
    assert meta["num_samples"] == len(corpus)
    true_max = max(max(r["token_ids"]) for r in corpus if r["token_ids"])
    assert meta["max_token_id"] == true_max
    # wrong-kind reader
    with pytest.raises(ValueError, match="kind"):
        MemmapPackedSequenceDataset(store)
    # empty dataset
    with pytest.raises(ValueError, match="empty"):
        write_packed_store(iter([]), str(tmp_path / "st2"))
    # inconsistent token columns
    bad = [{"phonemes": ["ab"], "token_ids": [5]}, {"phonemes": ["cd"]}]
    with pytest.raises(ValueError, match="inconsistent"):
        write_packed_store(iter(bad), str(tmp_path / "st3"))


def test_trainer_adopts_store_and_config_mismatch_fails(tmp_path, corpus):
    import dataclasses

    from pl_bert_tpu.config import Config
    from pl_bert_tpu.training.train import Trainer

    store = write_packed_store(
        iter(corpus), str(tmp_path / "st"), max_seq_length=64,
        token_separator=87, shard_rows=90,
    )
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        training_params=dataclasses.replace(
            cfg.training_params, batch_size=8, data_axis=-1, model_axis=1,
            output_dir=str(tmp_path / "ckpt"), num_steps=2,
        ),
        dataset_params=dataclasses.replace(
            cfg.dataset_params, max_seq_length=64, ondevice_masking=True,
        ),
        model_params=dataclasses.replace(
            cfg.model_params, hidden_size=32, num_attention_heads=2,
            intermediate_size=64, num_hidden_layers=1, embedding_size=16,
            max_position_embeddings=64, num_token_vocab=300,
        ),
    )
    reader = open_packed_store(store)
    t = Trainer(cfg, str(tmp_path / "ckpt/run"), resuming=False, dataset=reader)
    assert t.packed is reader
    assert reader.seed == cfg.training_params.seed
    t.train()
    assert t.current_step == 2

    # ondevice_masking off → loud error
    cfg_off = dataclasses.replace(
        cfg,
        dataset_params=dataclasses.replace(
            cfg.dataset_params, ondevice_masking=False
        ),
    )
    with pytest.raises(ValueError, match="on-device masking"):
        Trainer(cfg_off, str(tmp_path / "ckpt/run2"), resuming=False,
                dataset=open_packed_store(store))

    # L mismatch → loud error
    cfg_L = dataclasses.replace(
        cfg,
        dataset_params=dataclasses.replace(
            cfg.dataset_params, max_seq_length=128
        ),
        model_params=dataclasses.replace(
            cfg.model_params, max_position_embeddings=128
        ),
    )
    with pytest.raises(ValueError, match="max_seq_length"):
        Trainer(cfg_L, str(tmp_path / "ckpt/run3"), resuming=False,
                dataset=open_packed_store(store))


def test_load_training_dataset_resolves_store(tmp_path, corpus):
    from pl_bert_tpu.training.train import load_training_dataset

    store = write_packed_store(
        iter(corpus), str(tmp_path / "st"), max_seq_length=64, shard_rows=90
    )
    ds = load_training_dataset(store, "train")
    assert isinstance(ds, MemmapPackedDataset)


def test_pack_stage_cli(tmp_path):
    """main_pack over a jsonl dataset dir (streaming read)."""
    from pl_bert_tpu.config import Config
    from pl_bert_tpu.preprocess.pipeline import main_pack
    from pl_bert_tpu.preprocess.shard_engine import combine_and_save

    corpus = make_synthetic_corpus(60, seed=2, token_vocab=99)
    src = str(tmp_path / "phonemized")
    combine_and_save([corpus], src)
    import dataclasses

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        dataset_params=dataclasses.replace(
            cfg.dataset_params, max_seq_length=64
        ),
    )
    out = main_pack(cfg, src, shard_rows=25)
    assert is_packed_store(out)
    reader = open_packed_store(out)
    assert len(reader) == 60
    ref = PackedPhonemeDataset(corpus, 64, seed=1)
    b1 = next(reader.batches(16, 1, seed=4))
    b2 = next(ref.batches(16, 1, seed=4))
    for k in b2:
        np.testing.assert_array_equal(b1[k], b2[k])


_RSS_SCRIPT = textwrap.dedent("""
    import os, sys
    import numpy as np
    sys.path.insert(0, {repo!r})
    from pl_bert_tpu.data.packed_store import write_packed_store, open_packed_store

    def peak_rss():
        # VmHWM resets on exec, unlike ru_maxrss which inherits the
        # forking parent's footprint (pytest's ~1GB) pre-exec
        for line in open("/proc/self/status"):
            if line.startswith("VmHWM:"):
                return int(line.split()[1]) * 1024
        raise RuntimeError("no VmHWM")

    out = sys.argv[1]

    def gen(n):
        rng = np.random.default_rng(0)
        words = ["abcd", "efgh", "ijkl", "mnop", "qrstuvwx"]
        for i in range(n):
            k = int(rng.integers(4, 9))
            yield {{"phonemes": [words[int(j)] for j in rng.integers(0, 5, k)]}}

    def curmb():
        return int(open("/proc/self/statm").read().split()[1]) * 4096 >> 20

    class TracedGen:
        def __init__(self, it): self.it, self.n = iter(it), 0
        def __iter__(self): return self
        def __next__(self):
            self.n += 1
            if self.n % 131072 == 0:
                print(f"gen {{self.n}} rss {{curmb()}}MiB", flush=True)
            return next(self.it)

    N = 1_000_000
    write_packed_store(TracedGen(gen(N)), out, max_seq_length=64, shard_rows=131072)
    print(f"pack done rss {{curmb()}}MiB", flush=True)
    store_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(out) for f in fs
    )
    rss_after_pack = peak_rss()

    import time
    t0 = time.monotonic()
    reader = open_packed_store(out)
    startup = time.monotonic() - t0
    assert len(reader) == N

    # iterate well past the madvise interval with shuffled batches over
    # the WHOLE corpus (every shard touched repeatedly)
    n_batches = 0
    for epoch in (1, 2):
        for b in reader.batches(256, epoch, seed=1):
            n_batches += 1
            if n_batches % 400 == 0:
                cur = int(open("/proc/self/statm").read().split()[1]) * 4096
                print(f"batch {{n_batches}} rss {{cur>>20}}MiB", flush=True)
            if n_batches >= 2000:
                break
        if n_batches >= 2000:
            break
    peak = peak_rss()
    print(f"RESULT store={{store_bytes}} peak={{peak}} "
          f"pack_peak={{rss_after_pack}} startup={{startup:.3f}} "
          f"batches={{n_batches}}")
""")


def test_million_sample_store_bounded_rss(tmp_path):
    """VERDICT r2 item 1 'done' criterion: a ≥1M-sample corpus trains
    with flat memory and startup in seconds. The subprocess packs 1M
    samples STREAMED (writer never holds the corpus), then iterates 2000
    shuffled 256-row batches (≈512k rows, every shard touched); peak RSS
    must stay far below the on-disk store size."""
    script = _RSS_SCRIPT.format(repo=REPO)
    out = str(tmp_path / "bigstore")
    proc = subprocess.run(
        [sys.executable, "-c", script, out],
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    print(proc.stdout)  # RSS trajectory, shown on failure
    result = [l for l in proc.stdout.splitlines() if l.startswith("RESULT")][0]
    kv = dict(p.split("=") for p in result.split()[1:])
    store = int(kv["store"])
    peak = int(kv["peak"])
    startup = float(kv["startup"])
    assert store > 400 << 20, f"store unexpectedly small: {store >> 20}MiB"
    # flat memory: peak RSS (incl. the Python runtime ~170MiB and the
    # writer's per-chunk buffers) bounded well below the store size and
    # independent of batches iterated
    assert peak < 400 << 20, (
        f"peak RSS {peak >> 20}MiB vs store {store >> 20}MiB — reader "
        "residency is not bounded"
    )
    assert startup < 5.0, f"reader startup took {startup:.1f}s"


def test_store_resume_matches_uninterrupted_run(tmp_path):
    """The full training lifecycle on a memmap store: a run interrupted
    mid-epoch and resumed must end with the same params as an
    uninterrupted run — exercising the store's deterministic epoch
    permutations, the per-epoch re-crop stream across the restart, and
    checkpoint restore with a store-backed Trainer."""
    import dataclasses

    import jax

    from pl_bert_tpu.config import Config
    from pl_bert_tpu.training.train import Trainer

    corpus = make_synthetic_corpus(120, seed=7)
    store = write_packed_store(
        iter(corpus), str(tmp_path / "st"), max_seq_length=64, shard_rows=50
    )

    def cfg(num_steps):
        c = Config()
        return dataclasses.replace(
            c,
            training_params=dataclasses.replace(
                c.training_params, batch_size=8, data_axis=-1, model_axis=1,
                num_steps=num_steps, save_interval=5, log_interval=100,
                learning_rate=1e-3, mixed_precision="fp32",
                output_dir=str(tmp_path / "ckpt"),
            ),
            dataset_params=dataclasses.replace(
                c.dataset_params, max_seq_length=64, ondevice_masking=True,
            ),
            model_params=dataclasses.replace(
                c.model_params, hidden_size=32, num_attention_heads=2,
                intermediate_size=64, num_hidden_layers=1, embedding_size=16,
                max_position_embeddings=64, dropout=0.0, attention_impl="xla",
            ),
        )

    # interrupted: 5 steps (ckpt mid-epoch), then resume to 20 — the
    # 14-row epoch spills into epoch 2, crossing a re-crop boundary
    a = Trainer(cfg(5), str(tmp_path / "ckpt/run"), False,
                dataset=open_packed_store(store))
    a.train()
    assert a.current_step == 5
    b = Trainer(cfg(20), str(tmp_path / "ckpt/run"), True,
                dataset=open_packed_store(store))
    assert b.current_step == 5
    b.train()
    assert b.current_step == 20

    # uninterrupted ground truth
    c = Trainer(cfg(20), str(tmp_path / "ckpt/ref"), False,
                dataset=open_packed_store(store))
    c.train()

    for pb, pc in zip(
        jax.tree.leaves(b.state.params), jax.tree.leaves(c.state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(pb), np.asarray(pc), rtol=1e-6, atol=1e-7
        )


def test_pack_stage_accepts_arrow_dataset(tmp_path):
    """main_pack over the reference's save_to_disk (arrow) format — the
    dataset layout a migrating reference user actually has (reference:
    preprocess.py:364-371)."""
    datasets = pytest.importorskip("datasets")

    from pl_bert_tpu.config import Config
    from pl_bert_tpu.preprocess.pipeline import main_pack

    corpus = make_synthetic_corpus(40, seed=5, token_vocab=120)
    src = str(tmp_path / "arrow_ds")
    datasets.Dataset.from_list(corpus).save_to_disk(src)

    import dataclasses

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        dataset_params=dataclasses.replace(
            cfg.dataset_params, max_seq_length=64
        ),
    )
    out = main_pack(cfg, src, shard_rows=16)
    reader = open_packed_store(out)
    assert len(reader) == 40 and reader.has_tokens
    ref = PackedPhonemeDataset(corpus, 64, seed=1)
    b1 = next(reader.batches(8, 1, seed=2))
    b2 = next(ref.batches(8, 1, seed=2))
    for k in b2:
        np.testing.assert_array_equal(b1[k], b2[k])


def test_repack_over_existing_store_swaps_atomically(tmp_path, corpus):
    """Re-packing over an existing store must install the new one with
    the old intact until the final rename (no window with NO store at
    the configured path) and leave no .replaced remnant behind."""
    out = str(tmp_path / "st_swap")
    write_packed_store(iter(corpus[:50]), out, max_seq_length=128)
    first_rows = open_packed_store(out).meta["num_samples"]
    write_packed_store(iter(corpus), out, max_seq_length=128)
    second = open_packed_store(out)
    assert second.meta["num_samples"] == len(corpus) != first_rows
    assert not os.path.exists(out + ".replaced")
    assert not os.path.exists(out + ".tmp")


def test_misaligned_token_ids_fail_with_record_index(tmp_path):
    """A token_ids list whose length disagrees with its phoneme words
    must fail upfront naming the record — not as an opaque numpy
    broadcast error deep inside a shard write."""
    records = [
        {"phonemes": ["ab", "cd"], "token_ids": [1, 2]} for _ in range(3)
    ]
    records.append({"phonemes": ["ab", "cd"], "token_ids": [1]})
    with pytest.raises(ValueError, match="record 3"):
        write_packed_store(iter(records), str(tmp_path / "st_bad"))


def test_store_vocab_check_includes_separator(tmp_path):
    """The store records the max RAW token id; the Trainer's vocab check
    must also cover the separator id physically written at separator
    positions — a head sized between them would silently clamp every
    separator label (same guarantee the in-RAM path gets from
    token_ids.max())."""
    import dataclasses

    from pl_bert_tpu.config import Config
    from pl_bert_tpu.training.train import Trainer

    corpus = make_synthetic_corpus(40, seed=5, token_vocab=50)
    store = write_packed_store(
        iter(corpus), str(tmp_path / "st_sep"), max_seq_length=64,
        token_separator=87,
    )
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        training_params=dataclasses.replace(
            cfg.training_params, batch_size=8, num_steps=1,
            output_dir=str(tmp_path / "ckpt"), training_dataset=store,
            mixed_precision="fp32",
        ),
        dataset_params=dataclasses.replace(
            cfg.dataset_params, max_seq_length=64, ondevice_masking=True,
            word_separator=87,
        ),
        model_params=dataclasses.replace(
            cfg.model_params, hidden_size=64, num_attention_heads=4,
            intermediate_size=128, max_position_embeddings=64,
            num_hidden_layers=2, embedding_size=32, attention_impl="xla",
            num_token_vocab=60,  # > max raw id 50, but < separator 87
        ),
    )
    with pytest.raises(ValueError, match="word_separator|num_token_vocab"):
        Trainer(cfg, str(tmp_path / "ckpt/run_sep"), resuming=False)
