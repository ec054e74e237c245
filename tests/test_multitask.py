"""Multi-task (phoneme + grapheme head) training path, end-to-end.

The upstream PL-BERT variant trains both heads; this fork's config runs
phoneme-only (reference: train.py:265-270) but the multi-task capability
is part of the surface (reference: model.py:5-18, convert_to_hf.py:29).
"""

import json

import numpy as np

from pl_bert_tpu.config import Config
from pl_bert_tpu.training.train import Trainer, train


def _corpus(n=48, seed=0, vocab=50):
    rng = np.random.default_rng(seed)
    alphabet = list("ɑɐɒæbtkmnlsʃθð")
    out = []
    for _ in range(n):
        k = int(rng.integers(5, 20))
        words = [
            "".join(rng.choice(alphabet, size=int(rng.integers(2, 8))))
            for _ in range(k)
        ]
        out.append(
            {
                "phonemes": words,
                "token_ids": rng.integers(0, vocab, size=k).tolist(),
            }
        )
    return out


def test_multitask_training_end_to_end(tmp_path):
    raw = {
        "training_params": {
            "output_dir": str(tmp_path / "ckpt"),
            "batch_size": 8,
            "save_interval": 100,
            "log_interval": 2,
            "num_steps": 4,
            "learning_rate": 1e-3,
            "training_dataset": "synthetic:48",  # replaced by explicit dataset
            "mixed_precision": "fp32",
        },
        "dataset_params": {"max_seq_length": 64, "word_separator": 87},
        "model_params": {
            "hidden_size": 64,
            "num_attention_heads": 4,
            "intermediate_size": 128,
            "max_position_embeddings": 64,
            "num_hidden_layers": 2,
            "embedding_size": 32,
            "attention_impl": "xla",
            "num_token_vocab": 100,  # enables the grapheme head
        },
    }
    config = Config.from_dict(raw)
    trainer = Trainer(config, str(tmp_path / "run"), False, dataset=_corpus())
    assert trainer.use_token_ids

    losses_t = []
    for i, batch in enumerate(trainer._train_batches(epoch=1)):
        trainer.state, m = trainer.train_step(
            trainer.state, trainer._put(batch), trainer.base_rng
        )
        assert float(m["token_loss"]) > 0  # grapheme head actually training
        assert float(m["phoneme_loss"]) > 0
        losses_t.append(float(m["loss"]))
        if i == 5:
            break
    assert losses_t[-1] < losses_t[0]

    val_loss, val_acc = trainer.validate()
    assert val_loss > 0
    # multi-task validation additionally reports the grapheme head
    # (additive over the reference, which validates phoneme loss only)
    extras = trainer.last_val_extras
    assert extras is not None
    assert extras["val_token_loss"] > 0
    assert 0.0 <= extras["val_token_accuracy"] <= 1.0

    # the gather/chunked grapheme-head accuracy inside the eval step
    # agrees with a direct full-logits argmax
    import jax
    import jax.numpy as jnp

    from pl_bert_tpu.ops.masked_ce import masked_accuracy
    from pl_bert_tpu.training.train_step import batch_to_arrays

    batch = next(iter(trainer._val_batches()))
    arrays = trainer._pad_batch(batch_to_arrays(batch), 8)
    out = trainer.eval_step(
        trainer.state.params, trainer._put(arrays), jax.random.key(0)
    )
    assert len(out) == 5
    params = trainer.state.params
    attn = (
        jnp.arange(arrays["masked_ids"].shape[1])[None, :]
        < arrays["lengths"][:, None]
    ).astype(jnp.int32)
    _, hidden = trainer.model.apply(
        {"params": params}, arrays["masked_ids"], attn,
        project_tokens=False, deterministic=True,
    )
    head = params["token_predictor"]
    full_logits = hidden @ head["kernel"] + head["bias"]
    direct = masked_accuracy(
        full_logits, arrays["token_ids"], arrays["mask_positions"],
        arrays["lengths"],
    )
    assert abs(float(out[4]) - float(direct)) < 1e-6


# ---- multi-task THROUGH on-device masking (VERDICT r1 item 4) ----
# The reference's main path carries per-word token_ids expanded to
# per-phoneme grapheme labels (reference: dataloader.py:40, 66-68); the
# packed on-device layout must carry the identical expansion.


def test_packed_token_ids_match_host_expansion():
    from pl_bert_tpu.data.masking import MaskingParams, WholeWordMasker
    from pl_bert_tpu.data.packed import PackedPhonemeDataset

    data = _corpus(n=6, seed=3)
    L = 64
    packed = PackedPhonemeDataset(data, L, seed=1, token_separator=87)
    assert packed.has_tokens
    masker = WholeWordMasker(MaskingParams(max_seq_length=L, word_separator=87))
    for i, row in enumerate(data):
        if sum(len(w) + 1 for w in row["phonemes"]) > L:
            continue  # host applies its own random crop for long samples
        host = masker(row["phonemes"], epoch=1, index=i,
                      token_ids=row["token_ids"])
        n = len(host.token_ids)
        np.testing.assert_array_equal(packed.token_ids[i, :n], host.token_ids)
        assert (packed.token_ids[i, n:] == 0).all()


def test_packed_token_ids_track_recrop_offsets():
    """After a per-epoch re-crop of long samples, token rows must stay
    aligned with the label/word rows at the new window."""
    from pl_bert_tpu.data.packed import PackedPhonemeDataset

    rng = np.random.default_rng(0)
    alphabet = list("ɑɐɒæbtkmnlsʃθð")
    data = []
    for _ in range(4):
        k = 60  # long: ~60 words x ~5 chars >> L=64
        words = ["".join(rng.choice(alphabet, size=5)) for _ in range(k)]
        # token id == word index, so alignment is directly checkable
        data.append({"phonemes": words, "token_ids": list(range(k))})
    L = 64
    packed = PackedPhonemeDataset(data, L, seed=1, token_separator=87)
    for epoch in (1, 2):
        next(iter(packed.batches(2, epoch=epoch)))  # triggers recrop
        for i in range(len(data)):
            wids = packed.word_ids[i]
            toks = packed.token_ids[i]
            n = int(packed.lengths[i])
            chars = (wids[:n] >= 0).nonzero()[0]
            base = toks[chars[0]] - wids[chars[0]]
            np.testing.assert_array_equal(
                toks[chars], wids[chars] + base,
                err_msg=f"epoch {epoch} sample {i}: token/word misalignment",
            )
            seps = (wids[:n] == -1).nonzero()[0]
            assert (toks[seps] == 87).all()


def _mt_ondevice_config(tmp_path, **dataset_extra):
    raw = {
        "training_params": {
            "output_dir": str(tmp_path / "ckpt"),
            "batch_size": 8,
            "save_interval": 100,
            "log_interval": 2,
            "num_steps": 4,
            "learning_rate": 1e-3,
            "training_dataset": "synthetic:48",
            "mixed_precision": "fp32",
        },
        "dataset_params": {
            "max_seq_length": 64,
            "word_separator": 87,
            "ondevice_masking": True,
            **dataset_extra,
        },
        "model_params": {
            "hidden_size": 64,
            "num_attention_heads": 4,
            "intermediate_size": 128,
            "max_position_embeddings": 64,
            "num_hidden_layers": 2,
            "embedding_size": 32,
            "attention_impl": "xla",
            "num_token_vocab": 100,
        },
    }
    return Config.from_dict(raw)


def test_multitask_ondevice_masking_end_to_end(tmp_path):
    config = _mt_ondevice_config(tmp_path)
    trainer = Trainer(config, str(tmp_path / "run"), False, dataset=_corpus())
    assert trainer.use_token_ids and trainer.ondevice_masking
    losses = []
    for i, batch in enumerate(trainer._train_batches(epoch=1)):
        trainer.state, m = trainer.train_step(
            trainer.state, trainer._put(batch), trainer.base_rng
        )
        assert float(m["token_loss"]) > 0
        assert float(m["phoneme_loss"]) > 0
        losses.append(float(m["loss"]))
        if i == 5:
            break
    assert losses[-1] < losses[0]
    val_loss, val_acc = trainer.validate()
    assert val_loss > 0


def test_multitask_sequence_packing_end_to_end(tmp_path):
    config = _mt_ondevice_config(tmp_path, sequence_packing=True)
    trainer = Trainer(config, str(tmp_path / "run"), False, dataset=_corpus())
    assert trainer.packed.has_tokens
    batch = next(iter(trainer._train_batches(epoch=1)))
    assert "token_ids" in batch and "segment_ids" in batch
    trainer.state, m = trainer.train_step(
        trainer.state, trainer._put(batch), trainer.base_rng
    )
    assert float(m["token_loss"]) > 0


def test_multitask_ondevice_requires_token_ids(tmp_path):
    import pytest

    config = _mt_ondevice_config(tmp_path)
    data = [{"phonemes": r["phonemes"]} for r in _corpus()]  # no token_ids
    with pytest.raises(ValueError, match="token_ids"):
        Trainer(config, str(tmp_path / "run"), False, dataset=data)


def test_trainer_rejects_head_smaller_than_separator(tmp_path):
    import pytest as _pytest

    from pl_bert_tpu.config import Config
    from pl_bert_tpu.training.train import Trainer, make_synthetic_corpus

    cfg = Config.from_dict(
        {
            "training_params": {"output_dir": str(tmp_path), "batch_size": 8},
            "dataset_params": {"max_seq_length": 64},
            "model_params": {
                "hidden_size": 32, "num_attention_heads": 2,
                "intermediate_size": 64, "max_position_embeddings": 64,
                "num_hidden_layers": 1, "embedding_size": 16,
                "attention_impl": "xla",
                "num_token_vocab": 64,  # <= word_separator 87
            },
        }
    )
    corpus = make_synthetic_corpus(8, token_vocab=64)
    with _pytest.raises(ValueError, match="word_separator"):
        Trainer(cfg, str(tmp_path / "run"), False, dataset=corpus)


def test_trainer_rejects_dataset_without_token_ids(tmp_path):
    import pytest as _pytest

    from pl_bert_tpu.config import Config
    from pl_bert_tpu.training.train import Trainer, make_synthetic_corpus

    cfg = Config.from_dict(
        {
            "training_params": {"output_dir": str(tmp_path), "batch_size": 8},
            "dataset_params": {"max_seq_length": 64},
            "model_params": {
                "hidden_size": 32, "num_attention_heads": 2,
                "intermediate_size": 64, "max_position_embeddings": 64,
                "num_hidden_layers": 1, "embedding_size": 16,
                "attention_impl": "xla",
                "num_token_vocab": 100,
            },
        }
    )
    corpus = make_synthetic_corpus(8)  # NO token_ids column
    with _pytest.raises(ValueError, match="token_ids"):
        Trainer(cfg, str(tmp_path / "run"), False, dataset=corpus)


def test_fused_lm_head_trajectory_matches_default(tmp_path):
    """training_params.fused_lm_head swaps the grapheme-head CE for the
    forward-computed-gradients op (ops/masked_ce.py::masked_lm_loss_fused).
    In fp32 its gradients equal autodiff to rounding — the short loss
    trajectory must track the default path step for step."""
    raw = {
        "training_params": {
            "output_dir": str(tmp_path / "ckpt"),
            "batch_size": 8,
            "save_interval": 100,
            "num_steps": 6,
            "learning_rate": 1e-3,
            "training_dataset": "explicit",
            "mixed_precision": "fp32",
        },
        "dataset_params": {"max_seq_length": 64, "word_separator": 87},
        "model_params": {
            "hidden_size": 64,
            "num_attention_heads": 4,
            "intermediate_size": 128,
            "max_position_embeddings": 64,
            "num_hidden_layers": 2,
            "embedding_size": 32,
            "attention_impl": "xla",
            "num_token_vocab": 100,
        },
    }

    def run(fused):
        cfg = Config.from_dict(
            {
                **raw,
                "training_params": {
                    **raw["training_params"], "fused_lm_head": fused,
                },
            }
        )
        trainer = Trainer(
            cfg, str(tmp_path / f"run_{fused}"), False, dataset=_corpus()
        )
        losses = []
        for i, batch in enumerate(trainer._train_batches(epoch=1)):
            trainer.state, m = trainer.train_step(
                trainer.state, trainer._put(batch), trainer.base_rng
            )
            losses.append((float(m["loss"]), float(m["token_loss"])))
            if i == 5:
                break
        return losses

    ref = run(False)
    fus = run(True)
    assert all(t > 0 for _, t in fus)  # grapheme head actually training
    np.testing.assert_allclose(
        np.asarray(fus), np.asarray(ref), rtol=5e-4, atol=1e-5
    )


def test_synthetic_derivable_corpus_is_learnable(tmp_path):
    """`training_dataset: synthetic-derivable:N` produces a closed word
    pool with crc32-derivable grapheme labels: the mapping is consistent
    (same word -> same token id, = crc32 % vocab), and a short
    multi-task run LEARNS it — token accuracy far above chance, unlike
    the plain synthetic corpus whose random ids pin token_loss at
    ln(vocab)."""
    import math
    import zlib

    from pl_bert_tpu.training.train import load_training_dataset

    T = 40
    # task sized to the 2-layer/h64 smoke model (measured round 5: the
    # default 64-word pool with 40-120-word samples plateaus at the
    # unigram entropy — too much content; this regime, matching the
    # torch accuracy-parity gate's, is mastered in ~300 steps):
    # 8 samples, 24-word pool, 6-14 words per sample
    spec = "synthetic-derivable:8:24:6-14"
    corpus = load_training_dataset(spec, "train", token_vocab=T)
    assert len(corpus) == 8
    seen: dict[str, int] = {}
    for rec in corpus:
        assert len(rec["phonemes"]) == len(rec["token_ids"])
        for w, t in zip(rec["phonemes"], rec["token_ids"]):
            assert t == zlib.crc32(w.encode()) % T
            assert seen.setdefault(w, t) == t
    # closed pool: the 24-word lexicon recurs across samples
    assert len(seen) <= 24

    raw = {
        "training_params": {
            "output_dir": str(tmp_path / "ckpt"),
            "batch_size": 8,
            "save_interval": 1000,
            "log_interval": 20,
            # 300 steps / constant LR / dropout 0 mirrors the passing
            # torch-parity accuracy gate
            # (test_reference_training_equivalence.py). 8 samples /
            # batch 8 = 1 step per epoch, so the reference-parity
            # default max_epochs=10 must be lifted out of the way.
            "num_steps": 300,
            "max_epochs": 100000,
            "learning_rate": 2e-3,
            "training_dataset": spec,
            "mixed_precision": "fp32",
        },
        "dataset_params": {"max_seq_length": 64, "word_separator": 30},
        "model_params": {
            "hidden_size": 64,
            "num_attention_heads": 4,
            "intermediate_size": 128,
            "max_position_embeddings": 64,
            "num_hidden_layers": 2,
            "embedding_size": 32,
            "attention_impl": "xla",
            "num_token_vocab": T,
            "dropout": 0.0,
        },
    }
    config = Config.from_dict(raw)
    trainer = Trainer(config, str(tmp_path / "run"), False)
    trainer.train()
    rows = [
        r for r in (
            json.loads(line)
            for line in open(str(tmp_path / "run") + "/metrics.jsonl")
        )
        if "token_loss" in r
    ]
    # trailing-window mean: instantaneous rows are noisy (few masked
    # positions per 8-sample batch; same rationale as the torch gate's
    # W=30 window)
    tail = float(np.mean([r["token_loss"] for r in rows[-3:]]))
    # grapheme head learned the crc32 mapping: loss well below the
    # ln(vocab) plateau random labels sit at
    assert tail < 0.6 * math.log(T), rows[-3:]
    assert tail < rows[0]["token_loss"] * 0.65, (rows[0], tail)


def test_lm_head_capacity_threads_to_step_and_preserves_loss(tmp_path):
    """config.training_params.lm_head_capacity reaches the jitted step
    (train.py -> make_train_step -> masked_lm_loss) and changes only the
    schedule of the 60k-head matmul, not its value: the first-step
    token_loss under the gather (capacity 16) matches the full-length
    path (capacity 0) to f32 rounding."""
    losses = {}
    for cap in (0, 16):
        raw = {
            "training_params": {
                "output_dir": str(tmp_path / f"ckpt{cap}"),
                "batch_size": 8,
                "save_interval": 100,
                "log_interval": 2,
                "num_steps": 2,
                "learning_rate": 1e-3,
                "training_dataset": "synthetic:48",
                "mixed_precision": "fp32",
                "lm_head_capacity": cap,
            },
            "dataset_params": {"max_seq_length": 64, "word_separator": 87},
            "model_params": {
                "hidden_size": 64,
                "num_attention_heads": 4,
                "intermediate_size": 128,
                "max_position_embeddings": 64,
                "num_hidden_layers": 2,
                "embedding_size": 32,
                "dropout": 0.0,
                "attention_impl": "xla",
                "num_token_vocab": 100,
            },
        }
        config = Config.from_dict(raw)
        trainer = Trainer(
            config, str(tmp_path / f"run{cap}"), False, dataset=_corpus()
        )
        batch = next(iter(trainer._train_batches(epoch=1)))
        _, m = trainer.train_step(
            trainer.state, trainer._put(batch), trainer.base_rng
        )
        losses[cap] = float(m["token_loss"])
        assert losses[cap] > 0
    assert abs(losses[0] - losses[16]) < 1e-5, losses


def test_lm_head_capacity_undersized_warning(tmp_path, capsys):
    """A capacity well under the expected masked-token count warns at
    Trainer construction (the lax.cond fallback keeps values exact, so
    an undersized capacity is a silent SLOWDOWN — surface it)."""
    def build(capacity, wpp):
        raw = {
            "training_params": {
                "output_dir": str(tmp_path / f"c{capacity}w{wpp}"),
                "batch_size": 8,
                "save_interval": 100,
                "log_interval": 2,
                "num_steps": 2,
                "learning_rate": 1e-3,
                "training_dataset": "synthetic:48",
                "mixed_precision": "fp32",
                "lm_head_capacity": capacity,
            },
            "dataset_params": {
                "max_seq_length": 64,
                "word_separator": 87,
                "word_pred_prob": wpp,
            },
            "model_params": {
                "hidden_size": 64,
                "num_attention_heads": 4,
                "intermediate_size": 128,
                "max_position_embeddings": 64,
                "num_hidden_layers": 2,
                "embedding_size": 32,
                "attention_impl": "xla",
                "num_token_vocab": 100,
            },
        }
        Trainer(
            Config.from_dict(raw),
            str(tmp_path / f"run{capacity}w{wpp}"),
            False,
            dataset=_corpus(),
        )
        return capsys.readouterr().out

    # 16 < 1.5 * 0.45 * 64 = 43.2 -> warns
    assert "lm_head_capacity (16)" in build(16, 0.45)
    # 16 >= 1.5 * 0.15 * 64 = 14.4 -> silent at the reference masking
    assert "WARNING: lm_head_capacity" not in build(16, 0.15)
