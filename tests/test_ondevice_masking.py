"""On-device masking transform tests (north-star fused collate)."""

import jax
import jax.numpy as jnp
import numpy as np

from pl_bert_tpu.data.masking import MaskingParams
from pl_bert_tpu.data.packed import PackedPhonemeDataset
from pl_bert_tpu.ops.ondevice_masking import mask_batch, pack_sample
from pl_bert_tpu.text.symbols import MASK_ID, SEPARATOR_ID, encode

WORDS = ["ˈmaʕna", "θaːbit", "kitaːb", "qalam", "bajt", "ʃams"]


def _packed_batch(n=4, words=WORDS, L=64):
    ds = PackedPhonemeDataset([{"phonemes": words}] * n, max_seq_length=L)
    return ds.batch(np.arange(n))


def test_pack_sample_layout():
    ids, wids, n = pack_sample(WORDS, 64)
    expected = encode(" ".join(WORDS) + " ")
    assert n == len(expected)
    assert (ids[:n] == expected).all()
    # separators carry word id -1
    assert (wids[ids == SEPARATOR_ID] == -1).all()
    assert wids[0] == 0 and wids[n - 2] == len(WORDS) - 1


def test_mask_batch_structure():
    b = _packed_batch()
    params = MaskingParams()
    masked, pos = mask_batch(
        jnp.asarray(b["label_ids"]), jnp.asarray(b["word_ids"]),
        jnp.asarray(b["lengths"]), jax.random.PRNGKey(0), params,
    )
    masked, pos = np.asarray(masked), np.asarray(pos)
    # untouched positions identical
    assert (masked[~pos] == b["label_ids"][~pos]).all()
    # separators and padding never masked
    assert not pos[b["word_ids"] < 0].any()
    # whole-word: within each word, all-or-none
    for i in range(len(b["lengths"])):
        for w in range(len(WORDS)):
            span = pos[i][b["word_ids"][i] == w]
            assert span.all() or not span.any()


def test_mask_batch_determinism():
    b = _packed_batch()
    params = MaskingParams()
    args = (
        jnp.asarray(b["label_ids"]), jnp.asarray(b["word_ids"]),
        jnp.asarray(b["lengths"]),
    )
    m1, p1 = mask_batch(*args, jax.random.PRNGKey(7), params)
    m2, p2 = mask_batch(*args, jax.random.PRNGKey(7), params)
    m3, p3 = mask_batch(*args, jax.random.PRNGKey(8), params)
    assert (np.asarray(m1) == np.asarray(m2)).all()
    assert not (np.asarray(p1) == np.asarray(p3)).all()


def test_mask_batch_distribution():
    """Selection/mask/replace rates match the host masker's distribution."""
    rng = np.random.default_rng(0)
    alphabet = list("ɑɐɒæbtkmnlsʃθð")
    corpora = [
        {
            "phonemes": [
                "".join(rng.choice(alphabet, size=int(rng.integers(2, 9))))
                for _ in range(25)
            ]
        }
        for _ in range(64)
    ]
    ds = PackedPhonemeDataset(corpora, max_seq_length=256)
    b = ds.batch(np.arange(64))
    params = MaskingParams()
    total_sel = total_mask = total_chars = 0
    for trial in range(10):
        masked, pos = mask_batch(
            jnp.asarray(b["label_ids"]), jnp.asarray(b["word_ids"]),
            jnp.asarray(b["lengths"]), jax.random.PRNGKey(trial), params,
        )
        masked, pos = np.asarray(masked), np.asarray(pos)
        valid = b["word_ids"] >= 0
        total_chars += valid.sum()
        total_sel += pos.sum()
        total_mask += ((masked == MASK_ID) & pos).sum()
    sel_rate = total_sel / total_chars  # ≈ 0.15 * 0.9
    mask_rate = total_mask / total_chars  # ≈ 0.15 * 0.8
    assert 0.115 < sel_rate < 0.155, sel_rate
    assert 0.10 < mask_rate < 0.14, mask_rate
    # replacements draw from the sample's own phonemes (all replaced ids
    # must exist in that sample's valid chars)
    repl = pos & (masked != MASK_ID)
    for i in np.nonzero(repl.any(axis=1))[0][:5]:
        own = set(b["label_ids"][i][valid[i]].tolist())
        assert set(masked[i][repl[i]].tolist()) <= own


def test_train_step_with_ondevice_masking():
    """Full jitted step with fused masking runs and learns."""
    from pl_bert_tpu.config import ModelParams, TrainingParams
    from pl_bert_tpu.models.albert import build_model, init_params
    from pl_bert_tpu.training.train_step import (
        TrainState,
        make_optimizer,
        make_train_step,
    )

    mp = ModelParams(
        hidden_size=64, num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, num_hidden_layers=2, embedding_size=32,
        attention_impl="xla",
    )
    tp = TrainingParams(learning_rate=1e-3, mixed_precision="fp32")
    model = build_model(mp, "fp32")
    params = init_params(model, 64)
    tx = make_optimizer(tp)
    state = TrainState(params, tx.init(params), jnp.int32(0))
    step = make_train_step(
        model, tx, donate=False, masking_params=MaskingParams(max_seq_length=64)
    )
    batch = _packed_batch(n=8, L=64)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8
