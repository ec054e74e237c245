"""Model tests: shapes, param count, HF AlbertModel numeric parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pl_bert_tpu.config import ModelParams
from pl_bert_tpu.models.albert import (
    AlbertConfig,
    MultiTaskModel,
    PhonemeOnlyModel,
    build_model,
    init_params,
    param_count,
)

SMALL = ModelParams(
    hidden_size=64,
    num_attention_heads=4,
    intermediate_size=128,
    max_position_embeddings=64,
    num_hidden_layers=3,
    embedding_size=32,
    vocab_size=188,
    dropout=0.1,
    attention_impl="xla",
)


def test_forward_shapes_and_dtype():
    model = build_model(SMALL, mixed_precision="fp32")
    params = init_params(model, max_seq_length=64)
    ids = jnp.zeros((2, 64), jnp.int32)
    mask = jnp.ones((2, 64), jnp.int32)
    logits = model.apply({"params": params}, ids, mask, deterministic=True)
    assert logits.shape == (2, 64, 188)
    assert logits.dtype == jnp.float32


def test_shared_layer_param_count():
    """ALBERT shares one layer's params across all depths — param count
    must not scale with num_hidden_layers."""
    p3 = init_params(build_model(SMALL, "fp32"), 64)
    p12 = init_params(
        build_model(
            ModelParams(**{**SMALL.__dict__, "num_hidden_layers": 12}), "fp32"
        ),
        64,
    )
    assert param_count(p3) == param_count(p12)


def test_full_size_param_count():
    """Full config ≈ HF albert layout: 188-vocab ALBERT-base ≈ 7.4M params
    + heads. Uses eval_shape — no compute."""
    model = build_model(ModelParams(), "fp32")
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 512), jnp.int32),
            jnp.ones((1, 512), jnp.int32),
            deterministic=True,
        )["params"]
    )
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))
    # 90,112 emb + 99,072 mapping + 5,513,984 shared layer + 590,592 pooler
    # + 144,572 phoneme head = 6,438,332
    assert n == 6_438_332, n


def test_padding_invariance():
    """With attention mask, pad positions must not change valid outputs."""
    model = build_model(SMALL, mixed_precision="fp32")
    params = init_params(model, 64)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 188, size=(1, 64)).astype(np.int32)
    mask = np.ones((1, 64), np.int32)
    mask[:, 40:] = 0
    out1 = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    ids2 = ids.copy()
    ids2[:, 40:] = rng.integers(1, 188, size=(1, 24))  # garbage in padding
    out2 = model.apply({"params": params}, jnp.asarray(ids2), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out1[:, :40]), np.asarray(out2[:, :40]), rtol=0, atol=1e-5
    )


def test_multitask_two_heads():
    cfg = AlbertConfig.from_params(SMALL)
    model = MultiTaskModel(cfg, num_phonemes=188, num_tokens=100)
    ids = jnp.zeros((1, 64), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, deterministic=True)["params"]
    ph, tok = model.apply({"params": params}, ids, deterministic=True)
    assert ph.shape == (1, 64, 188)
    assert tok.shape == (1, 64, 100)


@pytest.mark.parametrize(
    "shape",
    [
        # (hidden, heads, ffn, emb, layers, maxpos, vocab)
        (96, 4, 192, 48, 4, 64, 188),    # factorized (flagship-style)
        (128, 8, 256, 128, 2, 48, 188),  # emb == hidden (projection still present)
        (64, 2, 320, 32, 5, 96, 97),     # odd vocab, tall-FFN, many layers
    ],
)
def test_hf_numeric_parity(shape):
    """last_hidden_state parity with transformers.AlbertModel on identical
    weights/inputs (the BASELINE.json export gate), across head/width/
    factorization variations."""
    torch = pytest.importorskip("torch")
    from transformers import AlbertConfig as HFConfig
    from transformers import AlbertModel as HFAlbert

    from pl_bert_tpu.export.to_hf import hf_state_dict_to_flax_encoder
    from pl_bert_tpu.models.albert import AlbertModel as FlaxAlbert

    hidden, heads, ffn, emb, layers, maxpos, vocab = shape
    mp = ModelParams(
        hidden_size=hidden,
        num_attention_heads=heads,
        intermediate_size=ffn,
        max_position_embeddings=maxpos,
        num_hidden_layers=layers,
        embedding_size=emb,
        vocab_size=vocab,
        dropout=0.0,
        attention_impl="xla",
    )
    hf_cfg = HFConfig(
        vocab_size=vocab, embedding_size=emb, hidden_size=hidden,
        num_attention_heads=heads, intermediate_size=ffn,
        max_position_embeddings=maxpos, num_hidden_layers=layers,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf_model = HFAlbert(hf_cfg).eval()

    flax_model = FlaxAlbert(AlbertConfig.from_params(mp))
    encoder_params = hf_state_dict_to_flax_encoder(hf_model.state_dict())

    rng = np.random.default_rng(1)
    ids = rng.integers(0, vocab, size=(3, maxpos)).astype(np.int32)
    mask = np.ones((3, maxpos), np.int32)
    mask[1, maxpos - 14:] = 0  # one padded row

    with torch.no_grad():
        hf_out = hf_model(
            torch.from_numpy(ids).long(), attention_mask=torch.from_numpy(mask).long()
        ).last_hidden_state.numpy()

    flax_out, _ = flax_model.apply(
        {"params": encoder_params}, jnp.asarray(ids), jnp.asarray(mask),
        deterministic=True,
    )
    # fp32 envelope = BLAS reduction-order rounding only (measured
    # ceiling 2.4e-6 abs at flagship depth 12 — see
    # tools/measure_export_parity.py; fp64 semantic identity to 4e-15
    # is pinned in tests/test_export.py)
    np.testing.assert_allclose(np.asarray(flax_out), hf_out, rtol=1e-5, atol=5e-6)
