"""PhonemeEncoder inference API tests."""

import numpy as np
import optax
import pytest

from pl_bert_tpu.config import Config
from pl_bert_tpu.models.albert import build_model, init_params
from pl_bert_tpu.models.inference import PhonemeEncoder
from pl_bert_tpu.training.checkpoint import save_checkpoint

SMALL = {
    "model_params": {
        "hidden_size": 64,
        "num_attention_heads": 4,
        "intermediate_size": 128,
        "max_position_embeddings": 64,
        "num_hidden_layers": 2,
        "embedding_size": 32,
        "dropout": 0.0,
        "attention_impl": "xla",
    },
    "dataset_params": {"max_seq_length": 64},
}


def _make_checkpoint(tmp_path):
    config = Config.from_dict(SMALL)
    model = build_model(config.model_params, "fp32")
    params = init_params(model, 64, seed=5)
    opt_state = optax.adamw(1e-4).init(params)
    path = save_checkpoint(str(tmp_path / "run"), 10, params, opt_state)
    return path, config


def test_encoder_from_checkpoint(tmp_path):
    path, config = _make_checkpoint(tmp_path)
    enc = PhonemeEncoder.from_checkpoint(path, config, mixed_precision="fp32")
    hidden, lengths = enc(["ˈmaʕna θaːbit", "qalam"])
    assert hidden.shape == (2, 64, 64)
    assert lengths.tolist() == [13, 5]
    # deterministic
    hidden2, _ = enc(["ˈmaʕna θaːbit", "qalam"])
    np.testing.assert_array_equal(hidden, hidden2)
    # padding rows don't affect shorter sample's valid positions
    hidden3, _ = enc(["qalam"])
    np.testing.assert_allclose(hidden3[0, :5], hidden[1, :5], atol=1e-5)


def test_encoder_from_hf_export(tmp_path):
    pytest.importorskip("torch")
    from pl_bert_tpu.export.to_hf import export_checkpoint

    config = Config.from_dict(SMALL)
    model = build_model(config.model_params, "fp32")
    params = init_params(model, 64, seed=6)
    out = str(tmp_path / "hf")
    export_checkpoint(params, config.to_dict(), out)
    enc = PhonemeEncoder.from_hf_export(out, mixed_precision="fp32")
    hidden, lengths = enc(["bajt ʃams"])
    assert hidden.shape == (1, 64, 64)
    assert np.isfinite(hidden).all()


def test_fixed_batch_padding_matches_unpadded():
    """batch_size pins the compiled shape; padded rows must not change
    the real rows' hidden states, and outputs slice back to the input
    count."""
    import pytest as _pytest

    from pl_bert_tpu.config import ModelParams
    from pl_bert_tpu.models.albert import build_model, init_params
    from pl_bert_tpu.models.inference import PhonemeEncoder

    mp = ModelParams(
        hidden_size=32, num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32, num_hidden_layers=1, embedding_size=16,
        dropout=0.0, attention_impl="xla",
    )
    params = init_params(build_model(mp, "fp32"), 32, seed=0)["encoder"]
    strings = ["ab cd", "efg"]

    plain = PhonemeEncoder(params, mp, 32, mixed_precision="fp32")
    fixed = PhonemeEncoder(
        params, mp, 32, mixed_precision="fp32", batch_size=8
    )
    h_plain, l_plain = plain(strings)
    h_fixed, l_fixed = fixed(strings)
    assert h_fixed.shape == h_plain.shape == (2, 32, 32)
    assert list(l_fixed) == list(l_plain)
    np.testing.assert_allclose(h_fixed, h_plain, atol=1e-5)

    with _pytest.raises(ValueError, match="fixed batch_size"):
        fixed(["x"] * 9)


def test_encode_cli(tmp_path):
    """The serving CLI streams input lines through a fixed-batch
    encoder and writes hidden+lengths; rows must match the direct API."""
    from pl_bert_tpu.models.inference import main as encode_main

    path, config = _make_checkpoint(tmp_path)
    cfg_path = str(tmp_path / "cfg.yml")
    config.save(cfg_path)
    lines = ["ˈmaʕna θaːbit", "qalam", "bajt ʃams"]
    inp = tmp_path / "phonemes.txt"
    inp.write_text("\n".join(lines) + "\n\n", encoding="utf-8")
    out = tmp_path / "hidden.npz"
    encode_main([
        "--checkpoint", path, "--config_path", cfg_path,
        "--input", str(inp), "--output", str(out),
        "--batch_size", "2",  # 3 lines -> two chunks, last one padded
    ])
    data = np.load(out)
    assert data["hidden"].shape == (3, 64, 64)
    enc = PhonemeEncoder.from_checkpoint(path, config, mixed_precision="fp32")
    ref_hidden, ref_lengths = enc(lines)
    np.testing.assert_array_equal(data["lengths"], ref_lengths)
    # the CLI keeps the constructor's bf16 default while the reference
    # encoder here is fp32 — agreement to bf16 precision is the contract
    np.testing.assert_allclose(
        data["hidden"], ref_hidden, atol=2e-2, rtol=2e-2
    )


def test_encode_cli_rejects_empty_input(tmp_path):
    from pl_bert_tpu.models.inference import main as encode_main

    path, config = _make_checkpoint(tmp_path)
    cfg_path = str(tmp_path / "cfg.yml")
    config.save(cfg_path)
    inp = tmp_path / "empty.txt"
    inp.write_text("\n", encoding="utf-8")
    with pytest.raises(SystemExit):
        encode_main([
            "--checkpoint", path, "--config_path", cfg_path,
            "--input", str(inp), "--output", str(tmp_path / "o.npz"),
        ])


def test_seq_buckets_parity_and_shapes(tmp_path):
    """seq_buckets is latency shaping only: the chosen bucket covers the
    call's longest input and the valid-prefix hidden states match the
    full-length encoder's."""
    path, config = _make_checkpoint(tmp_path)
    full = PhonemeEncoder.from_checkpoint(path, config, mixed_precision="fp32")
    bucketed = PhonemeEncoder.from_checkpoint(
        path, config, mixed_precision="fp32", seq_buckets=(16, 32)
    )
    # max_seq_length (64) is appended as the final bucket automatically
    assert bucketed.seq_buckets == (16, 32, 64)

    short = ["qalam", "ˈmaʕna"]          # longest 6 -> bucket 16
    medium = ["ˈmaʕna θaːbit qalam jadiːd"]  # 26 chars -> bucket 32
    long = ["x" * 50]                     # 50 -> final bucket 64

    for strings, want_L in ((short, 16), (medium, 32), (long, 64)):
        hb, lb = bucketed(strings)
        hf, lf = full(strings)
        assert hb.shape[1] == want_L
        assert hf.shape[1] == 64
        np.testing.assert_array_equal(lb, lf)
        for i, ln in enumerate(lb):
            np.testing.assert_allclose(
                hb[i, :ln], hf[i, :ln], atol=1e-5,
                err_msg=f"bucket {want_L} row {i}",
            )


def test_seq_buckets_validation(tmp_path):
    path, config = _make_checkpoint(tmp_path)
    with pytest.raises(ValueError, match="seq_buckets"):
        PhonemeEncoder.from_checkpoint(
            path, config, mixed_precision="fp32", seq_buckets=(16, 128)
        )  # exceeds max_seq_length 64
    with pytest.raises(ValueError, match="unique"):
        PhonemeEncoder.from_checkpoint(
            path, config, mixed_precision="fp32", seq_buckets=(16, 16)
        )


def test_serving_cli_buckets_match_unbucketed(tmp_path, capsys):
    """--buckets keeps the CLI's [N, max_L, H] npz contract and the
    stored values."""
    from pl_bert_tpu.models import inference

    path, config = _make_checkpoint(tmp_path)
    cfg_path = str(tmp_path / "cfg.yml")
    config.save(cfg_path)
    inp = tmp_path / "in.txt"
    # mixed lengths ACROSS chunk boundaries (batch 4, 6 lines): the
    # bucketed path sorts by length internally and must restore input
    # order in the output npz
    inp.write_text(
        "qalam\n" + "x" * 50 + "\nˈmaʕna θaːbit\n"
        + "y" * 40 + "\nab\nˈmaʕna\n",
        encoding="utf-8",
    )

    def run(out_name, *extra):
        out = str(tmp_path / out_name)
        inference.main([
            "--checkpoint", path, "--config_path", cfg_path,
            "--input", str(inp), "--output", out,
            "--batch_size", "4", *extra,
        ])
        return np.load(out)

    plain = run("plain.npz")
    bucketed = run("bucketed.npz", "--buckets", "16,32")
    assert bucketed["hidden"].shape == plain["hidden"].shape
    np.testing.assert_array_equal(bucketed["lengths"], plain["lengths"])
    for i, ln in enumerate(plain["lengths"]):
        np.testing.assert_allclose(
            bucketed["hidden"][i, :ln], plain["hidden"][i, :ln], atol=1e-5
        )
