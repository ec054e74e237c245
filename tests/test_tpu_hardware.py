"""Hardware-only checks (skipped on CPU; run with JAX_PLATFORMS unset on
a machine with a real TPU attached).

These validate what interpret mode cannot: PRNG seed sensitivity inside
the Pallas kernels, pallas-vs-xla full-model agreement, and that the
fused training step turns a profit over the XLA path.
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    # this rig's tunnel backend self-reports as "axon", not "tpu"
    jax.default_backend() not in ("tpu", "axon"),
    reason="requires a real TPU",
)


def test_kernel_dropout_seed_sensitivity():
    import jax.numpy as jnp

    from pl_bert_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((2, 512, 4, 64)), jnp.bfloat16)
        for _ in range(3)
    )
    f = jax.jit(
        lambda s: flash_attention(
            q, k, v, out_dtype=jnp.bfloat16, dropout_rate=0.1, dropout_seed=s
        )
    )
    d1 = np.asarray(f(jnp.asarray([7], jnp.int32)))
    d2 = np.asarray(f(jnp.asarray([7], jnp.int32)))
    d3 = np.asarray(f(jnp.asarray([8], jnp.int32)))
    assert np.array_equal(d1, d2)
    assert not np.array_equal(d1, d3)


def test_full_model_pallas_matches_xla():
    import jax.numpy as jnp

    from pl_bert_tpu.config import ModelParams
    from pl_bert_tpu.models.albert import build_model, init_params

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 188, size=(8, 512)), jnp.int32)
    mask = np.ones((8, 512), np.int32)
    mask[2, 300:] = 0
    mask = jnp.asarray(mask)
    outs = {}
    for impl in ("xla", "pallas"):
        model = build_model(
            ModelParams(attention_impl=impl, dropout=0.1), "bf16"
        )
        params = init_params(model, 512, seed=0)
        out = jax.jit(
            lambda p, i, m: model.apply({"params": p}, i, m, deterministic=True)
        )(params, ids, mask)
        outs[impl] = np.asarray(out, np.float32)
    rel = np.abs(outs["xla"] - outs["pallas"]).max() / (
        np.abs(outs["xla"]).max() + 1e-9
    )
    assert rel < 0.05, rel  # bf16 noise only


def test_light_primal_dropout_streams_match_saving_forward():
    """Interpret mode stubs the on-chip PRNG, so the dropout-stream
    NUMBERING contract between the light primal kernels (grouped and
    fullwidth) and the saving forward is only testable here: with the
    same seed, the primal-only value must equal the value computed via
    value_and_grad (the saving kernel) exactly — any stream-index skew
    would change masks and break equality."""
    import jax.numpy as jnp

    from pl_bert_tpu.ops.attention_block import attention_block

    rng = np.random.default_rng(3)
    B, L, E, H = 2, 512, 768, 12
    x = jnp.asarray(rng.standard_normal((B, L, E)) * 0.3, jnp.bfloat16)
    ws = {
        n: jnp.asarray(rng.standard_normal((E, E)) * 0.03, jnp.float32)
        for n in "qkvo"
    }
    bs = {
        n: jnp.asarray(rng.standard_normal(E) * 0.01, jnp.float32)
        for n in "qkvo"
    }
    seed = jnp.asarray([11], jnp.int32)

    def call(xx):
        return attention_block(
            xx, ws["q"], bs["q"], ws["k"], bs["k"], ws["v"], bs["v"],
            ws["o"], bs["o"], H, out_dtype=jnp.float32,
            dropout_rate=0.1, dropout_seed=seed,
        )

    import os

    for fullwidth in ("1", "0"):
        os.environ["PLBERT_ATTN_FULLWIDTH"] = fullwidth
        primal = np.asarray(jax.jit(call)(x))
        via_fwd, _ = jax.jit(
            lambda xx: jax.value_and_grad(lambda a: jnp.sum(call(a)))(xx)
        )(x)
        expect = float(np.asarray(primal, np.float64).sum())
        got = float(via_fwd)
        assert abs(expect - got) <= abs(expect) * 1e-5, (
            fullwidth, expect, got,
        )
    os.environ.pop("PLBERT_ATTN_FULLWIDTH", None)


def test_serving_stack_on_chip():
    """The full online-serving stack against the real chip: flagship
    encoder, bucket-aware dynamic batching, pipelined dispatch — every
    coalesced/bucketed/pipelined result must equal a direct encoder
    call (exercises real async dispatch + device→host fetch, which CPU
    tests can only approximate)."""
    from pl_bert_tpu.config import ModelParams
    from pl_bert_tpu.models.albert import build_model, init_params
    from pl_bert_tpu.models.inference import PhonemeEncoder
    from pl_bert_tpu.serving.batcher import DynamicBatcher

    mp = ModelParams()  # flagship ALBERT-base shape
    params = init_params(build_model(mp, "fp32"), 512, seed=0)["encoder"]
    enc = PhonemeEncoder(
        params, mp, max_seq_length=512, mixed_precision="bf16",
        batch_size=8, seq_buckets=(64, 128, 256),
    )
    rng = np.random.default_rng(0)
    alphabet = list("ɑɐɒæbdfɡhijklmnopqrstuvwz ")
    texts = [
        "".join(rng.choice(alphabet, size=n))
        for n in (12, 30, 60, 110, 240, 30, 12, 500, 60, 29)
    ]
    direct = {}
    for t in texts:
        hidden, lengths = enc([t])
        direct[t] = hidden[0, : lengths[0]]

    with DynamicBatcher(
        enc, max_batch=8, max_wait_ms=30.0,
        seq_buckets=enc.seq_buckets, pipeline_depth=2,
    ) as b:
        futures = [b.submit(t) for t in texts]
        results = [f.result(timeout=300) for f in futures]
    for t, (hidden, length) in zip(texts, results):
        assert length == len(direct[t])
        np.testing.assert_allclose(hidden, direct[t], atol=1e-5)
    stats = b.stats()
    assert stats["errors"] == 0
    assert stats["batches"] < stats["requests"]  # real coalescing
