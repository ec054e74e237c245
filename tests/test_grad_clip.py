"""Gradient clipping (training_params.grad_clip_norm).

The reference applies no gradient clipping (reference: train.py:272 —
bare torch AdamW); the TPU build adds optional global-norm clipping as
a config key. The contracts pinned here: the default (0) is EXACTLY the
reference's unclipped update — not even a chain wrapper, so existing
checkpointed opt-state trees stay loadable — and a positive threshold
rescales the update like optax.clip_by_global_norm, composing with
ZeRO-1's sharded opt-state layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pl_bert_tpu.config import Config, ConfigError
from pl_bert_tpu.training.train_step import _decay_mask, make_optimizer


def _tp(**kv):
    return Config.from_dict({"training_params": kv}).training_params


def _toy_params():
    rng = np.random.default_rng(0)
    return {
        "dense": {
            "kernel": jnp.asarray(rng.standard_normal((4, 8)), jnp.float32),
            "bias": jnp.zeros((8,), jnp.float32),
        },
    }


def _toy_grads(scale):
    params = _toy_params()
    grads = jax.tree.map(jnp.ones_like, params)
    norm = float(optax.global_norm(grads))
    return jax.tree.map(lambda g: g * (scale / norm), grads)


def test_default_is_plain_adamw_state_tree():
    params = _toy_params()
    tp = _tp()
    tx = make_optimizer(tp)
    ref = optax.adamw(
        learning_rate=tp.learning_rate, b1=tp.adam_b1, b2=tp.adam_b2,
        eps=tp.adam_eps, weight_decay=tp.weight_decay, mask=_decay_mask,
    )
    assert jax.tree_util.tree_structure(
        tx.init(params)
    ) == jax.tree_util.tree_structure(ref.init(params))


def test_clip_rescales_oversized_gradients():
    """Updates from grads at norm 4 under clip 1.0 must equal updates
    from the same direction pre-scaled to norm 1 under no clipping."""
    params = _toy_params()
    clipped_tx = make_optimizer(_tp(grad_clip_norm=1.0))
    plain_tx = make_optimizer(_tp())

    up_clipped, _ = clipped_tx.update(
        _toy_grads(4.0), clipped_tx.init(params), params
    )
    up_plain, _ = plain_tx.update(
        _toy_grads(1.0), plain_tx.init(params), params
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
        up_clipped, up_plain,
    )


def test_clip_is_identity_below_threshold():
    params = _toy_params()
    clipped_tx = make_optimizer(_tp(grad_clip_norm=1.0))
    plain_tx = make_optimizer(_tp())
    grads = _toy_grads(0.5)
    up_clipped, _ = clipped_tx.update(grads, clipped_tx.init(params), params)
    up_plain, _ = plain_tx.update(grads, plain_tx.init(params), params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=0, atol=0),
        up_clipped, up_plain,
    )


def test_negative_clip_rejected():
    with pytest.raises(ConfigError):
        _tp(grad_clip_norm=-1.0)


def test_zero1_shardings_cover_chained_opt_state():
    """zero1_shardings path-suffix matching must still shard the AdamW
    moments when they sit inside the clip chain's state tuple."""
    from pl_bert_tpu.parallel.mesh import DATA_AXIS, make_mesh, zero1_shardings

    mesh = make_mesh(-1, 1)
    if mesh.shape.get(DATA_AXIS, 1) < 2:
        pytest.skip("needs a multi-device data axis")
    params = {"encoder": {"dense": {"kernel": jnp.zeros((64, 32))}}}
    tx = make_optimizer(_tp(grad_clip_norm=1.0))
    shardings = zero1_shardings(mesh, jax.eval_shape(tx.init, params))

    def has_data_axis(sharding):
        for entry in sharding.spec:
            axes = (
                () if entry is None
                else (entry,) if isinstance(entry, str)
                else tuple(entry)
            )
            if DATA_AXIS in axes:
                return True
        return False

    data_sharded = [
        s for s in jax.tree_util.tree_leaves(shardings)
        if hasattr(s, "spec") and has_data_axis(s)
    ]
    # mu and nu for the kernel leaf at minimum
    assert len(data_sharded) >= 2


def test_trainer_clip_smoke_with_zero1(tmp_path):
    """End to end: clipping hard enough to engage changes the loss
    trajectory vs unclipped, composes with zero1, and the grad_norm
    metric keeps reporting the PRE-clip norm."""
    from pl_bert_tpu.training.train import Trainer, make_synthetic_corpus

    smoke = {
        "training_params": {
            "output_dir": str(tmp_path / "ckpt"),
            "batch_size": 8,
            "save_interval": 100,
            "log_interval": 1,
            "num_steps": 4,
            "learning_rate": 1e-2,
            "training_dataset": "synthetic:64",
            "mixed_precision": "fp32",
        },
        "dataset_params": {"max_seq_length": 64},
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
    }
    corpus = make_synthetic_corpus(64, seed=1)

    def run(tag, **overrides):
        import copy

        raw = copy.deepcopy(smoke)
        raw["training_params"].update(overrides)
        trainer = Trainer(
            Config.from_dict(raw), str(tmp_path / tag), False, dataset=corpus
        )
        losses, norms = [], []
        for i, batch in enumerate(trainer.train_data.batches(epoch=1)):
            trainer.state, m = trainer.train_step(
                trainer.state, trainer._put(batch), trainer.base_rng
            )
            losses.append(float(m["loss"]))
            norms.append(float(m["grad_norm"]))
            if i == 2:
                break
        return losses, norms

    plain_losses, plain_norms = run("plain")
    clip = plain_norms[0] / 10.0  # guaranteed to engage from step 1
    clip_losses, clip_norms = run("clip", grad_clip_norm=clip, zero1=True)

    assert all(np.isfinite(clip_losses))
    # step 1 is identical (same init, loss computed before the update);
    # the clipped update must diverge the trajectory from step 2 on
    assert clip_losses[0] == plain_losses[0]
    assert clip_losses[1:] != plain_losses[1:]
    # grad_norm reports the raw (pre-clip) norm: the step-1 norms match
    # even though the clipped run's update was rescaled ~10× (approx:
    # zero1 shards the reduction, which reorders the float sums)
    assert clip_norms[0] == pytest.approx(plain_norms[0], rel=1e-5)
    assert all(np.isfinite(n) and n > 0 for n in clip_norms)
