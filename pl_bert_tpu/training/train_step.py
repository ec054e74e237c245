"""Jitted SPMD train/eval steps.

Replaces the reference's per-batch flow (reference: train.py:338-390):
mask→forward→ragged loss loop→backward→AdamW step, with one fused XLA
computation per step — loss, grads, optimizer update and the
data-parallel gradient mean (an XLA all-reduce over the mesh's data
axis, the NCCL-equivalent; SURVEY §2.3) all inside a single jit.

The optimizer matches the reference: torch AdamW defaults
(betas 0.9/0.999, eps 1e-8, weight_decay 0.01 on all params including
LayerNorm/bias — the reference excludes nothing; reference train.py:272)
except the gradient-less pooler, which torch AdamW implicitly skips
(grad None) and we therefore mask from decay.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from pl_bert_tpu.config import TrainingParams
from pl_bert_tpu.ops.masked_ce import (
    masked_accuracy,
    masked_lm_loss,
    masked_lm_metrics,
    masked_phoneme_loss,
)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar


def _decay_mask(params) -> Any:
    """Exclude the (gradient-less) pooler from weight decay: torch AdamW
    skips params whose grad is None, so the reference's unused pooler
    keeps its init weights — decoupled decay on zero-grad params would
    instead shrink them to zero over 1M steps."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not any(
            getattr(k, "key", "") == "pooler" for k in path
        ),
        params,
    )


def make_lr_schedule(tp: TrainingParams):
    """Step → learning-rate schedule, or None for the reference's plain
    constant LR (reference: train.py:272 — constant 7e-5, no warmup).
    Driven by the optimizer's update count (one count per optimizer
    step, = the grad-accum super-step), so resume restores the schedule
    position with the opt state."""
    peak = tp.learning_rate
    warm = tp.warmup_steps
    if tp.lr_schedule == "constant" and warm == 0:
        return None
    decay_steps = max(tp.num_steps - warm, 1)
    if tp.lr_schedule == "cosine":
        main = optax.cosine_decay_schedule(
            peak, decay_steps, alpha=tp.lr_min_ratio
        )
    elif tp.lr_schedule == "linear":
        main = optax.linear_schedule(
            peak, peak * tp.lr_min_ratio, decay_steps
        )
    else:
        main = optax.constant_schedule(peak)
    if warm:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, peak, warm), main], [warm]
        )
    return main


def make_optimizer(tp: TrainingParams) -> optax.GradientTransformation:
    schedule = make_lr_schedule(tp)
    adamw = optax.adamw(
        learning_rate=tp.learning_rate if schedule is None else schedule,
        b1=tp.adam_b1,
        b2=tp.adam_b2,
        eps=tp.adam_eps,
        weight_decay=tp.weight_decay,
        mask=_decay_mask,
    )
    if tp.grad_clip_norm > 0:
        # clip BEFORE the moment updates, the standard transformer
        # recipe; grad_clip_norm 0 keeps the reference's unclipped
        # update bit-for-bit (no chain wrapper at all)
        return optax.chain(
            optax.clip_by_global_norm(tp.grad_clip_norm), adamw
        )
    return adamw


def _forward_loss(
    model, params, batch, rngs, deterministic, use_token_ids,
    compute_token_loss=True, fused_lm_head=False, lm_head_capacity=192,
):
    """``compute_token_loss=False`` (eval) skips the grapheme head: the
    model returns hidden unused, so XLA dead-code-eliminates the 60k
    projection — validation reports the phoneme loss only, as the
    reference's run_validation does (reference: train.py:288-304)."""
    attention_mask = (
        jnp.arange(batch["masked_ids"].shape[1])[None, :]
        < batch["lengths"][:, None]
    ).astype(jnp.int32)
    apply_kwargs = dict(
        segment_ids=batch.get("segment_ids"),
        position_ids=batch.get("position_ids"),
        deterministic=deterministic,
        rngs=rngs,
    )
    if use_token_ids:
        # the grapheme head's [B, L, 60k] logits never materialize:
        # the model returns hidden and the loss projects chunk-by-chunk
        # (masked_lm_loss_chunked) — required to fit batch 96 in HBM
        phoneme_logits, hidden = model.apply(
            {"params": params}, batch["masked_ids"], attention_mask,
            project_tokens=False, **apply_kwargs,
        )
        loss_p = masked_phoneme_loss(
            phoneme_logits, batch["label_ids"], batch["mask_positions"],
            batch["lengths"],
        )
        if not compute_token_loss:
            # eval: hidden rides along so make_eval_step can compute the
            # grapheme-head metrics without a second forward
            return loss_p, (phoneme_logits, loss_p, hidden)
        head = params["token_predictor"]
        loss_t = masked_lm_loss(
            hidden, head["kernel"], head["bias"], batch["token_ids"],
            batch["mask_positions"], batch["lengths"],
            capacity=lm_head_capacity, fused=fused_lm_head,
        )
        return loss_p + loss_t, (phoneme_logits, loss_p, loss_t)
    out = model.apply(
        {"params": params}, batch["masked_ids"], attention_mask,
        **apply_kwargs,
    )
    logits = out
    loss = masked_phoneme_loss(
        logits, batch["label_ids"], batch["mask_positions"], batch["lengths"]
    )
    return loss, (logits, loss, jnp.float32(0.0))


def _apply_ondevice_masking(batch: dict, rng: jax.Array, masking_params) -> dict:
    """Run the fused whole-word masking and assemble the forward batch —
    shared by the train and eval steps so their preprocessing can never
    diverge."""
    from pl_bert_tpu.ops.ondevice_masking import mask_batch

    masked_ids, mask_positions = mask_batch(
        batch["label_ids"], batch["word_ids"], batch["lengths"],
        rng, masking_params,
    )
    fwd = {
        "masked_ids": masked_ids,
        "label_ids": batch["label_ids"],
        "token_ids": batch.get("token_ids", batch["label_ids"]),
        "mask_positions": mask_positions,
        "lengths": batch["lengths"],
    }
    for key in ("segment_ids", "position_ids"):
        if key in batch:
            fwd[key] = batch[key]
    return fwd


def _samples_with_masks(batch: dict) -> jax.Array:
    """f32 count of samples carrying ≥1 valid masked position — the
    denominator of the reference loss semantics, via the SAME validity
    rule the losses use (ops/masked_ce.py::valid_positions; grad-accum
    weighting is exact only while the two agree)."""
    from pl_bert_tpu.ops.masked_ce import valid_positions

    valid = valid_positions(
        batch["mask_positions"], batch["lengths"],
        batch["mask_positions"].shape[1],
    )
    return ((valid.sum(axis=1) > 0).astype(jnp.float32)).sum()


def make_train_step(
    model,
    tx,
    use_token_ids: bool = False,
    donate: bool = True,
    masking_params=None,
    grad_accum: int = 1,
    lr_schedule=None,
    opt_shardings=None,
    fused_lm_head: bool = False,
    lm_head_capacity: int = 192,
):
    """Build the jitted (state, batch, rng) → (state, metrics) step.

    With ``masking_params`` set, the batch carries only packed arrays
    (label_ids, word_ids, lengths) and whole-word masking itself runs
    on device inside the step (ops/ondevice_masking.py) — the north-star
    fused collate.

    With ``grad_accum > 1``, batch arrays carry a leading micro-step
    axis ``[grad_accum, batch, ...]`` and the step lax.scans over it,
    accumulating gradients and applying ONE optimizer update — the
    activation memory of a single micro-batch at ``grad_accum`` times
    the effective batch. Each micro-batch's gradient is weighted by its
    samples-with-masks count, which makes the update numerically
    IDENTICAL to running the concatenated large batch through the
    reference loss (per-sample mean, then mean over samples with ≥1
    mask — an unweighted mean-of-means would instead dilute ragged
    final groups padded with empty micro-batches). Identity is modulo
    the dropout/masking RNG streams, which fold in the micro index;
    tests assert exact equality at dropout 0 (tests/test_grad_accum.py).

    ``opt_shardings`` (ZeRO-1, parallel/mesh.py::zero1_shardings) pins
    the updated optimizer state to data-axis-sharded layouts inside the
    jit, so XLA keeps the AdamW moments and their elementwise update
    partitioned instead of re-replicating them between steps."""

    def _constrain_opt(opt_state):
        if opt_shardings is None:
            return opt_state
        return jax.lax.with_sharding_constraint(opt_state, opt_shardings)

    def micro_grads(params, mb: dict, mrng: jax.Array):
        """(Σ per-sample-mean grads, Σ weighted losses, n_samples)."""
        if masking_params is not None:
            mask_rng, mrng = jax.random.split(mrng)
            mb = _apply_ondevice_masking(mb, mask_rng, masking_params)
        n = _samples_with_masks(mb)

        def loss_fn(params):
            loss, (_, loss_p, loss_t) = _forward_loss(
                model, params, mb, {"dropout": mrng}, False, use_token_ids,
                fused_lm_head=fused_lm_head,
                lm_head_capacity=lm_head_capacity,
            )
            # scale the per-micro mean by its sample count: the scan
            # accumulates sums-over-samples and normalizes once at the
            # end by the total count
            return loss * n, (loss_p * n, loss_t * n)

        (_, (sum_p, sum_t)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        return grads, sum_p, sum_t, n

    def accum_step_fn(state: TrainState, batch: dict, base_rng: jax.Array):
        rng = jax.random.fold_in(base_rng, state.step)

        def body(carry, xs):
            g_acc, p_acc, t_acc, n_acc = carry
            mb, idx = xs
            grads, sum_p, sum_t, n = micro_grads(
                state.params, mb, jax.random.fold_in(rng, idx)
            )
            return (
                jax.tree.map(jnp.add, g_acc, grads),
                p_acc + sum_p, t_acc + sum_t, n_acc + n,
            ), None

        zeros = jax.tree.map(jnp.zeros_like, state.params)
        init = (zeros, jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))
        (g_sum, p_sum, t_sum, n_sum), _ = jax.lax.scan(
            body, init, (batch, jnp.arange(grad_accum, dtype=jnp.int32))
        )
        denom = jnp.maximum(n_sum, 1.0)
        grads = jax.tree.map(lambda g: g / denom.astype(g.dtype), g_sum)
        loss_p = p_sum / denom
        loss_t = t_sum / denom
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        opt_state = _constrain_opt(opt_state)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss_p + loss_t,
            "phoneme_loss": loss_p,
            "token_loss": loss_t,
            "grad_norm": optax.global_norm(grads),
        }
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        return TrainState(params, opt_state, state.step + 1), metrics

    def step_fn(state: TrainState, batch: dict, base_rng: jax.Array):
        rng = jax.random.fold_in(base_rng, state.step)

        if masking_params is not None:
            mask_rng, rng = jax.random.split(rng)
            batch = _apply_ondevice_masking(batch, mask_rng, masking_params)

        def loss_fn(params):
            return _forward_loss(
                model, params, batch, {"dropout": rng}, False, use_token_ids,
                fused_lm_head=fused_lm_head,
                lm_head_capacity=lm_head_capacity,
            )

        (loss, (_, loss_p, loss_t)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        opt_state = _constrain_opt(opt_state)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "phoneme_loss": loss_p,
            "token_loss": loss_t,
            "grad_norm": optax.global_norm(grads),
        }
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        return TrainState(params, opt_state, state.step + 1), metrics

    fn = accum_step_fn if grad_accum > 1 else step_fn
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model, use_token_ids: bool = False, masking_params=None,
    token_metrics: bool | None = None,
):
    """Jitted eval step → (phoneme_loss, masked accuracy, n_masked) —
    plus (token_loss, token accuracy) in multi-task mode (the reference
    validates the phoneme head only, train.py:288-304; the grapheme
    head's metrics are additive here, via the same gather/chunked
    projection the training loss uses so the [B, L, 60k] logits never
    materialize). ``token_metrics`` defaults to ``use_token_ids``.
    With ``masking_params``, masking runs on device from the provided
    rng (pass a FIXED key so validation is deterministic across runs).

    ``n_masked`` is the batch's total masked-position count (after
    on-device masking, if enabled) so the caller can drop zero-mask
    batches from validation means: a tiny validation split can draw a
    batch where no word was selected for masking (p≈0.85^words), whose
    loss is vacuously 0.0 here — and NaN in the reference's torch CE
    (reference: train.py:288-304 np.mean's per-batch loss.item()s,
    which an all-ignored batch poisons)."""

    if token_metrics is None:
        token_metrics = use_token_ids

    def step_fn(params, batch: dict, rng: jax.Array):
        if masking_params is not None:
            batch = _apply_ondevice_masking(batch, rng, masking_params)
        _, (logits, loss_p, hidden) = _forward_loss(
            model, params, batch, None, True, use_token_ids,
            compute_token_loss=False,
        )
        acc = masked_accuracy(
            logits, batch["label_ids"], batch["mask_positions"], batch["lengths"]
        )
        n_masked = jnp.sum(batch["mask_positions"].astype(jnp.int32))
        if use_token_ids and token_metrics:
            head = params["token_predictor"]
            loss_t, acc_t = masked_lm_metrics(
                hidden, head["kernel"], head["bias"], batch["token_ids"],
                batch["mask_positions"], batch["lengths"],
            )
            return loss_p, acc, n_masked, loss_t, acc_t
        return loss_p, acc, n_masked

    return jax.jit(step_fn)


def batch_to_arrays(batch) -> dict:
    """Batch dataclass → dict of arrays (the jit-friendly pytree)."""
    return {
        "masked_ids": batch.masked_ids,
        "label_ids": batch.label_ids,
        "token_ids": batch.token_ids,
        "mask_positions": batch.mask_positions,
        "lengths": batch.lengths,
    }
