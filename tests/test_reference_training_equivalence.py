"""Training-step equivalence with the reference PyTorch stack.

The fidelity gate from SURVEY §7 step 4: identical weights (via the HF
export mapping), identical masked batch, then (a) the loss matches the
reference's per-sample loop loss, and (b) one AdamW step produces the
same parameters on both sides (torch AdamW vs optax.adamw, wd=0.01).
"""

import numpy as np
import pytest

from pl_bert_tpu.config import ModelParams, TrainingParams
from pl_bert_tpu.data.collate import collate_fixed
from pl_bert_tpu.data.masking import MaskingParams, WholeWordMasker
from pl_bert_tpu.models.albert import AlbertConfig, build_model, init_params
from pl_bert_tpu.training.train_step import (
    TrainState,
    batch_to_arrays,
    make_optimizer,
)

MP = ModelParams(
    hidden_size=96,
    num_attention_heads=4,
    intermediate_size=192,
    max_position_embeddings=64,
    num_hidden_layers=3,
    embedding_size=48,
    vocab_size=188,
    dropout=0.0,  # deterministic comparison
    attention_impl="xla",
)


def _batch(n=4, L=64):
    rng = np.random.default_rng(0)
    alphabet = list("ɑɐɒæbtkmnlsʃθð")
    masker = WholeWordMasker(MaskingParams(max_seq_length=L), seed=3)
    samples = []
    for i in range(n):
        words = [
            "".join(rng.choice(alphabet, size=int(rng.integers(2, 8))))
            for _ in range(int(rng.integers(6, 14)))
        ]
        samples.append(masker(words, epoch=0, index=i))
    return collate_fixed(samples, L)


def test_loss_and_one_step_match_torch():
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from transformers import AlbertConfig as HFConfig
    from transformers import AlbertModel as HFAlbert

    from pl_bert_tpu.export.to_hf import full_model_state_dict
    from pl_bert_tpu.ops.masked_ce import masked_phoneme_loss

    # --- my side: model + params -----------------------------------------
    model = build_model(MP, "fp32")
    params = init_params(model, 64, seed=9)
    tp = TrainingParams(learning_rate=1e-3, mixed_precision="fp32")
    tx = make_optimizer(tp)
    state = TrainState(params, tx.init(params), jnp.int32(0))

    batch = _batch()
    arrays = {k: jnp.asarray(v) for k, v in batch_to_arrays(batch).items()}

    # --- torch side: same weights through the export mapping -------------
    hf_cfg = HFConfig(
        vocab_size=188, embedding_size=48, hidden_size=96,
        num_attention_heads=4, intermediate_size=192,
        max_position_embeddings=64, num_hidden_layers=3,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )

    class TorchPhonemeOnly(torch.nn.Module):
        """Reference PhonemeOnlyModel shape (reference: model.py:19-29)."""

        def __init__(self):
            super().__init__()
            self.encoder = HFAlbert(hf_cfg)
            self.phoneme_predictor = torch.nn.Linear(96, 188)

        def forward(self, ids, attention_mask):
            out = self.encoder(ids, attention_mask=attention_mask)
            return self.phoneme_predictor(out.last_hidden_state)

    tmodel = TorchPhonemeOnly()
    missing, unexpected = tmodel.load_state_dict(
        full_model_state_dict(params), strict=False
    )
    assert not unexpected
    assert all("position_ids" in m for m in missing)
    tmodel.train()

    ids_t = torch.from_numpy(np.asarray(batch.masked_ids)).long()
    mask_np = np.asarray(batch.attention_mask).astype(np.int64)
    mask_t = torch.from_numpy(mask_np)

    # reference loss loop (train.py:107-131)
    criterion = torch.nn.CrossEntropyLoss()
    pred = tmodel(ids_t, mask_t)
    loss_terms = []
    for i in range(len(batch.lengths)):
        idx = np.nonzero(batch.mask_positions[i])[0]
        if len(idx) == 0:
            continue
        ln = int(batch.lengths[i])
        loss_terms.append(
            criterion(
                pred[i][:ln][idx], torch.from_numpy(batch.label_ids[i][:ln][idx]).long()
            )
        )
    assert loss_terms, "test batch must contain masked samples"
    t_loss = sum(loss_terms) / len(loss_terms)

    # my loss on the same logits-producing forward
    def loss_fn(p):
        logits = model.apply(
            {"params": p}, arrays["masked_ids"],
            (jnp.arange(64)[None, :] < arrays["lengths"][:, None]).astype(jnp.int32),
            deterministic=True,
        )
        return masked_phoneme_loss(
            logits, arrays["label_ids"], arrays["mask_positions"], arrays["lengths"]
        )

    j_loss, grads = jax.value_and_grad(loss_fn)(state.params)
    assert abs(float(j_loss) - float(t_loss)) < 2e-5, (float(j_loss), float(t_loss))

    # --- one AdamW step each, compare a few weight tensors ----------------
    topt = torch.optim.AdamW(tmodel.parameters(), lr=1e-3)  # torch defaults = ours
    topt.zero_grad()
    t_loss.backward()
    topt.step()

    import optax

    updates, _ = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    checks = [
        (
            new_params["phoneme_predictor"]["kernel"],
            tmodel.phoneme_predictor.weight.detach().numpy().T,
        ),
        (
            new_params["encoder"]["encoder"]["albert_layer"]["ffn"]["kernel"],
            tmodel.encoder.encoder.albert_layer_groups[0]
            .albert_layers[0].ffn.weight.detach().numpy().T,
        ),
        (
            new_params["encoder"]["embeddings"]["word_embeddings"]["embedding"],
            tmodel.encoder.embeddings.word_embeddings.weight.detach().numpy(),
        ),
    ]
    for mine, theirs in checks:
        np.testing.assert_allclose(np.asarray(mine), theirs, atol=5e-5, rtol=1e-3)


def test_100_step_convergence_matches_torch():
    """Multi-step convergence gate (SURVEY §7 stage 4, VERDICT r1 item 5):
    100 identical-batch steps on the torch reference stack (HF Albert +
    per-sample loss loop + torch AdamW, reference: train.py:338-390) and
    on this build must track each other step for step — compounding
    drift from LR/decay/op-order differences would show here long before
    it shows in a real run."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    import optax
    from transformers import AlbertConfig as HFConfig
    from transformers import AlbertModel as HFAlbert

    from pl_bert_tpu.export.to_hf import full_model_state_dict
    from pl_bert_tpu.ops.masked_ce import masked_phoneme_loss

    N_STEPS = 100
    L = 64
    mp = ModelParams(
        hidden_size=64, num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=L, num_hidden_layers=2, embedding_size=32,
        vocab_size=188, dropout=0.0, attention_impl="xla",
    )
    model = build_model(mp, "fp32")
    params = init_params(model, L, seed=4)
    tp = TrainingParams(learning_rate=7e-4, mixed_precision="fp32")
    tx = make_optimizer(tp)
    opt_state = tx.init(params)

    hf_cfg = HFConfig(
        vocab_size=188, embedding_size=32, hidden_size=64,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=L, num_hidden_layers=2,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )

    class TorchPhonemeOnly(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = HFAlbert(hf_cfg)
            self.phoneme_predictor = torch.nn.Linear(64, 188)

        def forward(self, ids, attention_mask):
            out = self.encoder(ids, attention_mask=attention_mask)
            return self.phoneme_predictor(out.last_hidden_state)

    tmodel = TorchPhonemeOnly()
    _, unexpected = tmodel.load_state_dict(
        full_model_state_dict(params), strict=False
    )
    assert not unexpected
    tmodel.train()
    topt = torch.optim.AdamW(tmodel.parameters(), lr=7e-4)
    criterion = torch.nn.CrossEntropyLoss()

    # fixed batch stream: fresh masking every step (epoch=step)
    rng = np.random.default_rng(5)
    alphabet = list("ɑɐɒæbtkmnlsʃθð")
    corpus = [
        [
            "".join(rng.choice(alphabet, size=int(rng.integers(2, 8))))
            for _ in range(int(rng.integers(6, 14)))
        ]
        for _ in range(8)
    ]
    masker = WholeWordMasker(MaskingParams(max_seq_length=L), seed=6)

    @jax.jit
    def step(params, opt_state, arrays):
        def loss_fn(p):
            logits = model.apply(
                {"params": p}, arrays["masked_ids"],
                (jnp.arange(L)[None, :] < arrays["lengths"][:, None]).astype(
                    jnp.int32
                ),
                deterministic=True,
            )
            return masked_phoneme_loss(
                logits, arrays["label_ids"], arrays["mask_positions"],
                arrays["lengths"],
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    j_losses, t_losses = [], []
    for s in range(N_STEPS):
        samples = [
            masker(corpus[i], epoch=s, index=i) for i in range(len(corpus))
        ]
        batch = collate_fixed(samples, L)
        arrays = {k: jnp.asarray(v) for k, v in batch_to_arrays(batch).items()}
        params, opt_state, j_loss = step(params, opt_state, arrays)
        j_losses.append(float(j_loss))

        ids_t = torch.from_numpy(np.asarray(batch.masked_ids)).long()
        mask_t = torch.from_numpy(
            np.asarray(batch.attention_mask).astype(np.int64)
        )
        pred = tmodel(ids_t, mask_t)
        loss_terms = []
        for i in range(len(batch.lengths)):
            idx = np.nonzero(batch.mask_positions[i])[0]
            if len(idx) == 0:
                continue
            ln = int(batch.lengths[i])
            loss_terms.append(
                criterion(
                    pred[i][:ln][idx],
                    torch.from_numpy(batch.label_ids[i][:ln][idx]).long(),
                )
            )
        t_loss = sum(loss_terms) / len(loss_terms)
        topt.zero_grad()
        t_loss.backward()
        topt.step()
        t_losses.append(float(t_loss))

    j_arr, t_arr = np.asarray(j_losses), np.asarray(t_losses)
    # training actually converged (not just two stacks agreeing on noise)
    assert j_arr[-1] < 0.5 * j_arr[0], (j_arr[0], j_arr[-1])
    # per-step trajectory overlap; fp32 op-order drift compounds with
    # steps, so the bound is much looser than the 1-step gate but still
    # catches any real semantic divergence (wrong decay mask, lr, loss
    # averaging), which shows up at 1e-1 scale within a few steps
    np.testing.assert_allclose(j_arr, t_arr, rtol=5e-3, atol=5e-4)

    # final weights still agree
    sd = full_model_state_dict(params)
    t_sd = tmodel.state_dict()
    for name in (
        "phoneme_predictor.weight",
        "encoder.embeddings.word_embeddings.weight",
        "encoder.encoder.albert_layer_groups.0.albert_layers.0.ffn.weight",
    ):
        np.testing.assert_allclose(
            sd[name].numpy(), t_sd[name].detach().numpy(),
            atol=3e-3, rtol=5e-2, err_msg=name,
        )


def test_multitask_accuracy_parity_with_torch():
    """Grapheme-head accuracy as a REAL learning signal (VERDICT r3
    next-round item 2): a synthetic corpus whose word token_ids are
    DERIVABLE from the phonemes (token_id = crc32 of the word's phoneme
    string, mod vocab) trains the multi-task stack (upstream semantics:
    reference model.py:5-18 — encoder + phoneme head + grapheme head)
    side by side on this build and the imported torch reference shape,
    on identical batches. Gate: BOTH heads learn (accuracy far above
    chance, token loss far below ln(vocab)) and the two stacks' losses
    and masked accuracies match step for step."""
    torch = pytest.importorskip("torch")
    import zlib

    import jax
    import jax.numpy as jnp
    import optax
    from transformers import AlbertConfig as HFConfig
    from transformers import AlbertModel as HFAlbert

    from pl_bert_tpu.export.to_hf import full_model_state_dict
    from pl_bert_tpu.ops.masked_ce import (
        masked_accuracy,
        masked_lm_loss,
        masked_phoneme_loss,
    )

    N_STEPS = 300
    L = 64
    T = 50  # token vocab; chance accuracy = 2%
    mp = ModelParams(
        hidden_size=64, num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=L, num_hidden_layers=2, embedding_size=32,
        vocab_size=188, num_token_vocab=T, dropout=0.0,
        attention_impl="xla",
    )
    model = build_model(mp, "fp32")
    params = init_params(model, L, seed=11)
    tp = TrainingParams(learning_rate=2e-3, mixed_precision="fp32")
    tx = make_optimizer(tp)
    opt_state = tx.init(params)

    hf_cfg = HFConfig(
        vocab_size=188, embedding_size=32, hidden_size=64,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=L, num_hidden_layers=2,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )

    class TorchMultiTask(torch.nn.Module):
        """Reference MultiTaskModel shape (reference: model.py:5-18)."""

        def __init__(self):
            super().__init__()
            self.encoder = HFAlbert(hf_cfg)
            self.phoneme_predictor = torch.nn.Linear(64, 188)
            self.token_predictor = torch.nn.Linear(64, T)

        def forward(self, ids, attention_mask):
            h = self.encoder(ids, attention_mask=attention_mask)
            h = h.last_hidden_state
            return self.token_predictor(h), self.phoneme_predictor(h)

    tmodel = TorchMultiTask()
    missing, unexpected = tmodel.load_state_dict(
        full_model_state_dict(params), strict=False
    )
    assert not unexpected
    assert all("position_ids" in m for m in missing)
    tmodel.train()
    topt = torch.optim.AdamW(tmodel.parameters(), lr=2e-3)
    criterion = torch.nn.CrossEntropyLoss()

    # corpus with phoneme-DERIVABLE word labels: a closed pool of words
    # so the mapping phonemes -> token id is learnable (and must be
    # inferred from context at masked positions)
    rng = np.random.default_rng(12)
    alphabet = list("ɑɐɒæbtkmnlsʃθð")
    pool = [
        "".join(rng.choice(alphabet, size=int(rng.integers(2, 7))))
        for _ in range(24)
    ]
    word_tid = {w: zlib.crc32(w.encode()) % T for w in pool}
    corpus = [
        [pool[int(j)] for j in rng.integers(0, len(pool),
                                            size=int(rng.integers(6, 14)))]
        for _ in range(8)
    ]
    masker = WholeWordMasker(MaskingParams(max_seq_length=L), seed=13)

    def make_batch(step):
        samples = [
            masker(words, epoch=step, index=i,
                   token_ids=[word_tid[w] for w in words])
            for i, words in enumerate(corpus)
        ]
        return collate_fixed(samples, L)

    @jax.jit
    def step(params, opt_state, arrays):
        def loss_fn(p):
            attention_mask = (
                jnp.arange(L)[None, :] < arrays["lengths"][:, None]
            ).astype(jnp.int32)
            phoneme_logits, hidden = model.apply(
                {"params": p}, arrays["masked_ids"], attention_mask,
                project_tokens=False, deterministic=True,
            )
            loss_p = masked_phoneme_loss(
                phoneme_logits, arrays["label_ids"],
                arrays["mask_positions"], arrays["lengths"],
            )
            head = p["token_predictor"]
            loss_t = masked_lm_loss(
                hidden, head["kernel"], head["bias"], arrays["token_ids"],
                arrays["mask_positions"], arrays["lengths"],
            )
            token_logits = hidden @ head["kernel"] + head["bias"]
            acc_p = masked_accuracy(
                phoneme_logits, arrays["label_ids"],
                arrays["mask_positions"], arrays["lengths"],
            )
            acc_t = masked_accuracy(
                token_logits, arrays["token_ids"],
                arrays["mask_positions"], arrays["lengths"],
            )
            return loss_p + loss_t, (loss_p, loss_t, acc_p, acc_t)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    def torch_metrics(batch):
        ids_t = torch.from_numpy(np.asarray(batch.masked_ids)).long()
        mask_t = torch.from_numpy(
            np.asarray(batch.attention_mask).astype(np.int64)
        )
        token_pred, phoneme_pred = tmodel(ids_t, mask_t)
        p_terms, t_terms = [], []
        p_hits = p_tot = t_hits = t_tot = 0
        for i in range(len(batch.lengths)):
            idx = np.nonzero(batch.mask_positions[i])[0]
            if len(idx) == 0:
                continue
            ln = int(batch.lengths[i])
            p_lab = torch.from_numpy(batch.label_ids[i][:ln][idx]).long()
            t_lab = torch.from_numpy(batch.token_ids[i][:ln][idx]).long()
            p_terms.append(criterion(phoneme_pred[i][:ln][idx], p_lab))
            t_terms.append(criterion(token_pred[i][:ln][idx], t_lab))
            p_hits += int(
                (phoneme_pred[i][:ln][idx].argmax(-1) == p_lab).sum()
            )
            t_hits += int((token_pred[i][:ln][idx].argmax(-1) == t_lab).sum())
            p_tot += len(idx)
            t_tot += len(idx)
        loss = sum(p_terms) / len(p_terms) + sum(t_terms) / len(t_terms)
        return loss, p_hits / p_tot, t_hits / t_tot

    j_losses, t_losses = [], []
    j_lt, j_ap, j_at = [], [], []
    t_ap, t_at = [], []
    for s in range(N_STEPS):
        batch = make_batch(s)
        arrays = {k: jnp.asarray(v) for k, v in batch_to_arrays(batch).items()}
        params, opt_state, j_loss, aux = step(params, opt_state, arrays)
        j_losses.append(float(j_loss))
        j_lt.append(float(aux[1]))
        j_ap.append(float(aux[2]))
        j_at.append(float(aux[3]))

        t_loss, t_acc_p, t_acc_t = torch_metrics(batch)
        topt.zero_grad()
        t_loss.backward()
        topt.step()
        t_losses.append(float(t_loss))
        t_ap.append(t_acc_p)
        t_at.append(t_acc_t)

    j_arr, t_arr = np.asarray(j_losses), np.asarray(t_losses)
    W = 30  # trailing window: single steps are noisy (few masked
    # positions per 8-sentence batch), windows are stable

    # both heads actually LEARNED: the token loss sits far below its
    # ln(T)=3.91 chance plateau (it was pinned AT ln(vocab) forever with
    # random labels — the round-3 gap this test closes), and both
    # accuracies are far above chance (0.5% / 2%)
    assert np.mean(j_lt[-W:]) < 2.2, np.mean(j_lt[-W:])
    assert np.mean(j_ap[-W:]) > 0.15, np.mean(j_ap[-W:])
    assert np.mean(j_at[-W:]) > 0.25, np.mean(j_at[-W:])

    # the stacks track each other. Early steps gate tightly (semantic
    # divergence — wrong loss averaging, decay mask, head wiring —
    # shows at 1e-1 scale within a few steps); the long horizon
    # compares trailing-window means since fp32 op-order drift
    # compounds chaotically over 300 steps at this LR
    np.testing.assert_allclose(j_arr[:50], t_arr[:50], rtol=1e-2, atol=1e-3)
    assert abs(np.mean(j_arr[-W:]) - np.mean(t_arr[-W:])) < 0.05 * np.mean(
        t_arr[-W:]
    ), (np.mean(j_arr[-W:]), np.mean(t_arr[-W:]))
    assert abs(np.mean(j_ap[-W:]) - np.mean(t_ap[-W:])) < 0.05, (
        np.mean(j_ap[-W:]), np.mean(t_ap[-W:]))
    assert abs(np.mean(j_at[-W:]) - np.mean(t_at[-W:])) < 0.05, (
        np.mean(j_at[-W:]), np.mean(t_at[-W:]))
