"""Flax ALBERT encoder + PL-BERT heads.

TPU-native reimplementation of the model stack the reference assembles
from HF PyTorch parts (reference: model.py:5-29, train.py:263-270):
a shared-layer ALBERT (cross-layer weight sharing, factorized
embedding vocab→embedding_size→hidden_size) with a masked-phoneme
prediction head and an optional grapheme (token) head.

Design notes (TPU-first):
- parameters live in fp32, compute dtype is configurable (bf16 default
  under mixed precision) — matmuls hit the MXU in bf16 with fp32 accum;
- the shared layer is one module applied ``num_hidden_layers`` times, so
  the weights exist once; layers unroll under jit (12 applications of
  the same params — XLA pipelines them) with optional remat;
- attention is pluggable: "xla" (einsum, lets XLA fuse) or "pallas"
  (fused flash-style kernel from pl_bert_tpu.ops);
- the parameter tree mirrors HF AlbertModel naming closely enough that
  export (pl_bert_tpu.export.to_hf) is a rename, not a reshape.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pl_bert_tpu.config import ModelParams


@dataclass(frozen=True)
class AlbertConfig:
    vocab_size: int = 188
    embedding_size: int = 128
    hidden_size: int = 768
    num_attention_heads: int = 12
    intermediate_size: int = 2048
    max_position_embeddings: int = 512
    num_hidden_layers: int = 12
    type_vocab_size: int = 2
    dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    hidden_act: str = "gelu_new"
    attention_impl: str = "auto"  # auto | xla | pallas
    dtype: Any = jnp.float32  # compute dtype (params stay fp32)
    remat: bool = False
    # device mesh for multi-chip runs: when set (size > 1), the Pallas
    # kernels are invoked through the shard_map wrappers in parallel/tp.py
    # (GSPMD cannot partition a pallas_call); None/size-1 = direct calls
    mesh: Any = None
    # inference-only: "int8" routes every nn.Dense matmul through the
    # dynamic int8 MXU path (ops/quant.py) — 2x bf16 MXU rate for ~1%
    # numeric error; the fused attention-block kernel stays bf16
    quantize: str | None = None
    # Megatron-style sequence parallelism over the model axis (see
    # config.ModelParams.sequence_parallel): reduce-scatter the attention
    # output over L, run the LN/dropout kernels on L/m shards, re-gather
    # into the TP FFN. Only changes WHERE activations live (shard_map
    # specs + collectives); the global-array math is identical
    sequence_parallel: bool = False

    @classmethod
    def from_params(
        cls, p: ModelParams, dtype=jnp.float32, remat: bool = False, mesh=None,
    ):
        return cls(
            mesh=mesh,
            vocab_size=p.vocab_size,
            embedding_size=p.embedding_size,
            hidden_size=p.hidden_size,
            num_attention_heads=p.num_attention_heads,
            intermediate_size=p.intermediate_size,
            max_position_embeddings=p.max_position_embeddings,
            num_hidden_layers=p.num_hidden_layers,
            dropout=p.dropout,
            layer_norm_eps=p.layer_norm_eps,
            initializer_range=p.initializer_range,
            hidden_act=p.hidden_act,
            attention_impl=p.attention_impl,
            sequence_parallel=p.sequence_parallel,
            dtype=dtype,
            remat=remat,
        )

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def tp_size(self) -> int:
        """Model-axis size (1 = no tensor parallelism)."""
        from pl_bert_tpu.parallel.mesh import MODEL_AXIS

        if self.mesh is None:
            return 1
        return int(self.mesh.shape.get(MODEL_AXIS, 1))

    @property
    def use_shard_map(self) -> bool:
        """Pallas kernels must go through shard_map on any multi-device
        mesh — GSPMD treats a pallas_call as an opaque (unpartitionable)
        custom call on both the data and the model axis."""
        return self.mesh is not None and int(self.mesh.size) > 1


def _dropout_rate_seed(module: nn.Module, cfg: AlbertConfig, deterministic: bool):
    """(rate, int32[1] seed) for in-kernel dropout; the Pallas kernels
    regenerate the mask from the seed in backward. ONE derivation for
    every site (attention and both LN residuals), so seed width/range
    and the determinism condition can never drift apart."""
    if deterministic or cfg.dropout <= 0.0:
        return 0.0, None
    return cfg.dropout, jax.random.randint(
        module.make_rng("dropout"), (1,), 0, jnp.iinfo(jnp.int32).max
    )


def _act(name: str):
    if name == "gelu_new":  # HF's tanh-approximated gelu
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name in ("gelu", "gelu_python"):
        # both are the EXACT erf gelu in HF's ACT2FN (gelu_python is its
        # pure-python spelling, NOT the tanh approximation)
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unsupported activation: {name}")


class _LNParams(nn.Module):
    """LayerNorm affine params only (same param paths as nn.LayerNorm) —
    used when the normalization math itself runs in the fused Pallas
    kernel (ops/fused_ln.py)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class _DenseParams(nn.Module):
    """Dense kernel/bias params WITHOUT the matmul (same param paths,
    shapes and init as nn.Dense) — used when the projection itself runs
    inside a fused Pallas kernel (ops/attention_block.py)."""

    in_features: int
    out_features: int
    init_range: float

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.normal(self.init_range),
            (self.in_features, self.out_features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_features,))
        return kernel, bias


def _resolve_impl(cfg: AlbertConfig, seq_len: int, batch: int = 0) -> str:
    """Pick the attention implementation for this call's shapes.

    "auto" prefers the fully-fused block kernel (QKV + attention +
    output projection, transpose-free), then the per-head flash kernel,
    then XLA einsum attention. Explicit values force a path (with a
    fallback to XLA off-TPU so CPU tests exercise model semantics).

    Under tensor parallelism the kernels run per model shard
    (parallel/tp.py), so the support checks use the LOCAL head count
    (and the kernel's VMEM budget the GLOBAL width — E·P weights stay
    resident); a head count that doesn't divide the model axis falls
    back to XLA einsum attention, which GSPMD partitions itself. A
    batch the shard_map wrappers cannot slice over the data axis
    (``batch % data_size != 0``, e.g. a small serving batch on a
    multi-device mesh) also falls back — GSPMD handles ragged batch
    partitions, shard_map cannot."""
    from pl_bert_tpu.ops.attention import fused_block_supported, pallas_supported

    impl = cfg.attention_impl
    if impl == "xla":
        return impl
    if cfg.use_shard_map and batch:
        from pl_bert_tpu.parallel.mesh import DATA_AXIS

        if batch % int(cfg.mesh.shape.get(DATA_AXIS, 1)):
            return "xla"
    m = cfg.tp_size
    if cfg.num_attention_heads % m:
        return "xla"
    local_heads = cfg.num_attention_heads // m
    E = cfg.num_attention_heads * cfg.head_dim
    if impl == "pallas_block":
        return impl if fused_block_supported(
            seq_len, local_heads, cfg.head_dim, global_width=E
        ) else "xla"
    if impl == "pallas":
        return impl if pallas_supported(seq_len, cfg.head_dim) else "xla"
    if fused_block_supported(seq_len, local_heads, cfg.head_dim, global_width=E):
        return "pallas_block"
    if pallas_supported(seq_len, cfg.head_dim):
        return "pallas"
    return "xla"


def _sp_active(cfg: AlbertConfig, L: int) -> bool:
    """Sequence parallelism applies: multi-device shard_map path with
    model_axis > 1. An indivisible sequence fails loudly — the config
    explicitly asked for SP, silently dropping it would hide a
    misconfiguration."""
    if not (cfg.sequence_parallel and cfg.use_shard_map):
        return False
    m = cfg.tp_size
    if m <= 1:
        return False
    if L % m:
        raise ValueError(
            f"model_params.sequence_parallel requires seq_len {L} "
            f"divisible by model_axis {m}"
        )
    return True


def _local_rows(cfg: AlbertConfig, B: int, L: int) -> int:
    """Rows the fused-LN kernel sees per device (shard_map slices the
    batch over the data axis — and the sequence over the model axis
    under sequence parallelism)."""
    if cfg.mesh is None:
        return B * L
    from pl_bert_tpu.parallel.mesh import DATA_AXIS

    rows = (B // int(cfg.mesh.shape.get(DATA_AXIS, 1))) * L
    if _sp_active(cfg, L):
        rows //= cfg.tp_size
    return rows


def _sp_constrain(cfg: AlbertConfig, x):
    """Under sequence parallelism, anchor a [B, L, E] activation to the
    (data, model-over-L) layout for paths whose sharding is expressed
    through GSPMD rather than shard_map (the XLA attention fallback and
    the unfused LN sites) — so SP is real on every path, not only the
    Pallas one, and GSPMD inserts the gather/scatter collectives
    around it."""
    if not _sp_active(cfg, x.shape[1]):
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pl_bert_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    # A batch smaller than the data axis (e.g. per-utterance serving)
    # can't be batch-sharded — keep it replicated over data and shard
    # the sequence only; SP's point is the L dimension anyway.
    data = DATA_AXIS if x.shape[0] % int(
        cfg.mesh.shape.get(DATA_AXIS, 1)
    ) == 0 else None
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(cfg.mesh, P(data, MODEL_AXIS, None))
    )


def _dispatch_dropout_add_ln(cfg, x, residual, scale, bias, seed, rate):
    """Fused dropout+add+LN: direct kernel single-device, shard_map on a
    multi-device mesh (sequence-sharded under sequence parallelism)."""
    from pl_bert_tpu.ops.fused_ln import dropout_add_layernorm

    if cfg.use_shard_map:
        from pl_bert_tpu.parallel.tp import tp_dropout_add_layernorm

        return tp_dropout_add_layernorm(
            cfg.mesh, x, residual, scale, bias, seed, rate,
            cfg.layer_norm_eps, sp=_sp_active(cfg, x.shape[1]),
        )
    return dropout_add_layernorm(
        x, residual, scale, bias, seed, rate, cfg.layer_norm_eps
    )


def _dense(cfg: AlbertConfig, features: int, name: str) -> nn.Dense:
    kwargs = {}
    if cfg.quantize is not None:
        if cfg.quantize != "int8":
            raise ValueError(
                f"unsupported quantize mode {cfg.quantize!r}; only 'int8'"
            )
        from pl_bert_tpu.ops.quant import int8_dot_general

        kwargs["dot_general"] = int8_dot_general
    return nn.Dense(
        features,
        dtype=cfg.dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.normal(cfg.initializer_range),
        name=name,
        **kwargs,
    )


class AlbertEmbeddings(nn.Module):
    """word + position + token-type embeddings at ``embedding_size``
    (factorized — projection to hidden_size happens in the encoder)."""

    cfg: AlbertConfig

    @nn.compact
    def __call__(
        self, input_ids, token_type_ids=None, position_ids=None,
        deterministic=True,
    ):
        cfg = self.cfg
        emb_init = nn.initializers.normal(cfg.initializer_range)
        word_emb = nn.Embed(
            cfg.vocab_size, cfg.embedding_size, embedding_init=emb_init,
            param_dtype=jnp.float32, name="word_embeddings",
        )(input_ids)
        positions = (
            position_ids
            if position_ids is not None
            else jnp.arange(input_ids.shape[-1])[None, :]
        )
        pos_emb = nn.Embed(
            cfg.max_position_embeddings, cfg.embedding_size,
            embedding_init=emb_init, param_dtype=jnp.float32,
            name="position_embeddings",
        )(positions)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        type_emb = nn.Embed(
            cfg.type_vocab_size, cfg.embedding_size, embedding_init=emb_init,
            param_dtype=jnp.float32, name="token_type_embeddings",
        )(token_type_ids)
        x = word_emb + pos_emb + type_emb
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
            param_dtype=jnp.float32, name="LayerNorm",
        )(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        return x.astype(cfg.dtype)


class AlbertSelfAttention(nn.Module):
    cfg: AlbertConfig

    def _dropout_seed(self, deterministic: bool):
        return _dropout_rate_seed(self, self.cfg, deterministic)

    @nn.compact
    def __call__(self, hidden, attention_bias, segment_ids=None, deterministic=True):
        cfg = self.cfg
        B, L, H = hidden.shape
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        impl = _resolve_impl(cfg, L, B)

        if impl == "pallas_block":
            # fully-fused path: QKV + attention + output projection run
            # inside one transpose-free kernel; the dense layers exist
            # only as parameters (same tree as the nn.Dense branches)
            from pl_bert_tpu.ops.attention_block import attention_block
            from pl_bert_tpu.ops.fused_ln import fused_supported

            wq, bq = _DenseParams(H, H, cfg.initializer_range, name="query")()
            wk, bk = _DenseParams(H, H, cfg.initializer_range, name="key")()
            wv, bv = _DenseParams(H, H, cfg.initializer_range, name="value")()
            wo, bo = _DenseParams(H, H, cfg.initializer_range, name="dense")()
            rate, seed = self._dropout_seed(deterministic)
            if cfg.use_shard_map:
                from pl_bert_tpu.parallel.tp import tp_attention_block

                out = tp_attention_block(
                    cfg.mesh, hidden, wq, bq, wk, bk, wv, bv, wo, bo, nh,
                    bias=attention_bias, segment_ids=segment_ids,
                    out_dtype=cfg.dtype, dropout_rate=rate, dropout_seed=seed,
                    sp=_sp_active(cfg, L),
                )
            else:
                out = attention_block(
                    hidden, wq, bq, wk, bk, wv, bv, wo, bo, nh,
                    bias=attention_bias, segment_ids=segment_ids,
                    out_dtype=cfg.dtype, dropout_rate=rate, dropout_seed=seed,
                )
            if fused_supported(_local_rows(cfg, B, L), H):
                scale, bias_p = _LNParams(H, name="LayerNorm")()
                rate, seed = self._dropout_seed(deterministic)
                return _dispatch_dropout_add_ln(
                    cfg, out, hidden, scale, bias_p, seed, rate
                )
            out = nn.Dropout(cfg.dropout)(out, deterministic=deterministic)
            return _sp_constrain(cfg, nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                param_dtype=jnp.float32, name="LayerNorm",
            )(hidden + out))

        q = _dense(cfg, H, "query")(hidden).reshape(B, L, nh, hd)
        k = _dense(cfg, H, "key")(hidden).reshape(B, L, nh, hd)
        v = _dense(cfg, H, "value")(hidden).reshape(B, L, nh, hd)

        if impl == "pallas":
            # HF-style attention-prob dropout, generated INSIDE the kernel
            # (the backward kernel regenerates the same mask from the seed)
            rate, seed = self._dropout_seed(deterministic)
            if cfg.use_shard_map:
                from pl_bert_tpu.parallel.tp import tp_flash_attention

                ctx = tp_flash_attention(
                    cfg.mesh, q, k, v, attention_bias, segment_ids,
                    out_dtype=cfg.dtype, dropout_rate=rate, dropout_seed=seed,
                )
            else:
                from pl_bert_tpu.ops.attention import fused_attention

                ctx = fused_attention(
                    q, k, v, attention_bias, segment_ids, dtype=cfg.dtype,
                    dropout_rate=rate, dropout_seed=seed,
                )
        else:
            # accumulate in fp32 for bf16/fp32 inputs, but do NOT truncate
            # an fp64 run (the fp64 semantic-identity gate vs HF,
            # tests/test_export.py) down to fp32 scores
            acc_t = jnp.promote_types(jnp.float32, q.dtype)
            scores = jnp.einsum(
                "blhd,bmhd->bhlm", q, k, preferred_element_type=acc_t
            )
            scores = scores / jnp.sqrt(jnp.asarray(hd, acc_t))
            if attention_bias is not None:
                scores = scores + attention_bias
            if segment_ids is not None:
                neq = (
                    segment_ids[:, None, :, None]
                    != segment_ids[:, None, None, :]
                )
                scores = jnp.where(
                    neq, -0.7 * jnp.finfo(jnp.float32).max, scores
                )
            probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
            probs = nn.Dropout(cfg.dropout)(probs, deterministic=deterministic)
            ctx = jnp.einsum("bhlm,bmhd->blhd", probs, v)

        out = _dense(cfg, H, "dense")(ctx.reshape(B, L, H))
        from pl_bert_tpu.ops.fused_ln import fused_supported

        if impl == "pallas" and fused_supported(_local_rows(cfg, B, L), H):
            scale, bias_p = _LNParams(H, name="LayerNorm")()
            rate, seed = self._dropout_seed(deterministic)
            out = _dispatch_dropout_add_ln(
                cfg, out, hidden, scale, bias_p, seed, rate
            )
        else:
            out = nn.Dropout(cfg.dropout)(out, deterministic=deterministic)
            out = _sp_constrain(cfg, nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                param_dtype=jnp.float32, name="LayerNorm",
            )(hidden + out))
        return out


class AlbertLayer(nn.Module):
    """One transformer block; instantiated ONCE and applied N times."""

    cfg: AlbertConfig

    @nn.compact
    def __call__(self, hidden, attention_bias, segment_ids=None, deterministic=True):
        cfg = self.cfg
        attn_out = AlbertSelfAttention(cfg, name="attention")(
            hidden, attention_bias, segment_ids, deterministic
        )
        ffn = _dense(cfg, cfg.intermediate_size, "ffn")(attn_out)
        ffn = _act(cfg.hidden_act)(ffn)
        ffn = _dense(cfg, cfg.hidden_size, "ffn_output")(ffn)

        from pl_bert_tpu.ops.fused_ln import fused_supported

        B, L, H = ffn.shape
        impl = _resolve_impl(cfg, L, B)
        if impl in ("pallas", "pallas_block") and fused_supported(
            _local_rows(cfg, B, L), H
        ):
            scale, bias_p = _LNParams(H, name="full_layer_layer_norm")()
            rate, seed = _dropout_rate_seed(self, cfg, deterministic)
            return _dispatch_dropout_add_ln(
                cfg, ffn, attn_out, scale, bias_p, seed, rate
            )
        ffn = nn.Dropout(cfg.dropout)(ffn, deterministic=deterministic)
        return _sp_constrain(cfg, nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
            param_dtype=jnp.float32, name="full_layer_layer_norm",
        )(ffn + attn_out))


class AlbertEncoder(nn.Module):
    cfg: AlbertConfig

    @nn.compact
    def __call__(
        self, embeddings, attention_bias, segment_ids=None, deterministic=True
    ):
        cfg = self.cfg
        hidden = _dense(cfg, cfg.hidden_size, "embedding_hidden_mapping_in")(
            embeddings
        )
        layer_cls = AlbertLayer
        if cfg.remat:
            layer_cls = nn.remat(AlbertLayer, static_argnums=(4,))
        shared = layer_cls(cfg, name="albert_layer")
        for _ in range(cfg.num_hidden_layers):
            hidden = shared(hidden, attention_bias, segment_ids, deterministic)
        return hidden


def attention_bias_from_mask(attention_mask):
    """[B, L] validity mask → additive [B, 1, 1, L] bias (0 / large-neg).

    Always fp32 (the kernels clamp against the fp32 _NEG): uses
    finfo.min like HF's extended attention mask so exported models are
    numerically identical under partial masks.
    """
    neg = jnp.finfo(jnp.float32).min
    bias = (1.0 - attention_mask.astype(jnp.float32)) * neg
    return bias[:, None, None, :]


class AlbertModel(nn.Module):
    """Encoder trunk; returns last_hidden_state (and pooler output to
    mirror HF AlbertModel's artifact surface for export)."""

    cfg: AlbertConfig

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        segment_ids=None,
        position_ids=None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        emb = AlbertEmbeddings(cfg, name="embeddings")(
            input_ids, token_type_ids, position_ids, deterministic
        )
        bias = (
            attention_bias_from_mask(attention_mask)
            if attention_mask is not None
            else None
        )
        hidden = AlbertEncoder(cfg, name="encoder")(
            emb, bias, segment_ids, deterministic
        )
        pooled = nn.tanh(
            _dense(cfg, cfg.hidden_size, "pooler")(hidden[:, 0])
        )
        return hidden, pooled


class PhonemeOnlyModel(nn.Module):
    """Encoder + phoneme MLM head (reference: model.py:19-29)."""

    cfg: AlbertConfig
    num_phonemes: int = 188

    @nn.compact
    def __call__(
        self, input_ids, attention_mask=None, segment_ids=None,
        position_ids=None, deterministic=True,
    ):
        hidden, _ = AlbertModel(self.cfg, name="encoder")(
            input_ids, attention_mask, segment_ids=segment_ids,
            position_ids=position_ids, deterministic=deterministic,
        )
        logits = _dense(self.cfg, self.num_phonemes, "phoneme_predictor")(hidden)
        return logits.astype(jnp.float32)


class MultiTaskModel(nn.Module):
    """Encoder + phoneme head + grapheme/token head (reference: model.py:5-18)."""

    cfg: AlbertConfig
    num_phonemes: int = 188
    num_tokens: int = 60_000

    @nn.compact
    def __call__(
        self, input_ids, attention_mask=None, segment_ids=None,
        position_ids=None, deterministic=True, project_tokens=True,
    ):
        """``project_tokens=False`` returns (phoneme_logits, hidden)
        instead of materializing the [B, L, num_tokens] grapheme logits —
        the training loss projects chunk-by-chunk instead
        (ops/masked_ce.py::masked_lm_loss_chunked), which is what makes
        the 60k-vocab multi-task head fit in 16 GB HBM at batch 96."""
        hidden, _ = AlbertModel(self.cfg, name="encoder")(
            input_ids, attention_mask, segment_ids=segment_ids,
            position_ids=position_ids, deterministic=deterministic,
        )
        phoneme = _dense(self.cfg, self.num_phonemes, "phoneme_predictor")(hidden)
        token = _dense(self.cfg, self.num_tokens, "token_predictor")
        if not project_tokens:
            return phoneme.astype(jnp.float32), hidden
        return phoneme.astype(jnp.float32), token(hidden).astype(jnp.float32)


def build_model(
    params: ModelParams, mixed_precision: str = "bf16", remat: bool = False,
    mesh=None,
):
    """Model factory mirroring the reference's initialize_model
    (reference: train.py:261-272): phoneme-only unless a token vocab is
    configured. ``mesh``: device mesh for multi-chip runs (routes the
    Pallas kernels through parallel/tp.py's shard_map wrappers)."""
    dtype = jnp.bfloat16 if mixed_precision in ("bf16", "fp16") else jnp.float32
    cfg = AlbertConfig.from_params(params, dtype=dtype, remat=remat, mesh=mesh)
    if params.num_token_vocab > 0:
        return MultiTaskModel(cfg, params.vocab_size, params.num_token_vocab)
    return PhonemeOnlyModel(cfg, params.vocab_size)


def init_params(model, max_seq_length: int, seed: int = 0):
    dummy = jnp.zeros((1, max_seq_length), jnp.int32)
    mask = jnp.ones((1, max_seq_length), jnp.int32)
    return model.init(
        {"params": jax.random.PRNGKey(seed)}, dummy, mask, deterministic=True
    )["params"]


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def config_dict(cfg: AlbertConfig) -> dict:
    if cfg.mesh is not None:  # a Mesh is not serializable state
        cfg = dataclasses.replace(cfg, mesh=None)
    d = dataclasses.asdict(cfg)
    d.pop("mesh", None)
    d["dtype"] = str(cfg.dtype.__name__ if hasattr(cfg.dtype, "__name__") else cfg.dtype)
    return d
