"""Inference API: phoneme strings → contextual embeddings.

The downstream consumption contract is ``AlbertModel(...).last_hidden_state``
fed to StyleTTS (reference: README.md:40-47). ``PhonemeEncoder`` wraps
that path natively: load from a training checkpoint (orbax ``step_N``)
or an exported HF directory, batch phoneme strings through the
CharacterIndexer, and return hidden states — one jitted forward, static
shapes, bf16 on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pl_bert_tpu.config import Config, ModelParams
from pl_bert_tpu.models.albert import AlbertConfig, AlbertModel, init_params
from pl_bert_tpu.text.symbols import encode


class PhonemeEncoder:
    def __init__(
        self,
        params: dict,
        model_params: ModelParams,
        max_seq_length: int = 512,
        mixed_precision: str = "bf16",
        batch_size: int | None = None,
        quantize: str | None = None,
        seq_buckets: tuple[int, ...] | None = None,
        device=None,
    ) -> None:
        """``batch_size``: pad every call's batch dimension to this fixed
        size so XLA compiles the forward ONCE — without it each distinct
        number of input strings triggers a fresh (~seconds) compile, the
        classic serving footgun under jit's static shapes.

        ``quantize="int8"``: run the dense projections on the int8 MXU
        path (2x the bf16 matmul rate on v5e for ~1% numeric error —
        ops/quant.py). Inference-only; checkpoints stay fp32 on disk.

        ``seq_buckets``: optional ascending sequence-length buckets
        (e.g. ``(64, 128, 256)``). Each call pads to the smallest
        bucket covering its longest input instead of the full
        ``max_seq_length``, cutting short-utterance serving latency
        roughly linearly while keeping the compile count bounded at
        ``len(buckets) + 1`` shapes. Valid-prefix hidden states are
        identical either way (padding is masked out of attention), so
        this is latency shaping, not a numerics change.

        ``device``: pin this encoder to one device (a ``jax.Device``).
        Params are committed there and every forward runs there — the
        replica-per-chip serving story (serving/pool.py): ALBERT-base
        needs no sharding to fit, so a multi-chip host serves fastest
        as independent replicas, one per chip, not one sharded model
        paying ICI hops per token."""
        import dataclasses

        dtype = jnp.bfloat16 if mixed_precision == "bf16" else jnp.float32
        self.cfg = AlbertConfig.from_params(model_params, dtype=dtype)
        if quantize is not None:
            self.cfg = dataclasses.replace(self.cfg, quantize=quantize)
        self.model = AlbertModel(self.cfg)
        self.device = device
        if device is not None:
            params = jax.device_put(params, device)
        self.params = params
        self.max_seq_length = max_seq_length
        self.batch_size = batch_size
        if seq_buckets is not None:
            buckets = sorted(int(b) for b in seq_buckets)
            if not buckets:
                raise ValueError("seq_buckets must not be empty (pass None "
                                 "for single full-length compilation)")
            if buckets != sorted(set(buckets)):
                raise ValueError(f"seq_buckets must be unique: {seq_buckets}")
            if buckets[0] < 1 or buckets[-1] > max_seq_length:
                raise ValueError(
                    f"seq_buckets must lie in [1, {max_seq_length}]: "
                    f"{seq_buckets}"
                )
            if buckets[-1] != max_seq_length:
                buckets.append(max_seq_length)
            seq_buckets = tuple(buckets)
        self.seq_buckets = seq_buckets
        self._forward = jax.jit(
            functools.partial(self.model.apply, deterministic=True)
        )

    def swap_params(self, new_params: dict) -> None:
        """Atomically adopt ``new_params`` (encoder sub-tree) for every
        forward AFTER this call — zero-downtime checkpoint rollout for
        serving. The new tree must match the current one exactly
        (structure, shapes, dtypes): the jitted forward is shape-keyed,
        so a matching tree swaps with NO recompile, and anything else is
        a different model that belongs in a new encoder.

        Thread-safe by construction: params are read once per forward
        and rebinding an attribute is atomic under the GIL, so in-flight
        forwards (including pipelined dispatches) finish on the old
        weights while later batches pick up the new ones."""
        old = jax.tree_util.tree_leaves_with_path(self.params)
        new = jax.tree_util.tree_leaves_with_path(new_params)
        if len(old) != len(new):
            raise ValueError(
                f"param tree mismatch: {len(old)} leaves now, "
                f"{len(new)} in the reload"
            )
        for (ko, lo), (kn, ln) in zip(old, new):
            if ko != kn or lo.shape != ln.shape or lo.dtype != ln.dtype:
                raise ValueError(
                    "param tree mismatch at "
                    f"{jax.tree_util.keystr(kn)}: have "
                    f"{jax.tree_util.keystr(ko)}{lo.shape}/{lo.dtype}, "
                    f"reload has {ln.shape}/{ln.dtype} — reloads must "
                    "keep the model shape"
                )
        if self.device is not None:
            new_params = jax.device_put(new_params, self.device)
        self.params = new_params

    def clone_to(self, device) -> "PhonemeEncoder":
        """A replica of this encoder pinned to ``device``: shares the
        model (and jit cache — executables key on input placement, so
        each device compiles its own) with params committed there.
        The replica-per-chip building block (serving/pool.py)."""
        c = object.__new__(PhonemeEncoder)
        c.cfg = self.cfg
        c.model = self.model
        c.device = device
        c.params = jax.device_put(self.params, device)
        c.max_seq_length = self.max_seq_length
        c.batch_size = self.batch_size
        c.seq_buckets = self.seq_buckets
        c._forward = self._forward
        return c

    # --- constructors ------------------------------------------------------
    @staticmethod
    def checkpoint_encoder_params(
        checkpoint_path: str, config: Config | str
    ) -> dict:
        """The encoder sub-tree of a training ``step_N`` checkpoint (or
        reference ``.pth``) — what :meth:`from_checkpoint` builds from
        and :meth:`swap_params` reloads.

        The restore template is built ABSTRACTLY (``jax.eval_shape``):
        it exists only to pin tree structure + shapes, and a concrete
        ``model.init`` here would compile and run a full device forward
        — tens of tunnel-seconds that, on the serving ``/reload`` path,
        starve live traffic for the duration (measured: the round-4
        ``servreload`` p95 blip was dominated by exactly that compile).
        Host-side restore + one ``device_put`` transfer instead."""
        from pl_bert_tpu.models.albert import build_model
        from pl_bert_tpu.training.checkpoint import load_params_only

        if isinstance(config, str):
            config = Config.load(config)
        model = build_model(config.model_params, "fp32")
        template = jax.eval_shape(
            lambda: init_params(model, config.dataset_params.max_seq_length)
        )
        params = load_params_only(checkpoint_path, template)["encoder"]
        # one transfer (no compile); uncommitted default-device placement
        # so the jitted forward never re-uploads params per call
        return jax.device_put(params)

    @classmethod
    def from_checkpoint(
        cls, checkpoint_path: str, config: Config | str, **kwargs
    ) -> "PhonemeEncoder":
        """Load from a training ``step_N`` checkpoint (full-model params;
        the encoder sub-tree is used)."""
        if isinstance(config, str):
            config = Config.load(config)
        return cls(
            cls.checkpoint_encoder_params(checkpoint_path, config),
            config.model_params,
            config.dataset_params.max_seq_length,
            **kwargs,
        )

    @classmethod
    def from_hf_export(cls, model_dir: str, **kwargs) -> "PhonemeEncoder":
        """Load from a directory written by pl_bert_tpu.export."""
        from pl_bert_tpu.export.to_hf import load_pl_bert_model

        encoder_params, config = load_pl_bert_model(model_dir)
        mp = ModelParams(
            **{
                k: v
                for k, v in config["model_params"].items()
                if k in ModelParams.__dataclass_fields__
            }
        )
        return cls(
            encoder_params, mp,
            config["dataset_params"]["max_seq_length"], **kwargs,
        )

    # --- inference ----------------------------------------------------------
    def encode_batch(
        self, phoneme_strings: list[str]
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Host side: phoneme strings → (ids [B, L], mask [B, L],
        lengths [B]) int32 arrays, cropped/padded to max_seq_length (or
        the smallest covering bucket when ``seq_buckets`` is set).
        With a fixed ``batch_size``, B is padded up to it (extra rows are
        empty; lengths stays len(phoneme_strings) long)."""
        n = len(phoneme_strings)
        b = n if self.batch_size is None else self.batch_size
        if n > b:
            raise ValueError(
                f"{n} strings exceed the encoder's fixed batch_size {b}"
            )
        rows = [encode(t)[: self.max_seq_length] for t in phoneme_strings]
        L = self.max_seq_length
        if self.seq_buckets is not None:
            needed = max((len(r) for r in rows), default=1)
            L = next(bk for bk in self.seq_buckets if bk >= needed)
        ids = np.zeros((b, L), np.int32)
        lengths = np.zeros(b, np.int32)
        for i, row in enumerate(rows):
            ids[i, : len(row)] = row
            lengths[i] = len(row)
        mask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.int32)
        return ids, mask, lengths[:n]

    def forward(self, ids, mask):
        """Device side: the jitted encoder forward → hidden states
        (device array, NOT fetched to host)."""
        ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        if self.device is not None:
            # committed inputs keep the whole computation (and result)
            # on this replica's pinned device
            ids = jax.device_put(ids, self.device)
            mask = jax.device_put(mask, self.device)
        hidden, _ = self._forward({"params": self.params}, ids, mask)
        return hidden

    def dispatch(self, phoneme_strings: list[str]):
        """Host encode + launch the device forward WITHOUT fetching the
        result: JAX dispatch is asynchronous, so this returns as soon as
        the computation is enqueued on the device. Pair with
        :meth:`fetch` — the split lets a serving loop overlap batch
        N+1's forward with batch N's device→host transfer
        (serving/batcher.py ``pipeline_depth``)."""
        ids, mask, lengths = self.encode_batch(phoneme_strings)
        return self.forward(ids, mask), lengths, len(phoneme_strings)

    @staticmethod
    def fetch(handle) -> tuple[np.ndarray, np.ndarray]:
        """Block until a :meth:`dispatch` handle's forward is done and
        return ``(hidden [B, L, H] fp32, lengths [B])`` on host."""
        hidden, lengths, n = handle
        return np.asarray(hidden, dtype=np.float32)[:n], lengths

    def __call__(self, phoneme_strings: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """→ (hidden_states [B, L, H] fp32, lengths [B]); B is the number
        of input strings regardless of any fixed batch padding. L is
        max_seq_length, or the call's chosen bucket under seq_buckets —
        row i's valid prefix is hidden[i, :lengths[i]] either way."""
        return self.fetch(self.dispatch(phoneme_strings))


def main(argv=None) -> None:
    """Serving CLI: phoneme strings → contextual embeddings on disk.

    The reference's downstream consumption is ``AlbertModel(...).
    last_hidden_state`` fed to StyleTTS per utterance (reference:
    README.md:40-47) — this is that path as a batch tool::

        python -m pl_bert_tpu.models.inference \\
            --checkpoint ckpt/run/step_1000 --config_path configs/config.yml \\
            --input phonemes.txt --output hidden.npz

    ``--input`` is one phoneme string per line (``-`` = stdin). The
    output ``.npz`` holds ``hidden`` [N, L, H] plus ``lengths`` [N]
    (row i's valid prefix is ``hidden[i, :lengths[i]]``). The forward
    compiles ONCE at ``--batch_size`` and streams the input through it.
    """
    import argparse

    parser = argparse.ArgumentParser(
        description="Encode phoneme strings to PL-BERT hidden states"
    )
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--checkpoint", help="orbax step_N training checkpoint")
    src.add_argument("--hf_dir", help="directory written by pl_bert_tpu.export")
    parser.add_argument("--config_path",
                        help="training config (required with --checkpoint)")
    parser.add_argument("--input", required=True,
                        help="phoneme strings, one per line ('-' = stdin)")
    parser.add_argument("--output", required=True, help="output .npz path")
    parser.add_argument("--batch_size", type=int, default=64,
                        help="fixed compile batch (streamed in chunks)")
    parser.add_argument("--dtype", choices=["float32", "float16"],
                        default="float32", help="stored hidden dtype")
    parser.add_argument("--int8", action="store_true",
                        help="dynamic int8 dense projections (ops/quant.py)")
    parser.add_argument("--buckets", default="",
                        help="comma-separated sequence-length buckets "
                        "(e.g. 64,128,256): each chunk runs at the "
                        "smallest covering length — lower latency on "
                        "short utterances, same hidden states")
    args = parser.parse_args(argv)

    kwargs: dict = {
        "batch_size": args.batch_size,
        "quantize": "int8" if args.int8 else None,
        "seq_buckets": (
            tuple(int(x) for x in args.buckets.split(",") if x)
            or None
        ),
    }
    if args.checkpoint:
        if not args.config_path:
            parser.error("--checkpoint requires --config_path")
        enc = PhonemeEncoder.from_checkpoint(
            args.checkpoint, args.config_path, **kwargs
        )
    else:
        enc = PhonemeEncoder.from_hf_export(args.hf_dir, **kwargs)

    import sys

    fh = sys.stdin if args.input == "-" else open(args.input, encoding="utf-8")
    with fh:
        # rstrip \r too: a CRLF-authored file would otherwise append a
        # silent UNKNOWN symbol to every utterance via encode()'s OOV map
        lines = [line.rstrip("\r\n") for line in fh if line.strip()]
    if not lines:
        parser.error("no non-empty input lines")

    out_dtype = np.float16 if args.dtype == "float16" else np.float32
    # with buckets on, group similar lengths into the same chunk (and
    # restore input order after): one long outlier otherwise drags every
    # short utterance in its chunk up to the big bucket
    order = (
        sorted(range(len(lines)), key=lambda i: len(lines[i]))
        if enc.seq_buckets is not None else range(len(lines))
    )
    ordered = [lines[i] for i in order]
    chunks, lens = [], []
    for lo in range(0, len(ordered), args.batch_size):
        hidden, lengths = enc(ordered[lo:lo + args.batch_size])
        if hidden.shape[1] < enc.max_seq_length:  # bucketed chunk:
            hidden = np.pad(  # keep the [N, max_L, H] output contract
                hidden,
                ((0, 0), (0, enc.max_seq_length - hidden.shape[1]), (0, 0)),
            )
        chunks.append(hidden.astype(out_dtype))
        lens.append(lengths)
    hidden_all = np.concatenate(chunks)
    lens_all = np.concatenate(lens).astype(np.int32)
    unsort = np.argsort(np.asarray(list(order)))
    np.savez(
        args.output,
        hidden=hidden_all[unsort],
        lengths=lens_all[unsort],
    )
    print(
        f"encoded {len(lines)} strings -> {args.output} "
        f"(hidden [{len(lines)}, {enc.max_seq_length}, "
        f"{enc.cfg.hidden_size}] {args.dtype})"
    )


if __name__ == "__main__":
    main()
