"""Load-test the online serving stack (DynamicBatcher [+ HTTP]).

The reference has no serving component (its export is consumed offline,
reference: README.md:36-119); this tool quantifies ours: C closed-loop
clients hammer the dynamic batcher with realistic mixed-length
utterances and we report achieved request throughput, client-observed
latency percentiles, and how well concurrent traffic coalesced into
fixed-shape TPU forwards (mean batch size).

Two transports:
- default: clients call ``DynamicBatcher.encode`` directly from
  threads — measures the serving engine (batching + device) without
  JSON costs;
- ``--http``: clients POST ``/encode`` against the real
  ``ThreadingHTTPServer`` — the full production path including
  (de)serialization of the [L, 768] hidden states.

Run on the TPU rig::

    python tools/bench_serving.py                  # engine, bucketed
    python tools/bench_serving.py --http           # full HTTP path
    python tools/bench_serving.py --no_buckets     # every call padded 512

Prints per-config JSON lines + one summary line. CPU runs exercise the
machinery but the latencies are not the serving numbers this is for.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# serving-realistic utterance mix: StyleTTS feeds one short utterance
# per request (reference: README.md:40-47) — mostly sentence-length,
# a tail of long paragraphs
LENGTH_MIX = (12, 30, 30, 60, 60, 60, 120, 120, 250, 500)


def _encoder(max_batch: int, seq_buckets, hidden_override=None):
    from pl_bert_tpu.config import ModelParams
    from pl_bert_tpu.models.albert import build_model, init_params
    from pl_bert_tpu.models.inference import PhonemeEncoder

    kwargs = dict(hidden_override or {})
    mp = ModelParams(**kwargs)  # default = flagship ALBERT-base shape
    model = build_model(mp, "fp32")
    params = init_params(model, mp.max_position_embeddings, seed=0)["encoder"]
    return PhonemeEncoder(
        params, mp, max_seq_length=mp.max_position_embeddings,
        mixed_precision="bf16", batch_size=max_batch,
        seq_buckets=seq_buckets,
    )


def _utterances(n: int, seed: int = 0) -> list[str]:
    rng = np.random.default_rng(seed)
    alphabet = list("ɑɐɒæbdfɡhijklmnopqrstuvwzʃʒ ")
    out = []
    for i in range(n):
        L = LENGTH_MIX[int(rng.integers(len(LENGTH_MIX)))]
        out.append("".join(rng.choice(alphabet, size=L)))
    return out


def _run_clients(
    n_clients: int, texts: list[str], call, track=None
) -> list[float]:
    """Closed-loop: each client thread pulls the next request off a
    shared cursor, so exactly len(texts) requests run with n_clients
    in flight. Returns per-request client-observed latencies (s).

    ``track`` (optional dict) additionally collects ``done_at`` (per-
    request completion perf_counter), ``errors`` (list of (index,
    repr)) — failures are recorded, not raised, so a reload blip can be
    QUANTIFIED — and ``completed`` (monotonic counter a watcher thread
    may poll)."""
    lat = [0.0] * len(texts)
    cursor = iter(range(len(texts)))
    lock = threading.Lock()
    if track is not None:
        track.setdefault("done_at", [0.0] * len(texts))
        track.setdefault("errors", [])
        track.setdefault("completed", 0)

    def client():
        while True:
            with lock:
                i = next(cursor, None)
            if i is None:
                return
            t0 = time.perf_counter()
            try:
                call(texts[i])
            except Exception as exc:  # noqa: BLE001 — quantified below
                if track is None:
                    raise
                with lock:
                    track["errors"].append((i, repr(exc)))
            lat[i] = time.perf_counter() - t0
            if track is not None:
                with lock:
                    track["done_at"][i] = time.perf_counter()
                    track["completed"] += 1

    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return lat


def _percentiles(lat: list[float]) -> dict:
    s = sorted(lat)
    pick = lambda q: 1e3 * s[min(len(s) - 1, int(q * len(s)))]
    return {
        "p50_ms": round(pick(0.50), 2),
        "p95_ms": round(pick(0.95), 2),
        "p99_ms": round(pick(0.99), 2),
        "max_ms": round(1e3 * s[-1], 2),
    }


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--requests", type=int, default=512)
    parser.add_argument("--concurrency", type=int, default=32)
    parser.add_argument("--max_batch", type=int, default=32)
    parser.add_argument("--max_wait_ms", type=float, default=5.0)
    parser.add_argument("--no_buckets", action="store_true",
                        help="pad every call to the full 512 instead of "
                             "the 64/128/256/512 bucket ladder")
    parser.add_argument("--http", action="store_true",
                        help="drive the real HTTP server instead of the "
                             "batcher API (adds JSON of the hidden states)")
    parser.add_argument("--encoding", choices=("json", "b64"),
                        default="json",
                        help="HTTP payload: json = round-3 float lists "
                             "(the pre-round-4 wire format), b64 = "
                             "base64-packed raw values")
    parser.add_argument("--dtype", choices=("float32", "float16"),
                        default="float32",
                        help="value dtype for --encoding b64")
    parser.add_argument("--tiny", action="store_true",
                        help="1-layer/32-hidden model — machinery smoke "
                             "run on CPU, not a measurement")
    parser.add_argument("--flat_batching", action="store_true",
                        help="disable bucket-aware batch formation (A/B "
                             "control: mixed-length batches pad to the "
                             "longest rider's bucket)")
    parser.add_argument("--pipeline_depth", type=int, default=1,
                        help=">1 overlaps the next batch's device forward "
                             "with the previous batch's fetch")
    parser.add_argument("--replicas", type=int, default=1,
                        help="engine path only: load-balance across N "
                             "device-pinned replicas (0 = all local "
                             "devices)")
    parser.add_argument("--reload_mid", action="store_true",
                        help="(--http only) fire POST /reload with fresh "
                             "weights once half the requests have "
                             "completed — VERDICT r4 item 6: zero failed "
                             "requests and a bounded latency blip under "
                             "a live checkpoint swap")
    args = parser.parse_args(argv)
    if args.reload_mid and not args.http:
        parser.error("--reload_mid requires --http (it drives POST /reload)")

    import jax

    from pl_bert_tpu.serving.batcher import DynamicBatcher
    from pl_bert_tpu.serving.server import make_server, serve_in_thread

    if jax.default_backend() not in ("tpu", "axon"):
        print(
            f"WARNING: backend is {jax.default_backend()!r}, not TPU — "
            "latencies below are not serving numbers",
            file=sys.stderr,
        )

    buckets = None if args.no_buckets else (64, 128, 256, 512)
    tiny = (
        {"hidden_size": 32, "num_attention_heads": 2,
         "intermediate_size": 64, "num_hidden_layers": 1,
         "embedding_size": 16, "max_position_embeddings": 512,
         "dropout": 0.0, "attention_impl": "xla"}
        if args.tiny else None
    )
    enc = _encoder(args.max_batch, buckets, tiny)
    # warm every bucket shape so no client eats a compile
    for bk in enc.seq_buckets or (enc.max_seq_length,):
        enc(["a" * bk])

    texts = _utterances(args.requests)
    total_phonemes = sum(len(t) for t in texts)

    if args.http:
        from pl_bert_tpu.serving.client import ServingClient

        server = make_server(
            enc, port=0, max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms,
            pipeline_depth=args.pipeline_depth,
        )
        if args.reload_mid:
            import tempfile

            from pl_bert_tpu.config import Config, DatasetParams, ModelParams
            from pl_bert_tpu.models.albert import build_model, init_params
            from pl_bert_tpu.models.inference import PhonemeEncoder
            from pl_bert_tpu.serving.server import attach_reload
            from pl_bert_tpu.training.checkpoint import save_checkpoint

            # a REAL on-disk step_N with shape-identical fresh weights,
            # written up front (untimed): the reload under test is the
            # exact production path — host orbax restore + one transfer
            # + swap (server.py /reload with checkpoint_encoder_params).
            # Weights are generated host-side (no device init) so setup
            # stays off the device too.
            mp = ModelParams(**(tiny or {}))
            cfg = Config(
                model_params=mp,
                dataset_params=DatasetParams(
                    max_seq_length=mp.max_position_embeddings
                ),
            )
            model = build_model(mp, "fp32")
            template = jax.eval_shape(
                lambda: init_params(model, mp.max_position_embeddings)
            )
            nrng = np.random.default_rng(7)
            fresh = jax.tree.map(
                lambda s: (nrng.standard_normal(s.shape) * 0.02).astype(
                    s.dtype
                ),
                template,
            )
            ckpt_dir = tempfile.mkdtemp(prefix="reload_bench_")
            reload_ckpt = save_checkpoint(ckpt_dir, 7, fresh, {})

            attach_reload(
                server,
                lambda p: PhonemeEncoder.checkpoint_encoder_params(p, cfg),
                root=ckpt_dir,
            )
        serve_in_thread(server)
        # one client, one persistent HTTP/1.1 connection per thread —
        # the production transport (client.py)
        client = ServingClient(
            f"http://127.0.0.1:{server.server_address[1]}", timeout_s=120
        )
        b64 = args.encoding == "b64"

        def call(text: str) -> None:
            client.encode(
                text,
                round_decimals=None if b64 else 3,
                encoding="b64" if b64 else None,
                dtype=args.dtype,
            )

        batcher = server.batcher
    elif args.replicas != 1:
        from pl_bert_tpu.serving.pool import ReplicaPool

        devices = jax.local_devices()
        n = len(devices) if args.replicas == 0 else args.replicas
        server = None
        batcher = ReplicaPool.from_encoder(
            enc, devices[:n], max_wait_ms=args.max_wait_ms,
            pipeline_depth=args.pipeline_depth,
        )
        for replica in batcher.encoders:  # warm every replica's shapes
            for bk in replica.seq_buckets or (replica.max_seq_length,):
                replica(["a" * bk])
    else:
        server = None
        batcher = DynamicBatcher(
            enc, args.max_batch, max_wait_ms=args.max_wait_ms,
            seq_buckets=None if args.flat_batching else enc.seq_buckets,
            pipeline_depth=args.pipeline_depth,
        )

    if not args.http:

        def call(text: str) -> None:
            batcher.encode(text, timeout=120)

    track: dict | None = {} if args.reload_mid else None
    reload_info: dict = {}

    def reload_watcher():
        """Fire the checkpoint swap once half the load has completed."""
        probe = texts[0]
        rc = ServingClient(
            f"http://127.0.0.1:{server.server_address[1]}", timeout_s=120
        )
        before, _ = rc.encode(probe)
        while track["completed"] < args.requests // 2:
            time.sleep(0.02)
        t0 = time.perf_counter()
        rc.reload(reload_ckpt)
        reload_info["fired_at"] = t0
        reload_info["reload_ms"] = round(
            (time.perf_counter() - t0) * 1e3, 1
        )
        after, _ = rc.encode(probe)
        # the swap really changed the live weights
        reload_info["weights_changed"] = bool(
            not np.allclose(before, after, atol=1e-4)
        )
        rc.close()

    try:
        watcher = None
        if args.reload_mid:
            watcher = threading.Thread(target=reload_watcher, daemon=True)
        t0 = time.perf_counter()
        if watcher:
            watcher.start()
        lat = _run_clients(args.concurrency, texts, call, track=track)
        wall = time.perf_counter() - t0
        if watcher:
            watcher.join(timeout=180)
        stats = batcher.stats()
    finally:
        if server is not None:
            server.shutdown()
        batcher.close()

    if args.reload_mid:
        fired = reload_info.get("fired_at", float("inf"))
        pre = [l for l, d in zip(lat, track["done_at"]) if d <= fired]
        post = [l for l, d in zip(lat, track["done_at"]) if d > fired]
        reload_info.update(
            failed_requests=len(track["errors"]),
            errors=track["errors"][:5],
            pre_reload=_percentiles(pre) if pre else None,
            post_reload=_percentiles(post) if post else None,
        )
        reload_info.pop("fired_at", None)

    out = {
        "metric": "serving_load" + ("_http" if args.http else "_engine"),
        **({"encoding": args.encoding, "dtype": args.dtype}
           if args.http else {}),
        "requests": args.requests,
        "concurrency": args.concurrency,
        "max_batch": args.max_batch,
        "max_wait_ms": args.max_wait_ms,
        "buckets": list(enc.seq_buckets) if enc.seq_buckets else None,
        "bucket_batching": getattr(
            batcher, "seq_buckets", enc.seq_buckets
        ) is not None,
        "pipeline_depth": args.pipeline_depth,
        "replicas": getattr(batcher, "replicas", 1),
        "requests_per_sec": round(args.requests / wall, 1),
        "phonemes_per_sec": round(total_phonemes / wall, 1),
        "mean_batch_size": stats["mean_batch_size"],
        "max_batch_seen": stats["max_batch_seen"],
        "client_latency": _percentiles(lat),
        "queue_latency_ms": stats.get("latency_ms"),
        "backend": jax.default_backend(),
    }
    if args.reload_mid:
        out["metric"] = "serving_reload_under_load"
        out["reload"] = reload_info
    print(json.dumps(out), flush=True)
    if args.reload_mid and (
        reload_info.get("failed_requests") != 0
        or not reload_info.get("weights_changed")
    ):
        sys.exit(1)


if __name__ == "__main__":
    main()
