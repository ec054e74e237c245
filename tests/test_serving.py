"""Dynamic-batching serving layer: batcher semantics + HTTP round-trip.

The reference has no serving component; the contract pinned here is the
one the batcher must preserve: each request's hidden states are the
SAME whether it rode alone or coalesced into a full batch (padding is
masked out of attention), results route back to the right caller, and
errors never wedge the worker.
"""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from pl_bert_tpu.config import ModelParams
from pl_bert_tpu.models.albert import build_model, init_params
from pl_bert_tpu.models.inference import PhonemeEncoder
from pl_bert_tpu.serving.batcher import DynamicBatcher
from pl_bert_tpu.serving.server import make_server, serve_in_thread

TEXTS = ["qalam", "bajt ʃams", "ˈmaʕna θaːbit", "ab", "ʃ", "qalam bajt"]


@pytest.fixture(scope="module")
def encoder():
    mp = ModelParams(
        hidden_size=32, num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32, num_hidden_layers=1, embedding_size=16,
        dropout=0.0, attention_impl="xla",
    )
    params = init_params(build_model(mp, "fp32"), 32, seed=11)["encoder"]
    return PhonemeEncoder(
        params, mp, max_seq_length=32, mixed_precision="fp32", batch_size=4
    )


@pytest.fixture(scope="module")
def encoder_bucketed():
    mp = ModelParams(
        hidden_size=32, num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32, num_hidden_layers=1, embedding_size=16,
        dropout=0.0, attention_impl="xla",
    )
    params = init_params(build_model(mp, "fp32"), 32, seed=11)["encoder"]
    return PhonemeEncoder(
        params, mp, max_seq_length=32, mixed_precision="fp32",
        batch_size=4, seq_buckets=(8, 16, 32),
    )


# --- stub encode_fn for pure batching-logic tests ---------------------------


class _StubEncoder:
    """encode_fn whose output rows identify their input text, recording
    every batch it was called with."""

    def __init__(self, delay_s: float = 0.0, poison: str | None = None):
        self.calls: list[list[str]] = []
        self.delay_s = delay_s
        self.poison = poison

    def __call__(self, texts):
        self.calls.append(list(texts))
        if self.poison is not None and self.poison in texts:
            raise RuntimeError("poisoned batch")
        if self.delay_s:
            time.sleep(self.delay_s)
        n, L, H = len(texts), 16, 4
        hidden = np.zeros((n, L, H), np.float32)
        lengths = np.array([min(len(t), L) for t in texts], np.int32)
        for i, t in enumerate(texts):
            hidden[i, : lengths[i]] = float(sum(map(ord, t)))
        return hidden, lengths


def test_batcher_coalesces_and_routes():
    stub = _StubEncoder()
    with DynamicBatcher(stub, max_batch=8, max_wait_ms=200.0) as b:
        futures = [b.submit(t) for t in ["ab", "cde", "f", "ghij"]]
        results = [f.result(timeout=10) for f in futures]
    # all four coalesced into one call (200 ms co-rider window vs
    # microsecond submits)
    assert len(stub.calls) == 1 and sorted(stub.calls[0]) == sorted(
        ["ab", "cde", "f", "ghij"]
    )
    for text, (hidden, length) in zip(["ab", "cde", "f", "ghij"], results):
        assert length == len(text)
        assert hidden.shape == (len(text), 4)
        np.testing.assert_array_equal(hidden, float(sum(map(ord, text))))
    s = b.stats()
    assert s["requests"] == 4 and s["batches"] == 1
    assert s["mean_batch_size"] == 4.0 and s["pending"] == 0


def test_batcher_respects_max_batch():
    stub = _StubEncoder()
    with DynamicBatcher(stub, max_batch=3, max_wait_ms=100.0) as b:
        futures = [b.submit(f"t{i}") for i in range(7)]
        for f in futures:
            f.result(timeout=10)
    assert all(len(c) <= 3 for c in stub.calls)
    assert sum(len(c) for c in stub.calls) == 7
    assert b.stats()["max_batch_seen"] == 3


def test_batcher_zero_wait_serves_singles_promptly():
    stub = _StubEncoder()
    with DynamicBatcher(stub, max_batch=8, max_wait_ms=0.0) as b:
        t0 = time.monotonic()
        hidden, length = b.encode("abc", timeout=10)
        assert time.monotonic() - t0 < 5.0
    assert length == 3 and hidden.shape == (3, 4)


def test_batcher_error_propagates_and_worker_survives():
    stub = _StubEncoder(poison="bad")
    with DynamicBatcher(stub, max_batch=8, max_wait_ms=50.0) as b:
        f_bad = b.submit("bad")
        with pytest.raises(RuntimeError, match="poisoned"):
            f_bad.result(timeout=10)
        # the worker keeps serving after a failed batch
        hidden, length = b.encode("ok", timeout=10)
        assert length == 2
        assert b.stats()["errors"] >= 1


def test_batcher_latency_stats():
    """stats() reports submit→result latency percentiles once requests
    have completed, and the p50/p95/max ordering is sane."""
    stub = _StubEncoder(delay_s=0.01)
    with DynamicBatcher(stub, max_batch=4, max_wait_ms=0.0) as b:
        for i in range(8):
            b.encode(f"t{i}", timeout=10)
        s = b.stats()
    lat = s["latency_ms"]
    # every request waited at least the 10 ms stub delay
    assert lat["p50"] >= 10.0
    assert lat["p50"] <= lat["p95"] <= lat["max"]
    # no completed requests -> no latency block
    with DynamicBatcher(_StubEncoder(), max_batch=2, max_wait_ms=0.0) as b2:
        assert "latency_ms" not in b2.stats()


def test_batcher_rejects_after_close():
    stub = _StubEncoder()
    b = DynamicBatcher(stub, max_batch=2, max_wait_ms=0.0)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit("x")


# --- real-encoder parity -----------------------------------------------------


def test_batched_results_match_direct_encoder(encoder):
    """Coalesced serving returns bitwise the same valid-prefix hidden
    states as a direct per-utterance PhonemeEncoder call."""
    direct = {}
    for t in TEXTS:
        hidden, lengths = encoder([t])
        direct[t] = hidden[0, : lengths[0]]

    with DynamicBatcher(encoder, max_batch=4, max_wait_ms=50.0) as b:
        futures = [b.submit(t) for t in TEXTS]  # 6 requests > max_batch 4
        results = [f.result(timeout=60) for f in futures]

    for t, (hidden, length) in zip(TEXTS, results):
        assert length == len(direct[t])
        np.testing.assert_allclose(hidden, direct[t], atol=1e-5)
    assert b.stats()["batches"] >= 2  # 6 items through max_batch=4


# --- HTTP front-end ----------------------------------------------------------


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_roundtrip(encoder):
    server = make_server(encoder, port=0, max_wait_ms=20.0)
    serve_in_thread(server)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        # liveness reports the model shape
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["hidden_size"] == 32

        direct_h, direct_l = encoder(["qalam"])
        status, single = _post(base + "/encode", {"phonemes": "qalam"})
        assert status == 200 and single["length"] == int(direct_l[0])
        np.testing.assert_allclose(
            np.array(single["hidden"], np.float32),
            direct_h[0, : direct_l[0]], atol=1e-5,
        )

        # list input; concurrent list members batch together
        status, multi = _post(
            base + "/encode", {"phonemes": ["ab", "bajt ʃams"], "round": 4}
        )
        assert status == 200 and len(multi["results"]) == 2
        assert multi["results"][0]["length"] == 2
        assert multi["results"][1]["length"] == len("bajt ʃams")

        # malformed requests -> 400, not a wedged server
        assert _post(base + "/encode", {"phonemes": []})[0] == 400
        assert _post(base + "/encode", {"nope": 1})[0] == 400
        assert _post(base + "/elsewhere", {})[0] == 404

        with urllib.request.urlopen(base + "/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 3 and stats["errors"] == 0
    finally:
        server.shutdown()
        server.batcher.close()


def test_http_concurrent_requests_coalesce(encoder):
    """Requests arriving from separate client threads ride one batch."""
    server = make_server(encoder, port=0, max_wait_ms=150.0)
    serve_in_thread(server)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    results = {}

    def client(text):
        results[text] = _post(base + "/encode", {"phonemes": text})

    try:
        threads = [
            threading.Thread(target=client, args=(t,)) for t in TEXTS[:4]
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert all(results[t][0] == 200 for t in TEXTS[:4])
        stats = server.batcher.stats()
        # 4 concurrent requests inside a 150 ms window: strictly fewer
        # batches than requests proves cross-request coalescing
        assert stats["batches"] < stats["requests"]
    finally:
        server.shutdown()
        server.batcher.close()


def test_make_server_requires_fixed_batch(encoder):
    mp = ModelParams(
        hidden_size=32, num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32, num_hidden_layers=1, embedding_size=16,
        dropout=0.0, attention_impl="xla",
    )
    params = init_params(build_model(mp, "fp32"), 32, seed=3)["encoder"]
    enc = PhonemeEncoder(params, mp, 32, mixed_precision="fp32")
    with pytest.raises(ValueError, match="fixed batch_size"):
        make_server(enc)
    with pytest.raises(ValueError, match="exceeds"):
        make_server(encoder, max_batch=99)


def test_bench_serving_tool_contract(capsys):
    """tools/bench_serving.py emits the load-test JSON contract (tiny
    model, CPU smoke — the real numbers come from the TPU run)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    import bench_serving

    bench_serving.main(
        ["--tiny", "--requests", "24", "--concurrency", "6",
         "--max_batch", "6", "--max_wait_ms", "2"]
    )
    line = capsys.readouterr().out.strip().splitlines()[-1]
    record = json.loads(line)
    assert record["metric"] == "serving_load_engine"
    assert record["requests"] == 24
    assert record["requests_per_sec"] > 0
    assert record["mean_batch_size"] >= 1.0
    assert record["max_batch_seen"] <= 6
    lat = record["client_latency"]
    assert lat["p50_ms"] <= lat["p95_ms"] <= lat["max_ms"]


# --- bucket-aware batch formation + backpressure -----------------------------


def test_bucket_aware_batching_groups_by_bucket():
    """With seq_buckets set, no batch mixes buckets: a 3-char request
    never rides (and pays the padded compute of) a 40-char one."""
    stub = _StubEncoder()
    with DynamicBatcher(
        stub, max_batch=8, max_wait_ms=60.0, seq_buckets=(8, 16, 64)
    ) as b:
        texts = ["aa", "b" * 40, "cc", "d" * 40, "ee", "ff"]
        futures = [b.submit(t) for t in texts]
        for f in futures:
            f.result(timeout=10)
    bucket = lambda t: 0 if len(t) <= 8 else (1 if len(t) <= 16 else 2)
    for call in stub.calls:
        assert len({bucket(t) for t in call}) == 1, stub.calls
    # the four short ones coalesced together, the two long ones together
    assert sorted(map(len, stub.calls)) == [2, 4]


def test_bucket_batching_preserves_fifo_no_starvation():
    """The oldest pending request always defines the next batch, so a
    minority bucket is served ahead of a flood of later arrivals."""
    stub = _StubEncoder(delay_s=0.02)
    with DynamicBatcher(
        stub, max_batch=4, max_wait_ms=0.0, seq_buckets=(8, 64)
    ) as b:
        first = b.submit("z" * 40)        # lone long request, oldest
        later = [b.submit("aa") for _ in range(8)]  # short flood behind it
        first.result(timeout=10)
        for f in later:
            f.result(timeout=10)
    assert "z" * 40 in stub.calls[0]  # served first, not starved


def test_bucketed_batcher_matches_direct_encoder(encoder_bucketed):
    """Value parity holds under bucket-aware formation too."""
    direct = {}
    for t in TEXTS:
        hidden, lengths = encoder_bucketed([t])
        direct[t] = hidden[0, : lengths[0]]
    with DynamicBatcher(
        encoder_bucketed, max_batch=4, max_wait_ms=50.0,
        seq_buckets=encoder_bucketed.seq_buckets,
    ) as b:
        futures = [b.submit(t) for t in TEXTS]
        results = [f.result(timeout=60) for f in futures]
    for t, (hidden, length) in zip(TEXTS, results):
        assert length == len(direct[t])
        np.testing.assert_allclose(hidden, direct[t], atol=1e-5)


def test_backpressure_rejects_at_capacity():
    from pl_bert_tpu.serving.batcher import QueueFull

    stub = _StubEncoder(delay_s=0.2)  # slow worker so the queue backs up
    with DynamicBatcher(
        stub, max_batch=1, max_wait_ms=0.0, max_pending=2
    ) as b:
        futures = [b.submit("keep")]  # worker picks this up
        time.sleep(0.05)              # let it enter the slow encode
        futures += [b.submit("q1"), b.submit("q2")]  # fills max_pending
        with pytest.raises(QueueFull, match="max_pending=2"):
            b.submit("overflow")
        for f in futures:  # queued work still completes after rejection
            f.result(timeout=10)
    s = b.stats()
    assert s["rejected"] == 1
    assert s["requests"] == 3  # the rejected one never counted


def test_http_503_on_overload(encoder):
    server = make_server(
        encoder, port=0, max_wait_ms=0.0, max_pending=1
    )
    # swap in a slow encode so requests pile up behind the worker
    real = server.batcher._encode_fn
    server.batcher._encode_fn = lambda texts: (time.sleep(0.3), real(texts))[1]
    serve_in_thread(server)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        codes = {}

        def client(i):
            codes[i] = _post(base + "/encode", {"phonemes": f"t{i}"})[0]

        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(6)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert 503 in codes.values()  # overload surfaced, not queued
        assert 200 in codes.values()  # while admitted work completed
        assert server.batcher.stats()["rejected"] >= 1
    finally:
        server.shutdown()
        server.batcher.close()


def test_batcher_concurrency_stress():
    """200 submits from 16 threads with jittered arrivals and a jittered
    worker: every future resolves to ITS OWN text's encoding, batches
    never mix buckets, and the counters reconcile exactly."""
    import random

    class _JitterStub(_StubEncoder):
        def __call__(self, texts):
            time.sleep(random.Random(len(texts)).uniform(0, 0.004))
            return super().__call__(texts)

    stub = _JitterStub()
    buckets = (4, 8, 16)
    rng = random.Random(7)
    texts = [
        "abcdefghijklmnop"[: rng.randint(1, 16)] + str(i % 7)
        for i in range(200)
    ]
    results = {}
    with DynamicBatcher(
        stub, max_batch=8, max_wait_ms=2.0, seq_buckets=buckets
    ) as b:
        def client(chunk):
            local_rng = random.Random(id(chunk) % 1000)
            for t in chunk:
                time.sleep(local_rng.uniform(0, 0.002))
                results[t] = b.encode(t, timeout=30)

        # unique texts so the result map is unambiguous
        unique = list(dict.fromkeys(texts))
        chunks = [unique[i::16] for i in range(16)]
        threads = [threading.Thread(target=client, args=(c,)) for c in chunks]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        stats = b.stats()

    # every request came back with its own payload
    for t, (hidden, length) in results.items():
        assert length == min(len(t), 16)
        np.testing.assert_array_equal(hidden, float(sum(map(ord, t))))
    # no batch ever mixed buckets
    bucket = lambda t: next(
        (i for i, bk in enumerate(buckets) if bk >= len(t)), len(buckets) - 1
    )
    for call in stub.calls:
        assert len({bucket(t) for t in call}) == 1
        assert len(call) <= 8
    # counters reconcile: all submits were batched exactly once
    assert stats["requests"] == len(results)
    assert sum(len(c) for c in stub.calls) == len(results)
    assert stats["rejected"] == 0 and stats["errors"] == 0


# --- Python client + /metrics ------------------------------------------------


def test_client_roundtrip_and_metrics(encoder):
    from pl_bert_tpu.serving.client import ServingClient

    server = make_server(encoder, port=0, max_wait_ms=20.0)
    serve_in_thread(server)
    client = ServingClient(
        f"http://127.0.0.1:{server.server_address[1]}", timeout_s=60.0
    )
    try:
        assert client.healthz()["hidden_size"] == 32

        direct_h, direct_l = encoder(["qalam"])
        hidden, length = client.encode("qalam")
        assert length == int(direct_l[0])
        np.testing.assert_allclose(
            hidden, direct_h[0, : direct_l[0]], atol=1e-5
        )

        results = client.encode(["ab", "bajt ʃams"], round_decimals=4)
        assert [r[1] for r in results] == [2, len("bajt ʃams")]
        assert results[0][0].shape == (2, 32)

        stats = client.stats()
        assert stats["requests"] >= 3

        # Prometheus exposition: counters present and consistent
        import urllib.request

        with urllib.request.urlopen(
            client.base_url + "/metrics", timeout=10
        ) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert f"plbert_requests_total {stats['requests']}" in text
        assert "# TYPE plbert_requests_total counter" in text
        assert "plbert_rejected_total 0" in text
        assert 'plbert_request_latency_ms{quantile="0.5"}' in text
    finally:
        server.shutdown()
        server.batcher.close()


def test_client_error_mapping(encoder):
    from pl_bert_tpu.serving.client import (
        ServerOverloaded,
        ServingClient,
        ServingError,
    )

    server = make_server(encoder, port=0, max_wait_ms=0.0, max_pending=1)
    real = server.batcher._encode_fn
    server.batcher._encode_fn = lambda texts: (time.sleep(0.3), real(texts))[1]
    serve_in_thread(server)
    client = ServingClient(f"http://127.0.0.1:{server.server_address[1]}")
    try:
        with pytest.raises(ServingError, match="non-empty"):
            client.encode([])

        # flood from threads until the bounded queue pushes back
        overloaded = []

        def hammer(i):
            try:
                client.encode(f"t{i}")
            except ServerOverloaded as e:
                overloaded.append(e)

        threads = [
            threading.Thread(target=hammer, args=(i,)) for i in range(6)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert overloaded and overloaded[0].retry_after_s >= 1.0
        assert overloaded[0].status == 503
    finally:
        server.shutdown()
        server.batcher.close()


# --- pipelined dispatch/fetch ------------------------------------------------


class _SplitStub(_StubEncoder):
    """Stub with dispatch/fetch phases: dispatch is instant (device
    enqueue), fetch sleeps (device compute + transfer). Timestamps let
    tests PROVE dispatch N+1 overlapped fetch N."""

    def __init__(self, fetch_delay_s: float = 0.05, fetch_poison=None):
        super().__init__()
        self.fetch_delay_s = fetch_delay_s
        self.fetch_poison = fetch_poison
        self.dispatch_times: list[tuple[float, list[str]]] = []
        self.fetch_done_times: list[tuple[float, list[str]]] = []

    def dispatch(self, texts):
        self.dispatch_times.append((time.monotonic(), list(texts)))
        return list(texts)

    def fetch(self, handle):
        time.sleep(self.fetch_delay_s)
        if self.fetch_poison is not None and self.fetch_poison in handle:
            raise RuntimeError("fetch failed")
        out = super().__call__(handle)
        self.fetch_done_times.append((time.monotonic(), list(handle)))
        return out


def test_pipeline_overlaps_dispatch_with_fetch():
    stub = _SplitStub(fetch_delay_s=0.08)
    with DynamicBatcher(
        stub, max_batch=1, max_wait_ms=0.0, pipeline_depth=2
    ) as b:
        futures = [b.submit(f"t{i}") for i in range(4)]
        results = [f.result(timeout=10) for f in futures]
    for i, (hidden, length) in enumerate(results):
        np.testing.assert_array_equal(
            hidden, float(sum(map(ord, f"t{i}")))
        )
    # batch 1 was dispatched before batch 0's fetch completed — the
    # overlap a serial loop cannot produce (its dispatch 1 would wait
    # out fetch 0's 80 ms sleep first)
    assert stub.dispatch_times[1][0] < stub.fetch_done_times[0][0]
    assert b.stats()["batches"] == 4 and b.stats()["errors"] == 0


def test_pipeline_matches_direct_encoder(encoder):
    direct = {}
    for t in TEXTS:
        hidden, lengths = encoder([t])
        direct[t] = hidden[0, : lengths[0]]
    with DynamicBatcher(
        encoder, max_batch=4, max_wait_ms=20.0, pipeline_depth=3
    ) as b:
        futures = [b.submit(t) for t in TEXTS]
        results = [f.result(timeout=60) for f in futures]
    for t, (hidden, length) in zip(TEXTS, results):
        assert length == len(direct[t])
        np.testing.assert_allclose(hidden, direct[t], atol=1e-5)


def test_pipeline_fetch_error_routes_to_callers():
    stub = _SplitStub(fetch_delay_s=0.0, fetch_poison="bad")
    with DynamicBatcher(
        stub, max_batch=8, max_wait_ms=5.0, pipeline_depth=2
    ) as b:
        f_bad = b.submit("bad")
        with pytest.raises(RuntimeError, match="fetch failed"):
            f_bad.result(timeout=10)
        hidden, length = b.encode("ok", timeout=10)  # worker survives
        assert length == 2
    assert b.stats()["errors"] >= 1


def test_pipeline_close_drains_inflight():
    stub = _SplitStub(fetch_delay_s=0.05)
    b = DynamicBatcher(
        stub, max_batch=1, max_wait_ms=0.0, pipeline_depth=3
    )
    futures = [b.submit(f"t{i}") for i in range(5)]
    b.close()  # several batches still in flight at this point
    for i, f in enumerate(futures):
        hidden, _ = f.result(timeout=1)  # already resolved by close()
        np.testing.assert_array_equal(
            hidden, float(sum(map(ord, f"t{i}")))
        )


def test_pipeline_requires_split_encoder():
    with pytest.raises(ValueError, match="dispatch/fetch"):
        DynamicBatcher(_StubEncoder(), max_batch=2, pipeline_depth=2)


# --- CLI process behavior ----------------------------------------------------


def test_server_cli_sigterm_drains(tmp_path):
    """The serving CLI must drain gracefully on SIGTERM (what an
    orchestrator sends): admitted requests finish, the process prints
    the drain marker and exits 0. Spawns the real CLI (slow: one cold
    interpreter + checkpoint load)."""
    import os
    import signal
    import subprocess
    import sys

    from pl_bert_tpu.config import Config
    from pl_bert_tpu.models.albert import build_model, init_params
    from pl_bert_tpu.training.checkpoint import save_checkpoint
    from pl_bert_tpu.training.train_step import TrainState, make_optimizer

    raw = {
        "training_params": {"output_dir": str(tmp_path), "batch_size": 4},
        "dataset_params": {"max_seq_length": 32},
        "model_params": {
            "hidden_size": 32, "num_attention_heads": 2,
            "intermediate_size": 64, "max_position_embeddings": 32,
            "num_hidden_layers": 1, "embedding_size": 16,
            "attention_impl": "xla",
        },
    }
    cfg = Config.from_dict(raw)
    cfg_path = tmp_path / "config.yml"
    cfg.save(str(cfg_path))

    model = build_model(cfg.model_params, "fp32")
    params = init_params(model, 32, seed=0)
    opt = make_optimizer(cfg.training_params)
    save_checkpoint(str(tmp_path), 1, params, opt.init(params))

    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    proc = subprocess.Popen(
        [sys.executable, "-m", "pl_bert_tpu.serving.server",
         "--checkpoint", str(tmp_path / "step_1"),
         "--config_path", str(cfg_path),
         "--port", "0"],  # port 0 = ephemeral; we never connect
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env,
    )
    try:
        # wait for the listener banner, confirm the serve loop is live
        # via /healthz, then TERM
        deadline = time.monotonic() + 300
        lines = []
        port = None
        for line in proc.stdout:
            lines.append(line)
            if "serving on http://" in line:
                port = int(line.split("http://127.0.0.1:")[1].split(" ")[0])
                break
            assert time.monotonic() < deadline, lines
        assert port, lines
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read())["ok"]
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
        lines.append(out)
    finally:
        if proc.poll() is None:
            proc.kill()
    text = "".join(lines)
    assert "server drained and stopped" in text, text
    assert proc.returncode == 0, (proc.returncode, text)


# --- hot checkpoint reload (zero-downtime weight rollout) --------------------


def _mini_encoder(seed, hidden_size=32):
    mp = ModelParams(
        hidden_size=hidden_size, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=32,
        num_hidden_layers=1, embedding_size=16,
        dropout=0.0, attention_impl="xla",
    )
    params = init_params(build_model(mp, "fp32"), 32, seed=seed)["encoder"]
    return PhonemeEncoder(
        params, mp, max_seq_length=32, mixed_precision="fp32", batch_size=4
    ), params


def test_swap_params_changes_outputs_and_validates_shape():
    """swap_params adopts a matching tree (outputs equal a fresh encoder
    built on the new weights) and rejects a shape-mismatched one."""
    enc, _ = _mini_encoder(11)
    enc2, p2 = _mini_encoder(12)
    before = enc(["qalam"])[0]
    enc.swap_params(p2)
    after = enc(["qalam"])[0]
    assert not np.allclose(before, after)
    np.testing.assert_allclose(after, enc2(["qalam"])[0], atol=1e-6)

    _, p_small = _mini_encoder(13, hidden_size=16)
    with pytest.raises(ValueError, match="param tree mismatch"):
        enc.swap_params(p_small)
    # the failed swap must not have touched the live weights
    np.testing.assert_allclose(enc(["qalam"])[0], after, atol=1e-6)


def test_http_reload_rolls_weights_without_downtime():
    """POST /reload swaps weights on the live server: encodes after the
    reload match the new checkpoint, /healthz names it, a bad tree or
    unknown path is a 400 and leaves the old weights serving."""
    from pl_bert_tpu.serving.server import attach_reload

    enc, _ = _mini_encoder(21)
    enc_v2, p2 = _mini_encoder(22)
    _, p_small = _mini_encoder(23, hidden_size=16)

    store = {"v2": p2, "bad-shape": p_small}

    def load_params(path):
        if path not in store:
            raise FileNotFoundError(f"no checkpoint at {path!r}")
        return store[path]

    server = make_server(enc, port=0, max_wait_ms=5.0)
    attach_reload(server, load_params)
    serve_in_thread(server)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        status, r_old = _post(base + "/encode", {"phonemes": "qalam"})
        assert status == 200

        status, body = _post(base + "/reload", {"checkpoint": "v2"})
        assert status == 200 and body == {"ok": True, "checkpoint": "v2"}

        status, r_new = _post(base + "/encode", {"phonemes": "qalam"})
        assert status == 200
        direct_h, direct_l = enc_v2(["qalam"])
        got = np.array(r_new["hidden"], np.float32)
        assert not np.allclose(got, np.array(r_old["hidden"], np.float32))
        np.testing.assert_allclose(got, direct_h[0, : direct_l[0]], atol=1e-5)

        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            assert json.loads(r.read())["checkpoint"] == "v2"

        # failures are client errors and leave the v2 weights serving
        assert _post(base + "/reload", {"checkpoint": "bad-shape"})[0] == 400
        assert _post(base + "/reload", {"checkpoint": "missing"})[0] == 400
        assert _post(base + "/reload", {"nope": 1})[0] == 400
        status, r_still = _post(base + "/encode", {"phonemes": "qalam"})
        assert status == 200
        np.testing.assert_allclose(
            np.array(r_still["hidden"], np.float32), got, atol=1e-6
        )
    finally:
        server.shutdown()
        server.batcher.close()


def test_http_reload_disabled_without_loader():
    """A server with no checkpoint loader attached answers 501 (the
    embedding API's default: reload is opt-in via attach_reload)."""
    enc, _ = _mini_encoder(31)
    server = make_server(enc, port=0, max_wait_ms=5.0)
    serve_in_thread(server)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        assert _post(base + "/reload", {"checkpoint": "x"})[0] == 501
    finally:
        server.shutdown()
        server.batcher.close()


def test_pool_swap_params_rolls_every_replica():
    """ReplicaPool.swap_params updates all replicas — encodes routed to
    any replica return the new weights' outputs."""
    import jax

    from pl_bert_tpu.serving.pool import ReplicaPool

    enc, _ = _mini_encoder(41)
    enc_v2, p2 = _mini_encoder(42)
    devices = jax.local_devices()[:2]
    pool = ReplicaPool.from_encoder(enc, devices, max_wait_ms=1.0)
    try:
        want_old = enc(["qalam"])[0][0]
        want_new = enc_v2(["qalam"])[0][0]
        for _ in range(4):  # round-robins across both replicas
            h, n = pool.encode("qalam", timeout=30)
            np.testing.assert_allclose(h[:n], want_old[:n], atol=1e-5)
        pool.swap_params(p2)
        for _ in range(4):
            h, n = pool.encode("qalam", timeout=30)
            np.testing.assert_allclose(h[:n], want_new[:n], atol=1e-5)
    finally:
        pool.close()


# --- binary payload + keep-alive transport -----------------------------------


def test_http_b64_encoding_matches_json(encoder):
    """encoding=b64 returns byte-identical fp32 values to the JSON path
    (it packs the same array), fp16 within cast tolerance, and bad
    encoding/dtype values are 400s."""
    import base64

    server = make_server(encoder, port=0, max_wait_ms=5.0)
    serve_in_thread(server)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        status, r_json = _post(base + "/encode", {"phonemes": "qalam"})
        assert status == 200
        want = np.asarray(r_json["hidden"], np.float32)

        status, r = _post(
            base + "/encode", {"phonemes": "qalam", "encoding": "b64"}
        )
        assert status == 200 and "hidden" not in r
        got = np.frombuffer(
            base64.b64decode(r["hidden_b64"]), dtype=r["dtype"]
        ).reshape(r["shape"])
        assert r["dtype"] == "float32" and r["length"] == r["shape"][0]
        np.testing.assert_array_equal(got, want)

        status, r16 = _post(
            base + "/encode",
            {"phonemes": "qalam", "encoding": "b64", "dtype": "float16"},
        )
        assert status == 200 and r16["dtype"] == "float16"
        got16 = np.frombuffer(
            base64.b64decode(r16["hidden_b64"]), dtype=np.float16
        ).reshape(r16["shape"])
        np.testing.assert_allclose(
            got16.astype(np.float32), want, rtol=2e-3, atol=2e-3
        )
        # fp16 payload is half the fp32 one
        assert len(r16["hidden_b64"]) <= len(r["hidden_b64"]) / 2 + 4

        # list-shaped requests wrap per-item binary results
        status, rl = _post(
            base + "/encode", {"phonemes": ["ab", "qalam"], "encoding": "b64"}
        )
        assert status == 200 and len(rl["results"]) == 2
        assert all("hidden_b64" in item for item in rl["results"])

        assert _post(base + "/encode",
                     {"phonemes": "x", "encoding": "npz"})[0] == 400
        assert _post(base + "/encode",
                     {"phonemes": "x", "encoding": "b64",
                      "dtype": "int8"})[0] == 400
    finally:
        server.shutdown()
        server.batcher.close()


def test_http_keepalive_reuses_connection(encoder):
    """The server speaks HTTP/1.1 with Content-Length on every reply, so
    one TCP connection carries many requests (urllib's per-request
    connections still work — the existing tests cover that path)."""
    import http.client

    server = make_server(encoder, port=0, max_wait_ms=5.0)
    serve_in_thread(server)
    host, port = server.server_address[:2]
    conn = http.client.HTTPConnection(host, port, timeout=30)
    try:
        for i in range(3):  # same socket, three request/response cycles
            conn.request(
                "POST", "/encode",
                body=json.dumps({"phonemes": "qalam"}).encode(),
                headers={"Content-Type": "application/json"},
            )
            resp = conn.getresponse()
            assert resp.version == 11 and resp.status == 200
            body = json.loads(resp.read())
            assert body["length"] == 5
        conn.request("GET", "/healthz")  # GET rides the same socket too
        assert json.loads(conn.getresponse().read())["ok"] is True
    finally:
        conn.close()
        server.shutdown()
        server.batcher.close()


def test_client_b64_and_persistent_connection(encoder):
    """ServingClient: b64/fp16 decode transparently, values match the
    default JSON path, and the thread's persistent connection survives
    the whole sequence (plus a forced stale-connection reconnect)."""
    from pl_bert_tpu.serving.client import ServingClient

    server = make_server(encoder, port=0, max_wait_ms=5.0)
    serve_in_thread(server)
    client = ServingClient(
        f"http://127.0.0.1:{server.server_address[1]}", timeout_s=30
    )
    try:
        h_json, n_json = client.encode("qalam")
        h_b64, n_b64 = client.encode("qalam", encoding="b64")
        assert n_json == n_b64
        np.testing.assert_array_equal(h_b64, h_json)
        h16, _ = client.encode("qalam", encoding="b64", dtype="float16")
        assert h16.dtype == np.float16
        np.testing.assert_allclose(
            h16.astype(np.float32), h_json, rtol=2e-3, atol=2e-3
        )
        # stale keep-alive: kill the socket under the client; the next
        # call must transparently reconnect
        client._local.conn.close()
        h_again, _ = client.encode("qalam")
        np.testing.assert_array_equal(h_again, h_json)
        results = client.encode(["ab", "qalam"], encoding="b64")
        assert len(results) == 2 and results[1][1] == n_json
    finally:
        client.close()
        server.shutdown()
        server.batcher.close()


def test_keepalive_survives_post_error_paths(encoder, tmp_path):
    """ADVICE r4: POST error replies (404 route, 501 reload-disabled,
    403 guard) must drain the request body — otherwise the next request
    on the persistent connection parses the stale body bytes as a
    request line and the stream desyncs."""
    import http.client

    server = make_server(encoder, port=0, max_wait_ms=5.0)
    serve_in_thread(server)
    host, port = server.server_address[:2]
    conn = http.client.HTTPConnection(host, port, timeout=30)
    big = json.dumps({"payload": "x" * 4096}).encode()
    try:
        # 404 with a large body, then a normal request on the SAME socket
        conn.request("POST", "/nope", body=big,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 404
        r.read()  # client must drain its side too to reuse the socket
        conn.request(
            "POST", "/encode",
            body=json.dumps({"phonemes": "qalam"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        assert resp.status == 200
        assert json.loads(resp.read())["length"] == 5

        # 501 reload-disabled with a body, same socket again
        conn.request("POST", "/reload", body=big,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 501
        r.read()
        conn.request(
            "POST", "/encode",
            body=json.dumps({"phonemes": "ab"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        assert resp.status == 200
        assert json.loads(resp.read())["length"] == 2
    finally:
        conn.close()
        server.shutdown()
        server.batcher.close()


def test_http_reload_root_and_token_guards(tmp_path):
    """ADVICE r4: /reload is constrained — checkpoints outside the
    allowed root 403, a configured token must match X-Reload-Token, and
    a request passing both guards reaches the loader."""
    import http.client

    from pl_bert_tpu.serving.server import attach_reload

    enc, _ = _mini_encoder(41)
    _, p2 = _mini_encoder(42)
    root = tmp_path / "run"
    root.mkdir()
    (root / "step_2").mkdir()
    outside = tmp_path / "evil"
    outside.mkdir()
    # a symlink under the root pointing outside must also be rejected
    (root / "link").symlink_to(outside)

    seen = []

    def load_params(path):
        seen.append(path)
        return p2

    server = make_server(enc, port=0, max_wait_ms=5.0)
    attach_reload(server, load_params, root=str(root), token="s3cret")
    serve_in_thread(server)
    base = f"http://127.0.0.1:{server.server_address[1]}"

    def post_reload(ckpt, token=None):
        req = urllib.request.Request(
            base + "/reload",
            data=json.dumps({"checkpoint": ckpt}).encode(),
            headers={"Content-Type": "application/json",
                     **({"X-Reload-Token": token} if token else {})},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return resp.status
        except urllib.error.HTTPError as e:
            e.read()
            return e.code

    try:
        # no token / wrong token → 403, loader never called
        assert post_reload(str(root / "step_2")) == 403
        assert post_reload(str(root / "step_2"), token="wrong") == 403
        # right token, path outside the root → 403
        assert post_reload(str(outside / "step_9"), token="s3cret") == 403
        assert post_reload(str(root / "link" / "x"), token="s3cret") == 403
        assert post_reload("/etc/passwd", token="s3cret") == 403
        assert seen == []
        # both guards pass → the loader runs and the swap succeeds
        assert post_reload(str(root / "step_2"), token="s3cret") == 200
        assert seen == [str(root / "step_2")]
    finally:
        server.shutdown()
        server.batcher.close()


def test_client_b64_array_is_writable(encoder):
    """ADVICE r4: the b64 decode path must return a WRITABLE array like
    the JSON path (np.frombuffer views are read-only) — downstream
    in-place normalization must work with either payload encoding."""
    from pl_bert_tpu.serving.client import ServingClient

    server = make_server(encoder, port=0, max_wait_ms=5.0)
    serve_in_thread(server)
    client = ServingClient(
        f"http://127.0.0.1:{server.server_address[1]}", timeout_s=30
    )
    try:
        for kwargs in ({}, {"encoding": "b64"},
                       {"encoding": "b64", "dtype": "float16"}):
            hidden, _ = client.encode("qalam", **kwargs)
            assert hidden.flags.writeable, kwargs
            hidden *= 2.0  # in-place op must not raise
    finally:
        client.close()
        server.shutdown()
        server.batcher.close()


def test_client_timeout_is_not_retried():
    """ADVICE r4 (medium): a request that merely exceeds timeout_s must
    surface TimeoutError — NOT be silently re-sent (double-submitting a
    non-idempotent POST exactly when the server is slow). A silent
    server here receives exactly ONE request."""
    import socket
    import threading as th

    from pl_bert_tpu.serving.client import ServingClient

    received = []
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    stop = th.Event()

    def accept_loop():
        srv.settimeout(0.2)
        conns = []
        while not stop.is_set():
            try:
                c, _ = srv.accept()
            except socket.timeout:
                continue
            c.settimeout(0.2)
            try:
                data = c.recv(65536)  # read the request, never reply
                if data:
                    received.append(data)
            except socket.timeout:
                pass
            conns.append(c)  # hold open: the client must time out
        for c in conns:
            c.close()

    t = th.Thread(target=accept_loop, daemon=True)
    t.start()
    client = ServingClient(
        f"http://127.0.0.1:{srv.getsockname()[1]}", timeout_s=1.0
    )
    try:
        t0 = time.monotonic()
        with pytest.raises(TimeoutError):
            client.encode("qalam")
        elapsed = time.monotonic() - t0
        # one submission only — a retry would both double `received`
        # and take ~2x the timeout
        assert len(received) == 1, received
        assert elapsed < 1.9, elapsed
    finally:
        stop.set()
        t.join(timeout=5)
        srv.close()
        client.close()
