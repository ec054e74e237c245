"""Replica-per-device serving pool (serving/pool.py).

The scale-out design for ALBERT-size serving: one pinned encoder +
batcher per device (a v5e host has 8 chips), requests balanced to the
least-loaded replica — not a tensor-sharded model paying ICI per token.
Runs here on the virtual 8-device CPU mesh from conftest."""

import threading
import time

import jax
import numpy as np
import pytest

from pl_bert_tpu.config import ModelParams
from pl_bert_tpu.models.albert import build_model, init_params
from pl_bert_tpu.models.inference import PhonemeEncoder
from pl_bert_tpu.serving.batcher import DynamicBatcher, QueueFull
from pl_bert_tpu.serving.pool import ReplicaPool
from pl_bert_tpu.serving.server import make_pool_server, serve_in_thread

TEXTS = ["qalam", "bajt ʃams", "ˈmaʕna θaːbit", "ab", "ʃ", "qalam bajt"]


@pytest.fixture(scope="module")
def template_encoder():
    mp = ModelParams(
        hidden_size=32, num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32, num_hidden_layers=1, embedding_size=16,
        dropout=0.0, attention_impl="xla",
    )
    params = init_params(build_model(mp, "fp32"), 32, seed=11)["encoder"]
    return PhonemeEncoder(
        params, mp, max_seq_length=32, mixed_precision="fp32", batch_size=4
    )


def test_pinned_clone_runs_on_its_device(template_encoder):
    devices = jax.local_devices()
    assert len(devices) >= 2, "conftest should provide 8 virtual devices"
    clone = template_encoder.clone_to(devices[1])
    ids, mask, _ = clone.encode_batch(["qalam"])
    hidden = clone.forward(ids, mask)
    assert devices[1] in hidden.devices()
    # numerics identical to the template on device 0
    direct, _ = template_encoder(["qalam"])
    np.testing.assert_allclose(
        np.asarray(hidden, np.float32)[0], direct[0], atol=1e-6
    )


def test_pool_parity_and_distribution(template_encoder):
    devices = jax.local_devices()[:3]
    direct = {}
    for t in TEXTS:
        hidden, lengths = template_encoder([t])
        direct[t] = hidden[0, : lengths[0]]

    pool = ReplicaPool.from_encoder(
        template_encoder, devices, max_wait_ms=0.0
    )
    try:
        results = {}

        def client(t):
            results[t] = pool.encode(t, timeout=60)

        threads = [threading.Thread(target=client, args=(t,)) for t in TEXTS]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=60)

        for t, (hidden, length) in results.items():
            assert length == len(direct[t])
            np.testing.assert_allclose(hidden, direct[t], atol=1e-5)

        stats = pool.stats()
        assert stats["replicas"] == 3
        assert stats["requests"] == len(TEXTS)
        assert sum(
            s["requests"] for s in stats["per_replica"]
        ) == len(TEXTS)
        # round-robin tie-breaking spreads an idle-pool trickle: more
        # than one replica must have seen traffic
        busy = [s for s in stats["per_replica"] if s["requests"] > 0]
        assert len(busy) >= 2
    finally:
        pool.close()


def test_pool_overload_fails_over_then_rejects():
    class _Slow:
        def __call__(self, texts):
            time.sleep(0.25)
            n, L, H = len(texts), 8, 2
            return (
                np.zeros((n, L, H), np.float32),
                np.full(n, L, np.int32),
            )

    batchers = [
        DynamicBatcher(_Slow(), max_batch=1, max_wait_ms=0.0, max_pending=1)
        for _ in range(2)
    ]
    pool = ReplicaPool(batchers)
    try:
        futures = []
        # 2 picked up by workers + 2 queued (one per replica's bound)
        for i in range(4):
            futures.append(pool.submit(f"t{i}"))
            time.sleep(0.02)
        # every replica now at capacity → the pool-wide QueueFull
        with pytest.raises(QueueFull):
            for _ in range(3):
                pool.submit("overflow")
        for f in futures:
            f.result(timeout=10)
    finally:
        pool.close()
    assert pool.stats()["rejected"] >= 1


def test_pool_http_front_end(template_encoder):
    import json
    import urllib.request

    pool = ReplicaPool.from_encoder(
        template_encoder, jax.local_devices()[:2], max_wait_ms=10.0
    )
    server = make_pool_server(pool, port=0)
    serve_in_thread(server)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["replicas"] == 2 and health["hidden_size"] == 32

        direct, direct_l = template_encoder(["qalam"])
        req = urllib.request.Request(
            base + "/encode",
            data=json.dumps({"phonemes": "qalam"}).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            body = json.loads(r.read())
        assert body["length"] == int(direct_l[0])
        np.testing.assert_allclose(
            np.asarray(body["hidden"], np.float32),
            direct[0, : direct_l[0]], atol=1e-5,
        )

        with urllib.request.urlopen(base + "/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["replicas"] == 2 and stats["requests"] >= 1
    finally:
        server.shutdown()
        pool.close()


def test_bench_serving_tool_replicas_contract(capsys):
    """tools/bench_serving.py --replicas routes the load through a
    ReplicaPool (CPU smoke on the virtual mesh)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    import bench_serving

    bench_serving.main(
        ["--tiny", "--requests", "16", "--concurrency", "8",
         "--max_batch", "4", "--replicas", "2", "--max_wait_ms", "2"]
    )
    import json

    record = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert record["replicas"] == 2
    assert record["requests_per_sec"] > 0
    assert record["metric"] == "serving_load_engine"
