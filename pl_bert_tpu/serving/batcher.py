"""Dynamic request batching for online serving.

The reference repo has no serving path at all — its downstream contract
is "feed ``AlbertModel(...).last_hidden_state`` to StyleTTS" (reference:
README.md:40-47), one utterance at a time. On TPU that contract is
throughput-hostile when served naively: each dispatch pays host→device
latency (~0.4 ms measured through this rig's tunnel, CLAUDE.md perf
ledger) and a batch-1 forward leaves the MXU almost entirely idle — the
[1, L, H] matmuls are far below the systolic array's tile size.

``DynamicBatcher`` closes that gap the TPU-first way: requests from any
number of client threads are coalesced into ONE fixed-shape jitted
forward (the ``PhonemeEncoder`` compiled at a fixed ``batch_size``), so
concurrent load rides the MXU at full batch while a lone request still
leaves after ``max_wait_ms``. XLA never sees a new shape — the encoder's
fixed batch padding plus its length buckets keep the compile count
bounded no matter the traffic mix.

Threading model: callers enqueue under a Condition and get a
``concurrent.futures.Future``; a single worker thread drains the queue
(up to ``max_batch`` items, waiting at most ``max_wait_ms`` past the
oldest pending request), runs the encoder OUTSIDE the lock, and routes
each row's valid-prefix hidden states back to its future. One worker ==
one device stream: the jitted forward is never called concurrently.
"""

from __future__ import annotations

import collections
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Callable

import numpy as np

# encode_fn contract = PhonemeEncoder.__call__:
#   list[str] -> (hidden [N, L, H] fp32, lengths [N] int32)
EncodeFn = Callable[[list[str]], tuple[np.ndarray, np.ndarray]]


@dataclass
class _Pending:
    text: str
    future: Future = field(default_factory=Future)
    t_submit: float = field(default_factory=time.monotonic)


class DynamicBatcher:
    """Coalesce concurrent encode requests into fixed-shape batches.

    Parameters
    ----------
    encode_fn:
        ``list[str] -> (hidden [N, L, H], lengths [N])`` — normally a
        ``PhonemeEncoder`` constructed with a fixed ``batch_size`` (so
        the forward compiles once) of at least ``max_batch``.
    max_batch:
        Largest number of requests per encoder call. Must not exceed the
        encoder's fixed ``batch_size``.
    max_wait_ms:
        How long a request may wait for co-riders before the batch is
        cut anyway — the latency/throughput knob. 0 = never wait (each
        drain takes whatever is queued right now).

    Each submitted string resolves to ``(hidden [length, H] fp32,
    length)`` — the VALID PREFIX of its row, so results are identical
    whether the request rode alone or in a full batch (padding is masked
    out of attention; tests pin this).
    """

    def __init__(
        self,
        encode_fn: EncodeFn,
        max_batch: int,
        max_wait_ms: float = 5.0,
    ) -> None:
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self._encode_fn = encode_fn
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._queue: list[_Pending] = []
        self._oldest_ts: float = 0.0
        self._closed = False
        # stats (mutated only under the lock or by the single worker)
        self._n_requests = 0
        self._n_batches = 0
        self._n_batched_items = 0
        self._max_batch_seen = 0
        self._n_errors = 0
        # submit→result latency of the most recent requests (seconds)
        self._latencies: collections.deque[float] = collections.deque(
            maxlen=2048
        )
        self._worker = threading.Thread(
            target=self._run, name="plbert-batcher", daemon=True
        )
        self._worker.start()

    # --- client side --------------------------------------------------------
    def submit(self, phoneme_string: str) -> Future:
        """Enqueue one utterance; the Future resolves to
        ``(hidden [length, H] fp32, length)``."""
        item = _Pending(phoneme_string)
        with self._cond:
            if self._closed:
                raise RuntimeError("DynamicBatcher is closed")
            if not self._queue:
                self._oldest_ts = time.monotonic()
            self._queue.append(item)
            self._n_requests += 1
            self._cond.notify_all()
        return item.future

    def encode(
        self, phoneme_string: str, timeout: float | None = None
    ) -> tuple[np.ndarray, int]:
        """Synchronous convenience wrapper around :meth:`submit`."""
        return self.submit(phoneme_string).result(timeout=timeout)

    def stats(self) -> dict:
        """Serving counters (also exposed at the HTTP ``/stats`` route)."""
        with self._lock:
            n_b = self._n_batches
            lat = sorted(self._latencies)
            out = {
                "requests": self._n_requests,
                "batches": n_b,
                "mean_batch_size": (
                    self._n_batched_items / n_b if n_b else 0.0
                ),
                "max_batch_seen": self._max_batch_seen,
                "pending": len(self._queue),
                "errors": self._n_errors,
            }
            if lat:
                out["latency_ms"] = {
                    "p50": 1e3 * lat[len(lat) // 2],
                    "p95": 1e3 * lat[min(len(lat) - 1, int(0.95 * len(lat)))],
                    "max": 1e3 * lat[-1],
                }
            return out

    def close(self, timeout: float = 10.0) -> None:
        """Drain remaining requests, then stop the worker."""
        with self._cond:
            self._closed = True
            self._cond.notify_all()
        self._worker.join(timeout=timeout)

    def __enter__(self) -> "DynamicBatcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # --- worker side --------------------------------------------------------
    def _cut_batch(self) -> list[_Pending] | None:
        """Block until a batch is ready (or closed+drained → None)."""
        with self._cond:
            while not self._queue:
                if self._closed:
                    return None
                self._cond.wait()
            # wait for co-riders, bounded by the oldest request's deadline
            deadline = self._oldest_ts + self.max_wait_s
            while len(self._queue) < self.max_batch and not self._closed:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                self._cond.wait(timeout=remaining)
            batch = self._queue[: self.max_batch]
            del self._queue[: self.max_batch]
            if self._queue:
                # remaining items become the new "oldest" cohort; their
                # true arrival is earlier than now, so this only ever
                # SHORTENS their wait — never starves them
                self._oldest_ts = time.monotonic()
            return batch

    def _run(self) -> None:
        while True:
            batch = self._cut_batch()
            if batch is None:
                return
            try:
                hidden, lengths = self._encode_fn([p.text for p in batch])
            except Exception as exc:  # noqa: BLE001 — routed to callers
                with self._lock:
                    self._n_errors += len(batch)
                for p in batch:
                    p.future.set_exception(exc)
                continue
            with self._lock:
                self._n_batches += 1
                self._n_batched_items += len(batch)
                self._max_batch_seen = max(self._max_batch_seen, len(batch))
            done = time.monotonic()
            for i, p in enumerate(batch):
                n = int(lengths[i])
                p.future.set_result((np.asarray(hidden[i, :n]), n))
            with self._lock:
                self._latencies.extend(done - p.t_submit for p in batch)
