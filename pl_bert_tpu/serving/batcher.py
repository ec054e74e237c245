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

Two production knobs on top: ``seq_buckets`` makes batch formation
bucket-aware (a batch only carries requests from ONE length bucket, so
short utterances never pay a long co-rider's padded compute), and
``max_pending`` bounds the queue (overload → :class:`QueueFull`,
surfaced as HTTP 503 — bounded tail latency instead of a silent
ever-growing queue).
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


class QueueFull(RuntimeError):
    """Raised by :meth:`DynamicBatcher.submit` when ``max_pending`` is
    set and the queue is at capacity — the backpressure signal (the
    HTTP front-end maps it to 503 + Retry-After). Rejecting at submit
    keeps tail latency bounded: an unbounded queue converts overload
    into arbitrarily late answers instead of an actionable error."""


@dataclass
class _Pending:
    text: str
    bucket: int = 0
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
    seq_buckets:
        Optional ascending length buckets — normally the ENCODER's own
        ``seq_buckets``. When set, a batch is formed only from requests
        that land in the SAME bucket as the oldest pending request, so
        a 12-phoneme utterance never pays a 500-phoneme co-rider's
        padded compute (the encoder pads the whole batch to its longest
        member's bucket). Requests in other buckets stay queued in FIFO
        order; the oldest request always defines the next batch, so no
        bucket starves.
    max_pending:
        Optional queue-depth bound. When the queue holds this many
        not-yet-batched requests, :meth:`submit` raises
        :class:`QueueFull` instead of enqueueing (overload → fast 503,
        not unbounded latency). None = unbounded (trusted callers).
    pipeline_depth:
        Number of batches allowed in flight on the device at once.
        1 (default) = dispatch and fetch in the same worker loop.
        >1 exploits JAX's asynchronous dispatch: the worker launches
        batch N+1's forward while a completer thread blocks on batch
        N's device→host fetch, overlapping transfer with compute.
        Requires an encoder with split ``dispatch``/``fetch`` phases
        (``PhonemeEncoder`` has them).

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
        seq_buckets: tuple[int, ...] | None = None,
        max_pending: int | None = None,
        pipeline_depth: int = 1,
    ) -> None:
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        if max_pending is not None and max_pending < 1:
            raise ValueError(f"max_pending must be >= 1, got {max_pending}")
        if pipeline_depth < 1:
            raise ValueError(
                f"pipeline_depth must be >= 1, got {pipeline_depth}"
            )
        if pipeline_depth > 1 and not (
            hasattr(encode_fn, "dispatch") and hasattr(encode_fn, "fetch")
        ):
            raise ValueError(
                "pipeline_depth > 1 needs an encoder with split "
                "dispatch/fetch phases (PhonemeEncoder has them); a plain "
                "encode_fn callable cannot overlap dispatch with fetch"
            )
        self._encode_fn = encode_fn
        self.pipeline_depth = int(pipeline_depth)
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self.seq_buckets = (
            tuple(sorted(int(b) for b in seq_buckets)) if seq_buckets else None
        )
        self.max_pending = max_pending
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._queue: list[_Pending] = []
        self._closed = False
        # stats (mutated only under the lock or by the single worker)
        self._n_requests = 0
        self._n_batches = 0
        self._n_batched_items = 0
        self._max_batch_seen = 0
        self._n_errors = 0
        self._n_rejected = 0
        # submit→result latency of the most recent requests (seconds)
        self._latencies: collections.deque[float] = collections.deque(
            maxlen=2048
        )
        self._completer: threading.Thread | None = None
        if self.pipeline_depth > 1:
            import queue as _queue

            # worker → completer FIFO of (batch, dispatch handle);
            # the semaphore bounds device-side in-flight batches
            self._inflight: _queue.Queue = _queue.Queue()
            self._slots = threading.Semaphore(self.pipeline_depth)
            self._completer = threading.Thread(
                target=self._complete_loop, name="plbert-completer",
                daemon=True,
            )
            self._completer.start()
        self._worker = threading.Thread(
            target=self._run, name="plbert-batcher", daemon=True
        )
        self._worker.start()

    def _bucket_of(self, text: str) -> int:
        """Bucket index for grouping (0 when bucketing is off). Uses the
        same smallest-covering-bucket rule as PhonemeEncoder.encode_batch
        — one char == one phoneme id under the char indexer; overlong
        texts group into the top bucket (the encoder crops them)."""
        if self.seq_buckets is None:
            return 0
        n = len(text)
        for i, bk in enumerate(self.seq_buckets):
            if bk >= n:
                return i
        return len(self.seq_buckets) - 1

    # --- client side --------------------------------------------------------
    def submit(self, phoneme_string: str) -> Future:
        """Enqueue one utterance; the Future resolves to
        ``(hidden [length, H] fp32, length)``. Raises :class:`QueueFull`
        when ``max_pending`` is set and reached."""
        item = _Pending(phoneme_string, self._bucket_of(phoneme_string))
        with self._cond:
            if self._closed:
                raise RuntimeError("DynamicBatcher is closed")
            if (
                self.max_pending is not None
                and len(self._queue) >= self.max_pending
            ):
                self._n_rejected += 1
                raise QueueFull(
                    f"{len(self._queue)} requests already pending "
                    f"(max_pending={self.max_pending})"
                )
            self._queue.append(item)
            self._n_requests += 1
            self._cond.notify_all()
        return item.future

    def encode(
        self, phoneme_string: str, timeout: float | None = None
    ) -> tuple[np.ndarray, int]:
        """Synchronous convenience wrapper around :meth:`submit`."""
        return self.submit(phoneme_string).result(timeout=timeout)

    def swap_params(self, new_params: dict) -> None:
        """Roll new weights onto the encoder — delegates to
        ``PhonemeEncoder.swap_params`` (atomic between forwards; see
        there). Part of the shared batcher/pool surface the HTTP
        ``/reload`` route drives."""
        self._encode_fn.swap_params(new_params)

    @property
    def pending(self) -> int:
        """Queued-but-not-yet-batched request count (cheap: no latency
        sort — the load-balancing signal serving/pool.py polls per
        submit)."""
        with self._lock:
            return len(self._queue)

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
                "rejected": self._n_rejected,
            }
            if lat:
                out["latency_ms"] = {
                    "p50": 1e3 * lat[len(lat) // 2],
                    "p95": 1e3 * lat[min(len(lat) - 1, int(0.95 * len(lat)))],
                    "max": 1e3 * lat[-1],
                }
            return out

    def close(self, timeout: float = 10.0) -> None:
        """Drain remaining requests, then stop the worker(s)."""
        with self._cond:
            self._closed = True
            self._cond.notify_all()
        self._worker.join(timeout=timeout)
        if self._completer is not None:
            # the worker queued a drain sentinel on exit; the completer
            # resolves every still-in-flight batch before seeing it
            self._completer.join(timeout=timeout)

    def __enter__(self) -> "DynamicBatcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # --- worker side --------------------------------------------------------
    def _group_of_head(self) -> list[_Pending]:
        """Up to ``max_batch`` queued items sharing the HEAD's bucket,
        in FIFO order (== the head's ``max_batch``-prefix when bucketing
        is off, since every bucket is then 0). Lock held by caller."""
        head_bucket = self._queue[0].bucket
        group = []
        for p in self._queue:
            if p.bucket == head_bucket:
                group.append(p)
                if len(group) == self.max_batch:
                    break
        return group

    def _cut_batch(self) -> list[_Pending] | None:
        """Block until a batch is ready (or closed+drained → None)."""
        with self._cond:
            while not self._queue:
                if self._closed:
                    return None
                self._cond.wait()
            # wait for co-riders, bounded by the oldest request's
            # deadline (the queue is FIFO, so head == oldest; serving
            # the head's bucket first is what prevents starvation)
            deadline = self._queue[0].t_submit + self.max_wait_s
            while (
                len(self._group_of_head()) < self.max_batch
                and not self._closed
            ):
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                self._cond.wait(timeout=remaining)
            batch = self._group_of_head()
            taken = set(map(id, batch))
            self._queue = [p for p in self._queue if id(p) not in taken]
            return batch

    def _fail(self, batch: list[_Pending], exc: Exception) -> None:
        with self._lock:
            self._n_errors += len(batch)
        for p in batch:
            p.future.set_exception(exc)

    def _resolve(self, batch: list[_Pending], hidden, lengths) -> None:
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

    def _run(self) -> None:
        while True:
            batch = self._cut_batch()
            if batch is None:
                if self._completer is not None:
                    self._inflight.put(None)  # drain sentinel
                return
            if self._completer is None:
                try:
                    hidden, lengths = self._encode_fn(
                        [p.text for p in batch]
                    )
                except Exception as exc:  # noqa: BLE001 — routed to callers
                    self._fail(batch, exc)
                    continue
                self._resolve(batch, hidden, lengths)
            else:
                # pipelined: enqueue the forward on the device and move
                # straight on to cutting the next batch — the completer
                # thread blocks on the device→host fetch instead of us
                self._slots.acquire()
                try:
                    handle = self._encode_fn.dispatch(
                        [p.text for p in batch]
                    )
                except Exception as exc:  # noqa: BLE001
                    self._slots.release()
                    self._fail(batch, exc)
                    continue
                self._inflight.put((batch, handle))

    def _complete_loop(self) -> None:
        """pipeline_depth > 1: resolve dispatched batches in FIFO order
        (device results are fetched here, overlapping the worker's next
        dispatch)."""
        while True:
            item = self._inflight.get()
            if item is None:
                return
            batch, handle = item
            try:
                hidden, lengths = self._encode_fn.fetch(handle)
            except Exception as exc:  # noqa: BLE001
                self._fail(batch, exc)
                continue
            finally:
                self._slots.release()
            self._resolve(batch, hidden, lengths)
