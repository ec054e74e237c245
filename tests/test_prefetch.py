"""data/pipeline.py::prefetch — the training loop's host→device overlap
thread. Covers the paths a deadlock/leak can hide in: normal completion
with a FULL queue at iterator end, early consumer exit (num_steps
returns mid-epoch), and producer-error propagation."""

import threading
import time

from pl_bert_tpu.data.pipeline import prefetch


def _threads() -> int:
    return threading.active_count()


def test_completes_with_full_queue():
    # more items than queue slots: the sentinel put must WAIT for space,
    # not be dropped (a dropped sentinel deadlocks the consumer)
    assert list(prefetch(iter(range(10)), size=2)) == list(range(10))


def test_early_consumer_exit_stops_worker():
    before = _threads()
    consumed = []
    for x in prefetch(iter(range(1000)), size=2):
        consumed.append(x)
        if len(consumed) == 3:
            break  # GeneratorExit → finally → stop + drain
    assert consumed == [0, 1, 2]
    deadline = time.monotonic() + 10
    while _threads() > before and time.monotonic() < deadline:
        time.sleep(0.05)
    assert _threads() <= before, "prefetch worker thread leaked"


def test_producer_error_propagates():
    def gen():
        yield 1
        raise RuntimeError("boom")

    import pytest

    it = prefetch(gen(), size=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_many_sequential_runs_leak_no_threads():
    before = _threads()
    for _ in range(20):
        for x in prefetch(iter(range(50)), size=2):
            if x == 5:
                break
    deadline = time.monotonic() + 10
    while _threads() > before and time.monotonic() < deadline:
        time.sleep(0.05)
    assert _threads() <= before
