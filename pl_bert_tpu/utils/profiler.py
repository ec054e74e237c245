"""Profiling / tracing support.

The reference has no profiler hooks (SURVEY §5); this adds the
TPU-native one: ``jax.profiler`` traces viewable in TensorBoard /
Perfetto. Enable in training via the ``PLBERT_PROFILE_DIR`` env var
(traces the configured step window) or use :func:`profile_trace`
directly around any region.
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed region."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class maybe_profile:
    """Step-window profiler driven by env vars:

    - ``PLBERT_PROFILE_DIR``: trace output directory (unset → disabled)
    - ``PLBERT_PROFILE_START`` (default 10) / ``PLBERT_PROFILE_STEPS``
      (default 5): which training steps to capture.

    Call ``tick(step)`` once per training step.
    """

    def __init__(self) -> None:
        self.log_dir = os.environ.get("PLBERT_PROFILE_DIR", "")
        self.start = int(os.environ.get("PLBERT_PROFILE_START", "10"))
        self.steps = int(os.environ.get("PLBERT_PROFILE_STEPS", "5"))
        self._active = False
        self._done = False

    def tick(self, step: int) -> None:
        if not self.log_dir or self._done:
            return
        if not self._active and self.start <= step < self.start + self.steps:
            # strictly inside the window: a resumed run whose first tick
            # already jumped PAST it must capture nothing rather than a
            # 1-step trace at an arbitrary step
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step >= self.start + self.steps:
            self._done = True
            if self._active:
                jax.profiler.stop_trace()
                self._active = False
                print(f"[profiler] trace written to {self.log_dir}", flush=True)

    def close(self) -> None:
        """Stop an open window (training ended/crashed inside it) —
        jax writes the trace files only on stop, so skipping this
        silently discards the capture. Trainer.train() calls it on the
        way out."""
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            print(f"[profiler] trace written to {self.log_dir}", flush=True)
