"""Python client for the serving HTTP API.

Thin stdlib-urllib wrapper so downstream consumers (e.g. a StyleTTS
fine-tune loop reading contextual embeddings from a shared PL-BERT
server — the reference's consumption contract, reference:
README.md:40-47, but online instead of offline .npz files) don't
hand-roll JSON/HTTP:

    client = ServingClient("http://127.0.0.1:8787")
    hidden, length = client.encode("mrhba balʕalm")   # [length, H] fp32
    results = client.encode(["ab", "qlm"])            # list in, list out

Overload (the server's 503 backpressure signal, see batcher.py) raises
:class:`ServerOverloaded` carrying ``retry_after_s`` so callers can
back off; other HTTP errors raise :class:`ServingError` with the
server's JSON error message.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import numpy as np


class ServingError(RuntimeError):
    """Non-2xx response from the serving API (message = server error)."""

    def __init__(self, status: int, message: str) -> None:
        super().__init__(f"HTTP {status}: {message}")
        self.status = status


class ServerOverloaded(ServingError):
    """503 backpressure: the server's request queue is at capacity.
    Retry after ``retry_after_s`` (the Retry-After header, default 1)."""

    def __init__(self, message: str, retry_after_s: float) -> None:
        super().__init__(503, message)
        self.retry_after_s = retry_after_s


class ServingClient:
    def __init__(self, base_url: str, timeout_s: float = 60.0) -> None:
        self.base_url = base_url.rstrip("/")
        self.timeout_s = timeout_s

    # --- plumbing -----------------------------------------------------------
    def _request(self, path: str, payload: dict | None = None) -> dict:
        if payload is None:
            req = urllib.request.Request(self.base_url + path)
        else:
            req = urllib.request.Request(
                self.base_url + path,
                data=json.dumps(payload).encode("utf-8"),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:
            try:
                message = json.loads(e.read()).get("error", "")
            except (ValueError, AttributeError):
                message = str(e)
            if e.code == 503:
                retry_after = float(e.headers.get("Retry-After", 1) or 1)
                raise ServerOverloaded(message, retry_after) from None
            raise ServingError(e.code, message) from None

    # --- API ----------------------------------------------------------------
    def encode(
        self, phonemes: str | list[str], round_decimals: int | None = None
    ):
        """One phoneme string → ``(hidden [length, H] fp32, length)``;
        a list → a list of such tuples (the members batch together
        server-side). ``round_decimals`` shrinks the JSON payload."""
        payload: dict = {"phonemes": phonemes}
        if round_decimals is not None:
            payload["round"] = round_decimals
        body = self._request("/encode", payload)
        unpack = lambda r: (
            np.asarray(r["hidden"], np.float32), int(r["length"])
        )
        if isinstance(phonemes, str):
            return unpack(body)
        return [unpack(r) for r in body["results"]]

    def healthz(self) -> dict:
        """Liveness + model shape (hidden_size, buckets, ...)."""
        return self._request("/healthz")

    def stats(self) -> dict:
        """Batching counters + latency percentiles (see batcher.stats)."""
        return self._request("/stats")
