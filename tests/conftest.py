"""Test harness: run JAX on an 8-device virtual CPU mesh.

Must set the env vars before jax initializes (mirrors the reference's
lack of a fake distributed backend — this IS our fake backend, per
SURVEY.md §4).
"""

import os
import sys

# PLBERT_TPU_TESTS=1 leaves the real backend attached so
# tests/test_tpu_hardware.py can actually run on the chip (everything
# else in the suite still passes there, just slower); default is the
# virtual 8-device CPU mesh.
_ON_TPU = os.environ.get("PLBERT_TPU_TESTS") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize hook registers the real-TPU backend at
# interpreter startup and pins jax_platforms to it, silently overriding
# the env var — force the config back so tests really run on the
# virtual 8-device CPU mesh.
import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
