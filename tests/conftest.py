"""Test configuration: force the CPU backend with 8 virtual devices.

The axon sitecustomize registers a TPU PJRT plugin at interpreter startup
(before conftest runs), so env vars alone are not enough — we also override
jax's platform config before any backend is initialized. CPU gives exact
fp32 math for parity tests; the 8 virtual devices serve the sharding tests.
"""

import os
import sys
from pathlib import Path

os.environ["POCKET_TTS_OFFLINE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"

sys.path.insert(0, str(Path(__file__).parent.parent))
