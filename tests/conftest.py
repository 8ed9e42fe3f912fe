"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices (no multi-chip TPU
hardware in CI); kernels are written for TPU and also run on the real chip
via bench.py.
"""

import os

# force CPU: the ambient env sets JAX_PLATFORMS=axon (remote TPU tunnel),
# which would send every test compile through the remote compiler
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# keep the fused Pallas plan covered (interpret mode on CPU); the
# production default is opt-in — see knoxdb_tpu/config.use_pallas
os.environ.setdefault("KNOX_PALLAS", "1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)
