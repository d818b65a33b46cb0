"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; per SURVEY §4 the multi-device
tests run against XLA's host-platform device emulation. Must run before the
first ``import jax`` anywhere in the test process.
"""

import os

# Force CPU even if the ambient environment points JAX at a TPU tunnel —
# tests must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# keep test numerics deterministic/f32 for parity gates
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
