"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; per SURVEY §4 the multi-device
tests run against XLA's host-platform device emulation. The environment's
sitecustomize imports jax at interpreter startup (with JAX_PLATFORMS=axon),
so plain env-var setting is too late — but backend *initialization* is lazy,
so jax.config.update before the first jax.devices() still selects CPU.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the suite is dominated by XLA compiles of
# tiny models; repeat runs hit the cache
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
