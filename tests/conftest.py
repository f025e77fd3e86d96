"""Test config: force the CPU backend with 8 virtual devices.

Tests never touch the real TPU chip (SURVEY.md §4.2): the CPU backend with
``--xla_force_host_platform_device_count=8`` gives a virtual 8-device mesh so
the multi-chip shard_map paths are exercised with the exact same code that
runs on a pod slice.  Must run before jax initializes its backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "0")
