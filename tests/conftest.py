"""Test config: force the CPU backend with 8 virtual devices.

Tests never touch the real TPU chip (SURVEY.md §4.2): the CPU backend with
``--xla_force_host_platform_device_count=8`` gives a virtual 8-device mesh so
the multi-chip shard_map paths are exercised with the exact same code that
runs on a pod slice.

Gotcha: this environment's sitecustomize imports jax at interpreter startup
and pins ``JAX_PLATFORMS=axon`` (the remote-TPU tunnel), so env vars set here
are too late for jax's config snapshot — tests would silently run over the
tunnel's per-compile RPCs (~100x slower).  ``jax.config.update`` after import
is the reliable override; XLA_FLAGS still works because no backend has been
initialized yet at conftest time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
