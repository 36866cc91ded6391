"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-idiomatic fake backend (SURVEY.md §4): multi-device sharding,
psum'd metrics, and EMA-under-sharding are all testable without hardware via
``--xla_force_host_platform_device_count``. The environment ships an 'axon'
TPU-tunnel plugin that overrides JAX_PLATFORMS, so we also force the config
after import — before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache for the CPU test backend: the suite is
# compile-dominated (one jit-heavy file costs ~6 min cold on this box),
# and re-runs hit the same traced programs.
jax.config.update("jax_compilation_cache_dir", "/tmp/tinyedm_tpu_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
