"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-idiomatic fake backend (SURVEY.md §4): multi-device sharding,
psum'd metrics, and EMA-under-sharding are all testable without hardware via
``--xla_force_host_platform_device_count``. Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
