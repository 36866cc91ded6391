"""TPU runtime knobs applied by the CLIs (not at library import, so tests
keep default CPU semantics)."""

from __future__ import annotations

import jax


def enable_fast_rng() -> None:
    """Use the RBG PRNG (hardware RNG path) instead of threefry.

    Measured on the CIFAR-10 35.6M recipe (v5e, batch 256): threefry dropout
    masks cost 99 ms of a 271 ms step; RBG brings the step to 186 ms (+46%
    throughput). Trade-off: RBG keys are not stable across topology changes —
    acceptable for dropout/noise sampling; checkpoints do not store raw keys.
    """
    jax.config.update("jax_default_prng_impl", "rbg")


def enable_compilation_cache(path: str = "/tmp/tinyedm_tpu_jax_cache") -> None:
    """Persistent XLA compilation cache — first run pays the compiles
    (~100 s for the 35.6M train step over the device tunnel), later runs
    start in seconds."""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def tune_for_tpu() -> None:
    if jax.default_backend() == "tpu":
        enable_fast_rng()
    enable_compilation_cache()
