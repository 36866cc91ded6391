"""Bandwidth-lean dropout for big NHWC activation tensors.

flax's ``nn.Dropout`` draws fp32 uniforms (``random.bernoulli``): on the
CIFAR train step that materializes ~1.9 GB of fp32 random numbers per step
before the compare, costing ~6 ms of the 176 ms step (round-2 trace:
rng-bit-generator + lt fusions). This variant draws uint16 bits and
compares against an integer threshold — half the RNG traffic, no
float conversion — with keep probability quantized to 1/65536 (for the
reference recipe's rate 0.13 the realized keep probability differs from
exact by 5e-6, far below run-to-run sampling noise).

The survivor scaling ``x / keep_prob`` uses the EXACT configured rate, so
expected magnitudes match the reference (torch.nn.Dropout) precisely; only
the Bernoulli granularity differs. Mask multiply runs in x.dtype — the
fp32 residual island stays fp32 (reference networks.py:255-258).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout_threshold(rate: float) -> int:
    """uint16 keep threshold for ``rate``; 65536 means 'keep everything'."""
    return int(round((1.0 - rate) * 65536.0))


def dropout_bits(rng: jax.Array, shape) -> jnp.ndarray:
    """The uint16 random bits backing a dropout mask. Drawn separately so
    callers can draw them OUTSIDE a jax.checkpoint region: as an argument
    they become a saved residual, and the backward pass re-applies the mask
    instead of re-running the RNG (bits are half the bytes of the fp32
    tensor they mask; regenerating them doubled rng-bit-generator time to
    3.2 ms/step — BENCH.md round 2)."""
    return jax.random.bits(rng, shape, dtype=jnp.uint16)


def apply_dropout_bits(bits: jnp.ndarray, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Apply a uint16-threshold dropout mask; semantics of nn.Dropout(rate)."""
    keep_prob = 1.0 - rate
    threshold = dropout_threshold(rate)
    if threshold >= 65536:  # rate too small to represent: keep everything
        return x
    keep = bits < jnp.uint16(threshold)
    scale = jnp.asarray(1.0 / keep_prob, x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


def mp_dropout(rng: jax.Array, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Dropout with uint16-threshold masks; semantics of nn.Dropout(rate)."""
    if rate <= 0.0:
        return x
    return apply_dropout_bits(dropout_bits(rng, x.shape), x, rate)
