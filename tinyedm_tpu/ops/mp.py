"""Magnitude-preserving primitives (EDM2, Karras et al. 2023).

TPU-native re-implementation of the reference's MP math
(reference: src/tinyedm/networks.py:9-88). All reductions that decide
normalization magnitudes run in float32 regardless of the compute dtype —
these are the "fp32 islands" the reference enforces via explicit fp32 norm
computation (networks.py:10) and autocast-disabled regions.

Everything here is a pure function on jnp arrays; XLA fuses these into the
surrounding matmuls/convs, so no Pallas kernel is needed for them.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.nn
import jax.numpy as jnp

# silu(x)/0.596 preserves unit variance for unit-variance input
# (reference: networks.py:83-84).
_MP_SILU_SCALE = 1.0 / 0.596


def _pixel_norm_raw(x: jnp.ndarray, axis: tuple, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=axis, keepdims=True))
    reduced = math.prod(x.shape[a] for a in axis)
    denom = eps + norm * (1.0 / math.sqrt(reduced))
    return x / denom.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _pixel_norm_cvjp(x: jnp.ndarray, axis: tuple, eps: float) -> jnp.ndarray:
    return _pixel_norm_raw(x, axis, eps)


def _pixel_norm_fwd(x, axis, eps):
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=axis, keepdims=True))
    reduced = math.prod(x.shape[a] for a in axis)
    denom = eps + norm * (1.0 / math.sqrt(reduced))
    # residuals: the ORIGINAL-dtype tensor + the reduced-shape norms — XLA's
    # autodiff instead stores the fp32 upcast of x (2x the bytes for bf16
    # activations; 268 MB per 32x32 CIFAR tensor)
    return x / denom.astype(x.dtype), (x, norm, denom)


def _pixel_norm_bwd(axis, eps, res, g):
    x, norm, denom = res
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    d_cast = denom.astype(x.dtype).astype(jnp.float32)  # the rounded divisor
    reduced = math.prod(x.shape[a] for a in axis)
    c = 1.0 / math.sqrt(reduced)
    inner = jnp.sum(g32 * x32, axis=axis, keepdims=True)
    dx = g32 / d_cast - x32 * (
        inner * c / (d_cast * d_cast * jnp.maximum(norm, 1e-30))
    )
    return (dx.astype(x.dtype),)


_pixel_norm_cvjp.defvjp(_pixel_norm_fwd, _pixel_norm_bwd)


def pixel_norm(x: jnp.ndarray, axis: int | Sequence[int] = -1, eps: float = 1e-4) -> jnp.ndarray:
    """Normalize ``x`` to unit RMS over ``axis``.

    Matches the reference pixel_norm (networks.py:9-14): the L2 norm over the
    reduced axes is computed in float32, scaled by ``1/sqrt(prod(reduced dims))``
    (turning it into an RMS), offset by ``eps``, and divides ``x`` in ``x.dtype``.

    Differentiation goes through a custom VJP with the exact quotient-rule
    math (same values as autodiff to fp32 rounding) whose residuals are the
    original-dtype input plus the reduced-shape norms — not the fp32 upcast
    tensor XLA's autodiff would store.
    """
    if isinstance(axis, int):
        axis = (axis,)
    axis = tuple(a % x.ndim for a in axis)
    return _pixel_norm_cvjp(x, axis, eps)


def normalize(x: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """pixel_norm over all non-leading axes (reference: networks.py:17-19).

    Used for weight normalization where axis 0 indexes output units.
    """
    return pixel_norm(x, axis=tuple(range(1, x.ndim)), eps=eps)


def weight_normalize(w: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Per-output-unit unit-RMS normalization for stored weights.

    Layout convention (this framework, TPU-native):
      - 2D ``(out, in)`` linear weights: normalize over axis 1.
      - 4D ``(kh, kw, in, out)`` HWIO conv weights: normalize over axes (0, 1, 2)
        — output channels live on the last (lane) axis for MXU-friendly layout.

    Semantically identical to the reference's ``normalize(weight)`` on
    ``(out, in, kh, kw)`` torch weights (networks.py:31-37, 54-60).
    """
    if w.ndim == 2:
        return pixel_norm(w, axis=(1,), eps=eps)
    if w.ndim == 4:
        return pixel_norm(w, axis=(0, 1, 2), eps=eps)
    raise ValueError(f"weight_normalize expects 2D or 4D weight, got shape {w.shape}")


def mp_silu(x: jnp.ndarray) -> jnp.ndarray:
    """Magnitude-preserving SiLU (reference: networks.py:83-84)."""
    return jax.nn.silu(x) * jnp.asarray(_MP_SILU_SCALE, dtype=x.dtype)


def mp_add(a: jnp.ndarray, b: jnp.ndarray, t: float = 0.5) -> jnp.ndarray:
    """Magnitude-preserving interpolation (reference: networks.py:87-88).

    ``lerp(a, b, t) / sqrt((1-t)^2 + t^2)``.
    """
    scale = 1.0 / math.sqrt((1.0 - t) ** 2 + t**2)
    t_ = jnp.asarray(t, dtype=a.dtype)
    s_ = jnp.asarray(scale, dtype=a.dtype)
    return (a + (b - a) * t_) * s_


def mp_cat(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1, t: float = 0.5) -> jnp.ndarray:
    """Magnitude-preserving concatenation (EDM2 paper eq. 103; unused by the
    reference topologies but part of the MP toolbox)."""
    na = a.shape[axis]
    nb = b.shape[axis]
    scale = math.sqrt((na + nb) / ((1.0 - t) ** 2 + t**2))
    wa = scale * (1.0 - t) / math.sqrt(na)
    wb = scale * t / math.sqrt(nb)
    return jnp.concatenate(
        [a * jnp.asarray(wa, a.dtype), b * jnp.asarray(wb, b.dtype)], axis=axis
    )
