"""Structural typing for the pluggable pieces (reference: edm.py:16-61).

The reference defines Protocols for diffuser/embedding/denoiser/solver so
users can swap implementations; these are the functional-JAX equivalents
(explicit rng / params instead of module state).
"""

from __future__ import annotations

from typing import Optional, Protocol, runtime_checkable

import jax
import jax.numpy as jnp


@runtime_checkable
class EDMDiffuser(Protocol):
    """clean image + rng -> (noisy image, per-sample sigma)."""

    def __call__(
        self, rng: jax.Array, clean_image: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]: ...


@runtime_checkable
class EDMEmbedding(Protocol):
    """sigma (+ optional class labels) -> (fourier_embedding, embedding)."""

    embedding_dim: int
    fourier_dim: int
    num_classes: Optional[int]


@runtime_checkable
class EDMDenoiser(Protocol):
    """noisy image + sigma + embedding -> denoised image."""

    sigma_data: float


@runtime_checkable
class EDMSolver(Protocol):
    """denoise_fn + noise (+ optional labels) -> final sample."""

    def solve(
        self, denoise_fn, x0: jnp.ndarray, class_labels: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray: ...
