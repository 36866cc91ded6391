"""Forward-noising diffuser (reference: src/tinyedm/edm.py:64-96).

Samples per-sample noise levels ``ln(sigma) ~ N(P_mean, P_std)`` and returns
``(clean + sigma * n, sigma)``. Pure function of an explicit PRNG key —
no hidden RNG state; runs inside the jitted train step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Diffuser:
    P_mean: float = -1.2
    P_std: float = 1.2

    def __call__(
        self, rng: jax.Array, clean_image: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """clean_image: (B, H, W, C). Returns (noisy fp32, sigma (B,) fp32)."""
        k_sigma, k_noise = jax.random.split(rng)
        b = clean_image.shape[0]
        eps = jax.random.normal(k_sigma, (b,), dtype=jnp.float32)
        sigma = jnp.exp(self.P_mean + eps * self.P_std)
        noise = jax.random.normal(k_noise, clean_image.shape, dtype=jnp.float32)
        noisy = clean_image.astype(jnp.float32) + noise * sigma.reshape(-1, 1, 1, 1)
        return noisy, sigma
