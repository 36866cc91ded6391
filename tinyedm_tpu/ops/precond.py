"""EDM preconditioning coefficients (Karras et al. 2022, Table 1).

Pure-function equivalents of the inline preconditioning in the reference
Denoiser (src/tinyedm/networks.py:578-581) and DenoiserWrapper
(networks.py:638-642). Always computed in float32; sigma arrives as a
per-sample vector ``(B,)`` and the coefficients broadcast over NHWC images as
``(B, 1, 1, 1)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PrecondCoeffs(NamedTuple):
    c_skip: jnp.ndarray
    c_out: jnp.ndarray
    c_in: jnp.ndarray
    c_noise: jnp.ndarray


def edm_precond(sigma: jnp.ndarray, sigma_data: float) -> PrecondCoeffs:
    """c_skip/c_out/c_in/c_noise for denoiser D(x;sigma) = c_skip*x + c_out*F(c_in*x).

    sigma: (B,) noise levels. Returns coefficients shaped (B, 1, 1, 1) except
    c_noise which stays (B,) (it feeds the Fourier embedding).
    """
    sigma = sigma.astype(jnp.float32)
    sd2 = jnp.float32(sigma_data) ** 2
    s2 = sigma**2
    c_skip = sd2 / (s2 + sd2)
    c_out = sigma * jnp.float32(sigma_data) / jnp.sqrt(s2 + sd2)
    c_in = 1.0 / jnp.sqrt(sd2 + s2)
    c_noise = jnp.log(sigma) / 4.0
    bcast = lambda c: c.reshape(c.shape + (1, 1, 1))
    return PrecondCoeffs(bcast(c_skip), bcast(c_out), bcast(c_in), c_noise)


def edm_loss_weight(sigma: jnp.ndarray, sigma_data: float) -> jnp.ndarray:
    """EDM loss weight lambda(sigma) = (sigma^2 + sigma_d^2) / (sigma * sigma_d)^2.

    Reference: src/tinyedm/edm.py:212. Returns (B,) float32.
    """
    sigma = sigma.astype(jnp.float32)
    sd = jnp.float32(sigma_data)
    return (sigma**2 + sd**2) / (sigma * sd) ** 2
