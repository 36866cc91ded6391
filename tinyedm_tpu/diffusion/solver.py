"""Deterministic 2nd-order Heun ODE sampler (EDM Algorithm 1 with
sigma(t)=t, s(t)=1). Reference: src/tinyedm/solvers.py:4-59.

TPU-native design: the whole solve is a single ``lax.scan`` over the
precomputed sigma-pair array — ``num_steps - 1`` full Heun steps scanned,
plus one trailing Euler step (the reference's "skip the 2nd-order correction
on the final step", solvers.py:52). One jit, 2*num_steps - 1 model forwards,
fully on-device; no per-step host round-trips.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]], jnp.ndarray]


def karras_sigma_schedule(
    num_steps: int, sigma_min: float, sigma_max: float, rho: float
) -> np.ndarray:
    """t_i = (sigma_max^(1/rho) + i/(n-1) * (sigma_min^(1/rho) - sigma_max^(1/rho)))^rho,
    with a trailing 0 (reference: solvers.py:34-41). fp64 on host, then fp32."""
    i = np.arange(num_steps, dtype=np.float64)
    t = (
        sigma_max ** (1.0 / rho)
        + i / (num_steps - 1) * (sigma_min ** (1.0 / rho) - sigma_max ** (1.0 / rho))
    ) ** rho
    return np.concatenate([t, np.zeros(1)]).astype(np.float64)


@dataclasses.dataclass(frozen=True)
class DeterministicSolver:
    """Heun sampler. ``dtype`` controls the state/arithmetic precision of the
    ODE integration (the model keeps its own compute dtype)."""

    num_steps: int = 18
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    dtype: Optional[str] = None  # None | "float32" | "bfloat16" | "float64"

    @property
    def jnp_dtype(self):
        if self.dtype is None or self.dtype == "float32":
            return jnp.float32
        if self.dtype == "bfloat16":
            return jnp.bfloat16
        if self.dtype == "float64":
            return jnp.float64
        if self.dtype == "float16":
            return jnp.float16
        raise ValueError(f"unknown solver dtype {self.dtype!r}")

    @property
    def t_steps(self) -> np.ndarray:
        return karras_sigma_schedule(
            self.num_steps, self.sigma_min, self.sigma_max, self.rho
        )

    def solve(
        self,
        denoise_fn: DenoiseFn,
        x0: jnp.ndarray,
        class_labels: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Integrate the probability-flow ODE from sigma_max down to 0.

        denoise_fn(x, sigma_batch, class_labels) -> denoised image D(x; sigma).
        x0: standard normal noise (B, H, W, C). Returns the final sample in
        x0's dtype (reference quirk preserved: solvers.py:59 returns in the
        loop-carried dtype, which equals the solver dtype here).
        """
        dtype = self.jnp_dtype
        b = x0.shape[0]
        t = jnp.asarray(self.t_steps, dtype=dtype)
        x = x0.astype(dtype) * t[0]

        def denoise(x, t_scalar):
            sigma = jnp.full((b,), t_scalar, dtype=jnp.float32)
            return denoise_fn(x, sigma, class_labels).astype(dtype)

        def heun_step(x, t_pair):
            t0, t1 = t_pair[0], t_pair[1]
            d = denoise(x, t0)
            dx = (x - d) / t0
            x_euler = x + (t1 - t0) * dx
            d_prime = denoise(x_euler, t1)
            dx_prime = (x_euler - d_prime) / t1
            x_next = x + (t1 - t0) * (0.5 * dx + 0.5 * dx_prime)
            return x_next, ()

        # n-1 Heun steps via scan (sigma pairs are a static-shape array) ...
        pairs = jnp.stack([t[: self.num_steps - 1], t[1 : self.num_steps]], axis=1)
        x, _ = jax.lax.scan(heun_step, x, pairs)
        # ... and the final Euler step down to sigma = 0 (t1 = 0 => x = D).
        t0 = t[self.num_steps - 1]
        d = denoise(x, t0)
        x = x + (t[self.num_steps] - t0) * ((x - d) / t0)
        return x
