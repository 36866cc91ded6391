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
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]], jnp.ndarray]


def karras_sigma_schedule(
    num_steps: int, sigma_min: float, sigma_max: float, rho: float
) -> np.ndarray:
    """t_i = (sigma_max^(1/rho) + i/(n-1) * (sigma_min^(1/rho) - sigma_max^(1/rho)))^rho,
    with a trailing 0 (reference: solvers.py:34-41). Computed and RETURNED in
    fp64 on host; consumers cast to the solver's state dtype at jit entry."""
    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps}")
    if num_steps == 1:
        # the i/(n-1) interpolation is 0/0 at n=1 (the reference NaNs here,
        # solvers.py:34-41); the well-defined one-step schedule is
        # [sigma_max, 0] — a single Euler step from pure noise
        return np.asarray([sigma_max, 0.0], np.float64)
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
        # accept both the CLI's string spelling and an actual dtype (the
        # config registry's instantiate converts any `dtype:` field to a
        # jnp dtype class before construction, so YAML-built solvers arrive
        # with jnp.bfloat16 etc., not "bfloat16")
        d = self.dtype
        if d is not None and not isinstance(d, str):
            d = np.dtype(d).name  # ml_dtypes registers bfloat16 with numpy
        if d is None or d == "float32":
            return jnp.float32
        if d == "bfloat16":
            return jnp.bfloat16
        if d == "float64":
            if not jax.config.jax_enable_x64:
                raise ValueError(
                    "solver dtype float64 requires jax_enable_x64 "
                    "(JAX silently downcasts otherwise): "
                    "jax.config.update('jax_enable_x64', True)"
                )
            return jnp.float64
        if d == "float16":
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
        the solver dtype (reference quirk preserved: solvers.py:59 returns in
        the loop-carried dtype).

        The scan iterates over 2*num_steps - 1 HALF-steps — alternating Euler
        predictions and Heun corrections — so the scan body traces the model
        exactly once (a two-call body doubles compile time and XLA program
        size for zero runtime benefit; the reference's python loop has no
        such concern). The final half-step is the trailing Euler to sigma=0
        (its t1=0 makes x_next = D exactly; no correction, solvers.py:52).
        """
        dtype = self.jnp_dtype
        b = x0.shape[0]
        n = self.num_steps
        t = self.t_steps  # host fp64

        # per-half-step tables: k = 2i (+1): predict at t[i] / correct at t[i+1]
        sig, tt0, tt1, phase = [], [], [], []
        for i in range(n):
            sig.append(t[i])       # predict evaluates D at sigma = t[i]
            tt0.append(t[i]); tt1.append(t[i + 1]); phase.append(0)
            if i < n - 1:
                sig.append(t[i + 1])  # correct evaluates D at sigma = t[i+1]
                tt0.append(t[i]); tt1.append(t[i + 1]); phase.append(1)
        tables = (
            jnp.asarray(sig, dtype),
            jnp.asarray(tt0, dtype),
            jnp.asarray(tt1, dtype),
            jnp.asarray(phase, jnp.int32),
        )

        x = x0.astype(dtype) * jnp.asarray(t[0], dtype)

        def half_step(carry, inp):
            x_cur, x_base, dx_base = carry
            sigma_t, t0, t1, ph = inp
            sigma = jnp.full((b,), sigma_t, dtype=jnp.float32)
            d = denoise_fn(x_cur, sigma, class_labels).astype(dtype)
            dx = (x_cur - d) / sigma_t.astype(dtype)
            x_pred = x_cur + (t1 - t0) * dx                      # Euler predict
            x_corr = x_base + (t1 - t0) * 0.5 * (dx_base + dx)   # Heun correct
            is_predict = ph == 0
            x_next = jnp.where(is_predict, x_pred, x_corr)
            # after predict: remember the base point + its slope for the
            # upcoming correction; after correct: the new point is the base
            x_base = jnp.where(is_predict, x_cur, x_next)
            return (x_next, x_base, dx), ()

        init = (x, x, jnp.zeros_like(x))
        (x, _, _), _ = jax.lax.scan(half_step, init, tables)
        return x


@dataclasses.dataclass(frozen=True)
class MultistepSolver:
    """DPM-Solver++(2M) (Lu et al. 2022, "DPM-Solver++: Fast Solver for
    Guided Sampling of Diffusion Probabilistic Models"), data-prediction
    multistep form specialized to EDM's sigma(t)=t, s(t)=1 parameterization.

    Beyond the reference (which ships only Heun): ONE model forward per step
    — a second-order multistep correction reuses the previous step's
    denoised output instead of re-evaluating, so n steps cost n forwards vs
    Heun's 2n-1 for comparable order-2 accuracy. The update in log-sigma
    time (lambda = -ln sigma, h_i = lambda_{i+1} - lambda_i):

        D_hat_i = (1 + 1/(2 r_i)) D_i - 1/(2 r_i) D_{i-1},  r_i = h_{i-1}/h_i
        x_{i+1} = (sigma_{i+1}/sigma_i) x_i - expm1(-h_i) D_hat_i

    with a first-order step (D_hat = D) at i=0 and at the final step to
    sigma=0 (where the update degenerates to x = D exactly: ratio -> 0,
    -expm1(-h) -> 1). All coefficients are precomputed on host in fp64 and
    scanned as tables — the scan body traces the model once, mirroring
    DeterministicSolver's half-step design.
    """

    num_steps: int = 18
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    dtype: Optional[str] = None

    @property
    def jnp_dtype(self):
        return DeterministicSolver(dtype=self.dtype).jnp_dtype

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
        dtype = self.jnp_dtype
        b = x0.shape[0]
        n = self.num_steps
        t = self.t_steps  # (n+1,) host fp64, trailing 0

        lam = -np.log(t[:-1])  # lambda_i for the n finite sigmas
        sig, ratio, phi, c1, c2 = [], [], [], [], []
        for i in range(n):
            s_cur, s_next = t[i], t[i + 1]
            sig.append(s_cur)
            if s_next == 0.0:
                # h -> inf: ratio 0, -expm1(-h) -> 1, first-order (x = D)
                ratio.append(0.0)
                phi.append(1.0)
                c1.append(1.0)
                c2.append(0.0)
                continue
            h = -np.log(s_next) - lam[i]
            ratio.append(s_next / s_cur)
            phi.append(-np.expm1(-h))
            if i == 0:
                c1.append(1.0)
                c2.append(0.0)
            else:
                r = (lam[i] - lam[i - 1]) / h
                c1.append(1.0 + 1.0 / (2.0 * r))
                c2.append(-1.0 / (2.0 * r))
        tables = (
            jnp.asarray(sig, dtype),
            jnp.asarray(ratio, dtype),
            jnp.asarray(phi, dtype),
            jnp.asarray(c1, dtype),
            jnp.asarray(c2, dtype),
        )

        x = x0.astype(dtype) * jnp.asarray(t[0], dtype)

        def step(carry, inp):
            x_cur, d_prev = carry
            sigma_t, ratio, phi, c1, c2 = inp
            sigma = jnp.full((b,), sigma_t, dtype=jnp.float32)
            d = denoise_fn(x_cur, sigma, class_labels).astype(dtype)
            d_hat = c1 * d + c2 * d_prev  # c2 = 0 on first/last steps
            x_next = ratio * x_cur + phi * d_hat
            return (x_next, d), ()

        init = (x, jnp.zeros_like(x))
        (x, _), _ = jax.lax.scan(step, init, tables)
        return x


@dataclasses.dataclass(frozen=True)
class StochasticSolver:
    """EDM stochastic sampler (Karras et al. 2022, Algorithm 2).

    Beyond the reference (which ships only the deterministic solver): per
    step, noise is first injected — t_hat = (1 + gamma_i) t_i with
    gamma_i = min(S_churn/N, sqrt(2)-1) when S_tmin <= t_i <= S_tmax else 0,
    x_hat = x + sqrt(t_hat^2 - t_i^2) * S_noise * eps — then a Heun step
    integrates from (x_hat, t_hat) to t_{i+1}. Same half-step lax.scan
    design as DeterministicSolver (one model trace).
    """

    num_steps: int = 18
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    S_churn: float = 0.0
    S_min: float = 0.0
    S_max: float = float("inf")
    S_noise: float = 1.0
    dtype: Optional[str] = None

    @property
    def jnp_dtype(self):
        return DeterministicSolver(dtype=self.dtype).jnp_dtype

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
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        if rng is None:
            if self.S_churn > 0:
                # a silent fixed default key would make every sampling call
                # (and every batch) reuse the identical churn-noise
                # realization — bitwise-repeated previews and correlated
                # noise across a whole FID run, with no warning
                raise ValueError(
                    "StochasticSolver with S_churn > 0 needs an explicit "
                    "rng key (solve(..., rng=jax.random.PRNGKey(...)))"
                )
            rng = jax.random.PRNGKey(0)  # churn 0: the key is never used
        dtype = self.jnp_dtype
        b = x0.shape[0]
        n = self.num_steps
        t = self.t_steps

        gamma_max = math.sqrt(2.0) - 1.0
        gamma = min(self.S_churn / n, gamma_max) if self.S_churn > 0 else 0.0

        sig, tt0, tt1, phase, churn = [], [], [], [], []
        for i in range(n):
            t_i = float(t[i])
            g = gamma if (self.S_min <= t_i <= self.S_max and t_i > 0) else 0.0
            t_hat = t_i * (1.0 + g)
            # predict half-step: inject churn noise, evaluate D at t_hat
            sig.append(t_hat)
            tt0.append(t_hat); tt1.append(t[i + 1]); phase.append(0)
            churn.append(math.sqrt(max(t_hat**2 - t_i**2, 0.0)) * self.S_noise)
            if i < n - 1:  # correct half-step: no churn
                sig.append(t[i + 1])
                tt0.append(t_hat); tt1.append(t[i + 1]); phase.append(1)
                churn.append(0.0)
        tables = (
            jnp.asarray(sig, dtype),
            jnp.asarray(tt0, dtype),
            jnp.asarray(tt1, dtype),
            jnp.asarray(phase, jnp.int32),
            jnp.asarray(churn, dtype),
        )

        x = x0.astype(dtype) * jnp.asarray(t[0], dtype)
        keys = jax.random.split(rng, len(sig))

        def half_step(carry, inp):
            x_cur, x_base, dx_base = carry
            sigma_t, t0, t1, ph, churn, key = inp
            is_predict = ph == 0
            if self.S_churn > 0:
                # draw churn noise only on predict half-steps: correction
                # steps have churn == 0 by construction, and XLA cannot DCE
                # a full-image threefry draw feeding a data-dependent add —
                # the cond halves the sampler's RNG work (and with churn
                # disabled no noise is drawn at all, trace-time branch)
                eps = jax.lax.cond(
                    is_predict,
                    lambda k: jax.random.normal(k, x_cur.shape, dtype),
                    lambda k: jnp.zeros(x_cur.shape, dtype),
                    key,
                )
                x_in = x_cur + churn * eps  # no-op on correct steps
            else:
                x_in = x_cur
            sigma = jnp.full((b,), sigma_t, dtype=jnp.float32)
            d = denoise_fn(x_in, sigma, class_labels).astype(dtype)
            dx = (x_in - d) / sigma_t.astype(dtype)
            x_pred = x_in + (t1 - t0) * dx
            x_corr = x_base + (t1 - t0) * 0.5 * (dx_base + dx)
            x_next = jnp.where(is_predict, x_pred, x_corr)
            x_base = jnp.where(is_predict, x_in, x_next)
            return (x_next, x_base, dx), ()

        init = (x, x, jnp.zeros_like(x))
        (x, _, _), _ = jax.lax.scan(half_step, init, tables + (keys,))
        return x
