"""Power-function EMA (Karras et al. 2023, "post-hoc EMA") — TPU-native.

The reference wraps the optimizer (EMAOptimizer, src/tinyedm/ema.py:160-348)
and updates EMA weights asynchronously on a CUDA stream / CPU thread. On TPU
none of that machinery is needed: the EMA update is a pure tree-map fused into
the jitted train step (SURVEY.md §2.2) — zero extra launches, zero threads,
no synchronization hazards.

Math parity with the reference:
  * sigma_rel -> gamma by the max real root of
    g^3 + 7g^2 + (16 - sr^-2) g + (12 - sr^-2) = 0   (ema.py:29-32)
  * decay_t = (1 - 1/(t+1))^(gamma+1)                 (ema.py:273)
  * ema <- decay * ema + (1 - decay) * theta          (ema.py:127-140)
  * update every ``every_n_steps`` checked on the pre-increment step counter
    (ema.py:257-259), so step 0 gives decay 0 => ema bootstraps to theta.

Extension beyond the reference (its README lists post-hoc EMA as unchecked):
``solve_posthoc_weights`` synthesizes an arbitrary-sigma_rel EMA from several
tracked profiles by least squares over the power-EMA inner products (EDM2
paper, Algorithm 3) — the state supports a *list* of EMA trees from day one.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

MAX_SIGMA_REL = 0.2886  # reference validation bound (ema.py:56-59)


def sigma_rel_to_gamma(sigma_rel: float) -> float:
    """Max real root of the cubic relating sigma_rel to the power-EMA exponent."""
    # the reference validates 0 <= ema_length (ema.py:56-59) but 0 is not in
    # the cubic's domain (sigma_rel**-2 divides by zero there, in torch too);
    # reject it with the real reason instead of a ZeroDivisionError
    if not (0.0 < sigma_rel <= MAX_SIGMA_REL):
        raise ValueError(
            f"EMA length (sigma_rel) must be within (0, {MAX_SIGMA_REL}], got {sigma_rel}"
        )
    t = sigma_rel ** -2
    roots = np.roots([1.0, 7.0, 16.0 - t, 12.0 - t])
    return float(roots.real.max())


def gamma_to_sigma_rel(gamma: float) -> float:
    """Inverse of sigma_rel_to_gamma, from the defining cubic:
    g^3 + 7g^2 + (16 - t)g + (12 - t) = 0 with t = sigma_rel^-2
    =>  t = (g^3 + 7g^2 + 16g + 12) / (g + 1)."""
    g = float(gamma)
    t = (g**3 + 7 * g**2 + 16 * g + 12) / (g + 1)
    return float(1.0 / np.sqrt(t))


def power_ema_decay(step: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """decay = (1 - 1/(step+1))^(gamma+1); step is the pre-increment counter."""
    step = jnp.asarray(step, jnp.float32)
    return (1.0 - 1.0 / (step + 1.0)) ** (jnp.float32(gamma) + 1.0)


def ema_update(ema_params: Any, params: Any, decay: jnp.ndarray) -> Any:
    """ema <- decay * ema + (1 - decay) * params, elementwise over the tree."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema_params, params
    )


def maybe_ema_update(
    ema_params: Any, params: Any, step: jnp.ndarray, gamma: float, every_n_steps: int = 1
) -> Any:
    """Apply the power-EMA update when step % every_n_steps == 0 (else identity).

    Matches EMAOptimizer.step ordering: the check and the decay both use the
    pre-increment step value (ema.py:255-259, 273).
    """
    decay = power_ema_decay(step, gamma)
    if every_n_steps <= 1:
        return ema_update(ema_params, params, decay)
    do = (jnp.asarray(step, jnp.int32) % every_n_steps) == 0
    new = ema_update(ema_params, params, decay)
    return jax.tree_util.tree_map(
        lambda n, e: jnp.where(do, n, e), new, ema_params
    )


@dataclasses.dataclass(frozen=True)
class EMAConfig:
    """One or more tracked EMA profiles. ``sigma_rels`` longer than 1 enables
    post-hoc reconstruction of arbitrary profiles at checkpoint time."""

    sigma_rels: tuple[float, ...] = (0.13,)
    every_n_steps: int = 1

    @property
    def gammas(self) -> tuple[float, ...]:
        return tuple(sigma_rel_to_gamma(sr) for sr in self.sigma_rels)


# ---------------------------------------------------------------------------
# Post-hoc EMA reconstruction (EDM2 paper, Algorithm 3)
# ---------------------------------------------------------------------------


def _p_dot_p(t_a, gamma_a, t_b, gamma_b):
    """Inner product <p_a, p_b> of two power-EMA response profiles."""
    t_ratio = t_a / t_b
    t_exp = np.where(t_a < t_b, gamma_b, -gamma_a)
    t_max = np.maximum(t_a, t_b)
    num = (gamma_a + 1) * (gamma_b + 1) * t_ratio**t_exp
    den = (gamma_a + gamma_b + 1) * t_max
    return num / den


def solve_posthoc_weights(
    snapshot_steps: Sequence[int],
    snapshot_gammas: Sequence[float],
    target_step: int,
    target_gamma: float,
) -> np.ndarray:
    """Least-squares weights w_i so that sum_i w_i * ema_i approximates the
    EMA with ``target_gamma`` evaluated at ``target_step``.

    snapshot i is the EMA with exponent snapshot_gammas[i] saved at training
    step snapshot_steps[i]. Steps are 1-indexed time (pass step+1).
    """
    t_i = np.asarray(snapshot_steps, np.float64).reshape(-1, 1)
    g_i = np.asarray(snapshot_gammas, np.float64).reshape(-1, 1)
    t_r = np.asarray([target_step], np.float64).reshape(1, -1)
    g_r = np.asarray([target_gamma], np.float64).reshape(1, -1)
    a = _p_dot_p(t_i, g_i, t_i.T, g_i.T)
    b = _p_dot_p(t_i, g_i, t_r, g_r)
    return np.linalg.solve(a, b).reshape(-1)


def reconstruct_posthoc_ema(
    snapshots: Sequence[Any],
    snapshot_steps: Sequence[int],
    snapshot_gammas: Sequence[float],
    target_sigma_rel: float,
    target_step: int | None = None,
) -> Any:
    """Combine stored EMA snapshots into the EMA a training run with
    ``target_sigma_rel`` would have produced. ``snapshots`` are parameter
    pytrees; returns the combined pytree."""
    if target_step is None:
        target_step = max(snapshot_steps)
    w = solve_posthoc_weights(
        [s + 1 for s in snapshot_steps],
        snapshot_gammas,
        target_step + 1,
        sigma_rel_to_gamma(target_sigma_rel),
    )
    out = jax.tree_util.tree_map(lambda x: x * w[0], snapshots[0])
    for wi, snap in zip(w[1:], snapshots[1:]):
        out = jax.tree_util.tree_map(lambda o, s, wi=wi: o + s * wi, out, snap)
    return out
