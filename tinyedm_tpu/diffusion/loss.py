"""Weighted MSE loss + cross-device metric accumulation.

Replaces the reference's torchmetrics WeightedMeanSquaredError
(src/tinyedm/metric.py:8-54): the per-batch update is a pure function, and
the cross-rank ``dist_reduce_fx="sum"`` semantics become a ``lax.psum``
inside the pjit-ed step (or an implicit XLA all-reduce under sharding).
The differentiable batch value doubles as the training loss, exactly as the
reference uses the metric object directly (edm.py:217,228).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


def weighted_sum_squared_error(
    weight: jnp.ndarray, preds: jnp.ndarray, target: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """sum_b mean_pixels(w_b * (pred_b - target_b)^2), and the batch count.

    Reference: metric.py:8-19. All math fp32.
    """
    n = preds.shape[0]
    preds = preds.reshape(n, -1).astype(jnp.float32)
    target = target.reshape(n, -1).astype(jnp.float32)
    weight = weight.reshape(n, 1).astype(jnp.float32)
    diff = preds - target
    per_sample = jnp.mean(weight * diff * diff, axis=1)
    return jnp.sum(per_sample), jnp.asarray(n, jnp.float32)


def weighted_mse(
    weight: jnp.ndarray, preds: jnp.ndarray, target: jnp.ndarray
) -> jnp.ndarray:
    """Batch-mean weighted MSE — the differentiable training loss."""
    sse, n = weighted_sum_squared_error(weight, preds, target)
    return sse / n


class WeightedMeanSquaredError(NamedTuple):
    """Running metric state; a pytree so it lives in device memory and crosses
    pjit boundaries. Accumulate with ``.update``, read with ``.compute``.

    Under data-parallel sharding, accumulate per-shard sums and psum at read
    time (or rely on XLA's reduction when the state is replicated).
    """

    sum_sse: jnp.ndarray  # scalar fp32
    total: jnp.ndarray  # scalar fp32

    @classmethod
    def create(cls) -> "WeightedMeanSquaredError":
        return cls(jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))

    def update(
        self, weight: jnp.ndarray, preds: jnp.ndarray, target: jnp.ndarray
    ) -> "WeightedMeanSquaredError":
        sse, n = weighted_sum_squared_error(weight, preds, target)
        return WeightedMeanSquaredError(self.sum_sse + sse, self.total + n)

    def merge(self, other: "WeightedMeanSquaredError") -> "WeightedMeanSquaredError":
        return WeightedMeanSquaredError(
            self.sum_sse + other.sum_sse, self.total + other.total
        )

    def compute(self) -> jnp.ndarray:
        return self.sum_sse / jnp.maximum(self.total, 1.0)


def edm_training_loss(
    weight: jnp.ndarray,
    denoised: jnp.ndarray,
    clean: jnp.ndarray,
    uncertainty: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """EDM loss, optionally uncertainty-weighted (reference: edm.py:212-228).

    Without uncertainty: mse(lambda, D, x).
    With uncertainty u:  mse(lambda / exp(u), D, x) + mean(u).
    Returns (loss, metrics_dict) where metrics carry the raw (sse, count) pair
    for exact cross-device averaging.
    """
    metrics: dict[str, jnp.ndarray] = {}
    if uncertainty is not None:
        u = uncertainty.astype(jnp.float32)
        eff_weight = weight / jnp.exp(u)
        sse, n = weighted_sum_squared_error(eff_weight, denoised, clean)
        u_mean = jnp.mean(u)
        loss = sse / n + u_mean
        metrics["uncertainty"] = u_mean
    else:
        sse, n = weighted_sum_squared_error(weight, denoised, clean)
        loss = sse / n
    metrics["sse"] = sse
    metrics["count"] = n
    return loss, metrics
