"""LR schedule: linear rampup -> steady -> inverse-sqrt decay.

Reference: src/tinyedm/edm.py:305-320 (LambdaLR). ``count`` is the scheduler
tick — optimizer steps when scheduler_interval == "step", epochs when
"epoch" (conf/cifar10.yaml uses epoch, conf/imagenet.yaml uses step).
Implemented branch-free so it can run inside the jitted train step.
"""

from __future__ import annotations

import jax.numpy as jnp


def edm_lr_multiplier(count: jnp.ndarray, rampup_steps: int, steady_steps: int) -> jnp.ndarray:
    count = jnp.asarray(count, jnp.float32)
    rampup = jnp.float32(max(rampup_steps, 1))
    steady = jnp.float32(max(steady_steps, 1))
    ramp = 1e-8 + (1.0 - 1e-8) * count / rampup
    decay_step = count - rampup_steps - steady_steps
    decay = 1.0 / jnp.sqrt(1.0 + decay_step / steady)
    out = jnp.where(count < rampup_steps, ramp, 1.0)
    return jnp.where(count < rampup_steps + steady_steps, out, decay)


def make_lr_fn(lr: float, rampup_steps: int, steady_steps: int):
    """Returns count -> learning rate, usable as an optax schedule."""

    def fn(count):
        return lr * edm_lr_multiplier(count, rampup_steps, steady_steps)

    return fn
