"""Classifier-free guidance (beyond the reference, which ships only
unguided sampling — src/tinyedm/generate.py).

EDM2-standard mechanics: a conditional model's *unconditional* forward is
the same graph with a zero class one-hot — ``jax.nn.one_hot`` maps the null
label ``-1`` to the zero vector, which rides the existing
``mp_add(sigma_emb, class_emb)`` path (models/layers.py::Embedding), so no
model change and no second param tree are needed. Guided denoising is

    D_guided(x, sigma) = D_uncond + scale * (D_cond - D_uncond)

with scale = 1 exactly the conditional model and scale > 1 amplifying the
class direction. For the guidance signal to be meaningful the model should
be trained with label dropout (``label_dropout`` in the train step), which
replaces a random fraction of labels with ``-1`` — the same null form.

TPU-native shape: one stacked forward per solver half-step — the (2B)
batch keeps the MXU at the same utilization as two sequential B forwards
while tracing the model once inside the sampler's ``lax.scan``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NULL_LABEL = -1  # one_hot(-1) == zero vector == EDM2's unconditional form

Interval = Optional[Tuple[float, float]]


def _interval_gate(plain_fn, guided_fn, interval: Interval):
    """Limited-interval guidance (Kynkäanniemi et al. 2024, "Applying
    Guidance in a Limited Interval Improves Sample and Distribution Quality
    in Diffusion Models"): run the guided combination only while
    ``lo < sigma <= hi`` and the plain model everywhere else.

    ``lax.cond`` executes ONE branch per solver half-step, so outside the
    interval the guide forward (CFG's stacked second half / autoguidance's
    second model) is genuinely skipped, not masked — guidance is typically
    active on a minority of the sigma schedule, so this also recovers most
    of guidance's 2x sampling cost. The gate keys on ``sigma[0]``: inside a
    sampler step every row shares one sigma (solver.py builds the batch
    vector from a scalar table entry); this is a sampling-time wrapper, not
    a training-time one.
    """
    if interval is None:
        return guided_fn
    lo, hi = float(interval[0]), float(interval[1])

    def gated(x: jnp.ndarray, sigma: jnp.ndarray, labels):
        sig = sigma.reshape(-1)[0]
        inside = jnp.logical_and(sig > lo, sig <= hi)
        return jax.lax.cond(inside, guided_fn, plain_fn, x, sigma, labels)

    return gated


def cfg_denoise_fn(denoise_fn, guidance_scale: float, interval: Interval = None):
    """Wrap a ``denoise_fn(x, sigma, labels)`` with classifier-free guidance.

    The wrapped function evaluates conditional and unconditional branches in
    ONE stacked forward (batch 2B) and linearly combines them. With
    ``guidance_scale == 1`` it is mathematically the conditional model (the
    combination collapses to D_cond); scale 0 is fully unconditional.
    Labels are required — guiding an unconditional model is meaningless.
    ``interval=(lo, hi)`` restricts guidance to ``lo < sigma <= hi``
    (plain conditional forward elsewhere — see ``_interval_gate``).
    """
    scale = float(guidance_scale)

    def guided(x: jnp.ndarray, sigma: jnp.ndarray, labels: Optional[jnp.ndarray]):
        if labels is None:
            raise ValueError(
                "classifier-free guidance needs class labels; "
                "the model has nothing to guide toward without them"
            )
        x2 = jnp.concatenate([x, x], axis=0)
        s2 = jnp.concatenate([sigma, sigma], axis=0)
        null = jnp.full_like(labels, NULL_LABEL)
        l2 = jnp.concatenate([labels, null], axis=0)
        d = denoise_fn(x2, s2, l2)
        d_cond, d_uncond = jnp.split(d, 2, axis=0)
        return d_uncond + scale * (d_cond - d_uncond)

    return _interval_gate(denoise_fn, guided, interval)


def autoguidance_denoise_fn(
    main_fn, guide_fn, guidance_scale: float, interval: Interval = None
):
    """Autoguidance (Karras et al. 2024, "Guiding a Diffusion Model with a
    Bad Version of Itself"): guide a model with a smaller / less-trained
    version of itself instead of its own unconditional branch —

        D_guided = D_guide + scale * (D_main - D_guide)

    Works for conditional AND unconditional models (both branches see the
    same labels). Two forwards per half-step — the models carry different
    weights (and possibly different architectures), so they cannot share a
    stacked batch the way CFG's cond/uncond branches do. Scale 1 recovers
    the main model up to float rounding (``D_g + (D_m - D_g)`` is not
    bitwise ``D_m``). ``interval=(lo, hi)`` restricts guidance to
    ``lo < sigma <= hi`` (main model alone elsewhere — see
    ``_interval_gate``).
    """
    scale = float(guidance_scale)

    def guided(x: jnp.ndarray, sigma: jnp.ndarray, labels: Optional[jnp.ndarray]):
        d_main = main_fn(x, sigma, labels)
        d_guide = guide_fn(x, sigma, labels)
        return d_guide + scale * (d_main - d_guide)

    return _interval_gate(main_fn, guided, interval)


def drop_labels(rng, labels: jnp.ndarray, p: float) -> jnp.ndarray:
    """Per-sample label dropout for CFG training: with probability ``p``
    replace a label by ``NULL_LABEL`` (zero one-hot through the embedding).
    Call only when ``p > 0`` so the parity graph stays byte-identical at
    the default ``label_dropout: 0``."""
    drop = jax.random.bernoulli(rng, p, labels.shape)
    return jnp.where(drop, jnp.full_like(labels, NULL_LABEL), labels)
