"""Classifier-free guidance (beyond the reference): null-label semantics,
the stacked-forward CFG wrapper, label-dropout training, and the generate
CLI integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyedm_tpu.diffusion.diffuser import Diffuser
from tinyedm_tpu.diffusion.guidance import (
    NULL_LABEL,
    autoguidance_denoise_fn,
    cfg_denoise_fn,
    drop_labels,
)
from tinyedm_tpu.models.layers import Embedding
from tinyedm_tpu.training.ema import EMAConfig
from tinyedm_tpu.training.train_step import (
    OptimizerConfig,
    init_train_state,
    make_train_step,
)

from .test_train_step import tiny_model


def test_null_label_is_zero_onehot_through_embedding():
    """label -1 -> one_hot == 0 -> class_emb == 0: the unconditional branch
    is the SAME graph with the class contribution zeroed (EDM2's form), not
    a structurally different model."""
    emb = Embedding(fourier_dim=8, embedding_dim=16, num_classes=10)
    sigma = jnp.ones((4,), jnp.float32)
    variables = emb.init(
        {"params": jax.random.PRNGKey(0)}, sigma, jnp.zeros((4,), jnp.int32)
    )

    # reference point: run with the class_embed output manually zeroed by
    # feeding a label whose one-hot is zero
    _, out_null = emb.apply(variables, sigma, jnp.full((4,), NULL_LABEL, jnp.int32))
    # one_hot(-1) == 0, so class_emb == WNLinear(0) == 0; verify against
    # explicitly computing mp_add(sigma_emb, 0) via a second embedding whose
    # class weights are irrelevant (same params, label 5 differs)
    _, out_cond = emb.apply(variables, sigma, jnp.full((4,), 5, jnp.int32))
    assert not np.allclose(np.asarray(out_null), np.asarray(out_cond))
    # determinism: every null label gives the identical unconditional output
    _, out_null2 = emb.apply(variables, sigma, jnp.full((4,), NULL_LABEL, jnp.int32))
    np.testing.assert_array_equal(np.asarray(out_null), np.asarray(out_null2))


def test_cfg_wrapper_linearity_and_scale_one_identity():
    """cfg(x) == d_uncond + s * (d_cond - d_uncond) for any denoise_fn; at
    s=1 it equals the conditional output exactly."""

    def toy_denoise(x, sigma, labels):
        # label-dependent affine map; null labels (-1) hit the zero branch
        lab = labels.astype(jnp.float32).reshape(-1, 1, 1, 1)
        cond = jnp.where(lab >= 0, lab, 0.0)
        return x * 0.5 + cond

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 1))
    sigma = jnp.ones((4,), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3], jnp.int32)

    d_cond = toy_denoise(x, sigma, labels)
    d_uncond = toy_denoise(x, sigma, jnp.full_like(labels, NULL_LABEL))

    for s in (0.0, 1.0, 2.5):
        got = cfg_denoise_fn(toy_denoise, s)(x, sigma, labels)
        want = d_uncond + s * (d_cond - d_uncond)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    np.testing.assert_allclose(
        np.asarray(cfg_denoise_fn(toy_denoise, 1.0)(x, sigma, labels)),
        np.asarray(d_cond),
        rtol=1e-6,
    )


def test_cfg_wrapper_requires_labels():
    with pytest.raises(ValueError, match="labels"):
        cfg_denoise_fn(lambda x, s, l: x, 2.0)(
            jnp.zeros((2, 4, 4, 1)), jnp.ones((2,)), None
        )


def test_cfg_on_real_model_matches_two_forwards():
    """The stacked (2B) forward must equal two separate B forwards combined —
    the model is batch-equivariant (no batch-coupled ops)."""
    model = tiny_model(num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 1))
    sigma = jnp.full((4,), 1.3, jnp.float32)
    labels = jnp.asarray([1, 2, 3, 4], jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, sigma, labels)
    # un-gate the label path: gain_out and the modulation gains init at 0,
    # which would make d_cond == d_uncond and the test vacuous
    variables = jax.tree_util.tree_map_with_path(
        lambda p, v: (
            jnp.full_like(v, 0.5)
            if any(getattr(k, "key", None) in ("gain", "gain_out") for k in p)
            else v
        ),
        variables,
    )

    def denoise(x_, s_, l_):
        return model.apply(variables, x_, s_, l_)

    scale = 3.0
    got = cfg_denoise_fn(denoise, scale)(x, sigma, labels)
    d_cond = denoise(x, sigma, labels)
    d_uncond = denoise(x, sigma, jnp.full_like(labels, NULL_LABEL))
    assert not np.allclose(np.asarray(d_cond), np.asarray(d_uncond)), (
        "label path still gated — the CFG comparison would be vacuous"
    )
    want = d_uncond + scale * (d_cond - d_uncond)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_autoguidance_linearity_and_scale_one_identity():
    def main_fn(x, sigma, labels):
        return x * 2.0

    def guide_fn(x, sigma, labels):
        return x * 0.5 + 1.0

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 1))
    sigma = jnp.ones((4,), jnp.float32)
    d_main, d_guide = main_fn(x, sigma, None), guide_fn(x, sigma, None)
    for s in (0.0, 1.0, 2.5):
        got = autoguidance_denoise_fn(main_fn, guide_fn, s)(x, sigma, None)
        want = d_guide + s * (d_main - d_guide)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    # scale 1 recovers the main model up to one float rounding —
    # D_g + (D_m - D_g) is not bitwise D_m (FMA contraction may round)
    np.testing.assert_allclose(
        np.asarray(autoguidance_denoise_fn(main_fn, guide_fn, 1.0)(x, sigma, None)),
        np.asarray(d_main), rtol=1e-6, atol=1e-6,
    )


def test_interval_guidance_gates_on_sigma():
    """Limited-interval guidance: guided combination inside lo < sigma <= hi
    (boundaries included/excluded exactly), the PLAIN model outside."""

    def denoise_fn(x, sigma, labels):
        # cond rows return x, null-label rows x + 1 -> guided = x + 1 - s
        shift = (labels == NULL_LABEL).astype(jnp.float32).reshape(-1, 1, 1, 1)
        return x + shift

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 1))
    labels = jnp.arange(4, dtype=jnp.int32)
    scale = 3.0
    fn = cfg_denoise_fn(denoise_fn, scale, interval=(0.5, 2.0))
    guided_want = np.asarray(x) + 1.0 - scale
    plain_want = np.asarray(x)
    for sig, want in [
        (1.0, guided_want),   # inside
        (2.0, guided_want),   # hi boundary: inclusive
        (0.5, plain_want),    # lo boundary: exclusive
        (3.0, plain_want),    # above
        (0.2, plain_want),    # below
    ]:
        got = fn(x, jnp.full((4,), sig, jnp.float32), labels)
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-6, atol=1e-6, err_msg=str(sig)
        )

    # autoguidance takes the same gate (plain branch = the MAIN model)
    def main_fn(x, sigma, labels):
        return x * 2.0

    def guide_fn(x, sigma, labels):
        return x * 0.5 + 1.0

    afn = autoguidance_denoise_fn(main_fn, guide_fn, scale, interval=(0.5, 2.0))
    d_main, d_guide = np.asarray(x) * 2.0, np.asarray(x) * 0.5 + 1.0
    np.testing.assert_allclose(
        np.asarray(afn(x, jnp.ones((4,), jnp.float32), labels)),
        d_guide + scale * (d_main - d_guide), rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(afn(x, jnp.full((4,), 5.0, jnp.float32), labels)),
        d_main, rtol=1e-6, atol=1e-6,
    )


def test_interval_guidance_inside_solver_scan():
    """The lax.cond gate must trace inside the solver's jitted lax.scan (the
    real deployment site) and reproduce a python-loop reference solve that
    switches guidance per step."""
    from tinyedm_tpu.diffusion.solver import DeterministicSolver

    def denoise_fn(x, sigma, labels):
        shift = (labels == NULL_LABEL).astype(jnp.float32).reshape(-1, 1, 1, 1)
        return 0.9 * x + 0.3 * shift

    scale, lo, hi = 2.0, 0.5, 5.0
    solver = DeterministicSolver(num_steps=6, sigma_min=0.01, sigma_max=20.0)
    x0 = jax.random.normal(jax.random.PRNGKey(2), (3, 4, 4, 1))
    labels = jnp.zeros((3,), jnp.int32)
    fn = cfg_denoise_fn(denoise_fn, scale, interval=(lo, hi))
    got = jax.jit(lambda x: solver.solve(fn, x, labels))(x0)

    # reference: the masked (both-branches-computed) equivalent of the gate —
    # same arithmetic per branch, no lax.cond
    def gated_ref(x, sigma, labels):
        g = cfg_denoise_fn(denoise_fn, scale)(x, sigma, labels)
        p = denoise_fn(x, sigma, labels)
        sig = sigma.reshape(-1)[0]
        return jnp.where(jnp.logical_and(sig > lo, sig <= hi), g, p)

    want = solver.solve(gated_ref, x0, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6)


def test_interval_guidance_inside_multistep_solver():
    """The lax.cond gate must also compose with the DPM-Solver++(2M) scan
    (one forward per step) — same masked-equivalent check as the Heun
    test."""
    from tinyedm_tpu.diffusion.solver import MultistepSolver

    def denoise_fn(x, sigma, labels):
        shift = (labels == NULL_LABEL).astype(jnp.float32).reshape(-1, 1, 1, 1)
        return 0.9 * x + 0.3 * shift

    scale, lo, hi = 2.0, 0.5, 5.0
    solver = MultistepSolver(num_steps=5, sigma_min=0.01, sigma_max=20.0)
    x0 = jax.random.normal(jax.random.PRNGKey(4), (3, 4, 4, 1))
    labels = jnp.zeros((3,), jnp.int32)
    fn = cfg_denoise_fn(denoise_fn, scale, interval=(lo, hi))
    got = jax.jit(lambda x: solver.solve(fn, x, labels))(x0)

    def gated_ref(x, sigma, labels):
        g = cfg_denoise_fn(denoise_fn, scale)(x, sigma, labels)
        p = denoise_fn(x, sigma, labels)
        sig = sigma.reshape(-1)[0]
        return jnp.where(jnp.logical_and(sig > lo, sig <= hi), g, p)

    want = solver.solve(gated_ref, x0, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6)


def test_drop_labels_statistics_and_passthrough():
    labels = jnp.zeros((4096,), jnp.int32)
    dropped = drop_labels(jax.random.PRNGKey(0), labels, 0.25)
    frac = float((dropped == NULL_LABEL).mean())
    assert 0.2 < frac < 0.3, frac
    kept = dropped[dropped != NULL_LABEL]
    assert np.all(np.asarray(kept) == 0)


@pytest.mark.slow
def test_label_dropout_trains_and_zero_is_parity():
    """label_dropout=0 must leave the step byte-identical to the parity
    graph (same loss for the same rng); label_dropout>0 must run and give a
    different (finite) loss."""
    model = tiny_model(num_classes=10)
    diffuser = Diffuser(-1.2, 1.2)
    ema_cfg = EMAConfig(sigma_rels=(0.13,))
    img = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 8, 1))
    labels = jnp.asarray(np.arange(16) % 10, jnp.int32)

    # NOTE: label influence is doubly gated at init — gain_out AND the
    # per-block modulation gains start at 0, so labels first touch a
    # gradient at step 2 (once gain_out is nonzero) and first touch the
    # LOSS at step 3 (once the modulation gains are nonzero). Compare at
    # step 4 for margin.
    losses = {}
    for name, p in (("off", 0.0), ("off2", 0.0), ("on", 0.5)):
        cfg = OptimizerConfig(
            lr=1e-3, rampup_steps=1, steady_steps=2, label_dropout=p
        )
        state = init_train_state(
            jax.random.PRNGKey(1), model, img, cfg, ema_cfg, sample_labels=labels
        )
        step = jax.jit(make_train_step(model, diffuser, cfg, ema_cfg))
        metrics = None
        for i in range(4):
            state, metrics = step(
                state, (img, labels), jax.random.PRNGKey(2), jnp.asarray(float(i))
            )
        losses[name] = float(metrics["train_loss"])
    assert losses["off"] == losses["off2"]  # deterministic baseline
    assert np.isfinite(losses["on"])
    assert losses["on"] != losses["off"]  # dropped labels change the loss
