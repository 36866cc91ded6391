"""Golden-value tests for the MP primitives against the reference formulas
(src/tinyedm/networks.py:9-88)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyedm_tpu.ops.mp import (
    mp_add,
    mp_cat,
    mp_silu,
    normalize,
    pixel_norm,
    weight_normalize,
)
from tinyedm_tpu.ops.precond import edm_loss_weight, edm_precond


def test_pixel_norm_matches_formula():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 8, 8, 16)).astype(np.float32)
    out = np.asarray(pixel_norm(jnp.asarray(x), axis=-1))
    # reference: x / (eps + ||x|| * sqrt(norm.numel()/x.numel()))
    norm = np.linalg.norm(x, axis=-1, keepdims=True)
    expected = x / (1e-4 + norm / math.sqrt(16))
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


def test_pixel_norm_unit_rms():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 256)).astype(np.float32) * 5.0
    out = np.asarray(pixel_norm(jnp.asarray(x), axis=-1))
    rms = np.sqrt(np.mean(out**2, axis=-1))
    np.testing.assert_allclose(rms, 1.0, rtol=1e-2)


def test_pixel_norm_fp32_island_under_bf16():
    # the norm must be computed in fp32 even for bf16 inputs
    x = (np.ones((1, 1024), np.float32) * 1e-3).astype(jnp.bfloat16)
    out = pixel_norm(jnp.asarray(x), axis=-1)
    assert out.dtype == jnp.bfloat16
    rms = float(jnp.sqrt(jnp.mean(out.astype(jnp.float32) ** 2)))
    assert abs(rms - 1.0) < 0.1


def test_normalize_per_output_unit():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(32, 16, 3, 3)).astype(np.float32)
    out = np.asarray(normalize(jnp.asarray(w)))
    rms = np.sqrt(np.mean(out.reshape(32, -1) ** 2, axis=1))
    np.testing.assert_allclose(rms, 1.0, rtol=1e-2)


def test_weight_normalize_layouts():
    rng = np.random.default_rng(3)
    # HWIO conv: per-output (last axis) RMS 1
    w4 = rng.normal(size=(3, 3, 16, 32)).astype(np.float32)
    out4 = np.asarray(weight_normalize(jnp.asarray(w4)))
    rms4 = np.sqrt(np.mean(out4.reshape(-1, 32) ** 2, axis=0))
    np.testing.assert_allclose(rms4, 1.0, rtol=1e-2)
    # (out, in) linear: per-row RMS 1
    w2 = rng.normal(size=(8, 64)).astype(np.float32)
    out2 = np.asarray(weight_normalize(jnp.asarray(w2)))
    rms2 = np.sqrt(np.mean(out2**2, axis=1))
    np.testing.assert_allclose(rms2, 1.0, rtol=1e-2)


def test_weight_normalize_idempotent():
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32))
    once = weight_normalize(w)
    twice = weight_normalize(once)
    np.testing.assert_allclose(np.asarray(once), np.asarray(twice), rtol=1e-4, atol=1e-5)


def test_mp_silu():
    x = jnp.asarray([-2.0, -1.0, 0.0, 1.0, 2.0], jnp.float32)
    expected = np.asarray(jax.nn.silu(x)) / 0.596
    np.testing.assert_allclose(np.asarray(mp_silu(x)), expected, rtol=1e-6)


@pytest.mark.parametrize("t", [0.3, 0.5])
def test_mp_add(t):
    rng = np.random.default_rng(5)
    a = rng.normal(size=(4, 4)).astype(np.float32)
    b = rng.normal(size=(4, 4)).astype(np.float32)
    expected = (a * (1 - t) + b * t) / math.sqrt((1 - t) ** 2 + t**2)
    np.testing.assert_allclose(
        np.asarray(mp_add(jnp.asarray(a), jnp.asarray(b), t)), expected, rtol=1e-5
    )


def test_mp_add_preserves_magnitude():
    rng = np.random.default_rng(6)
    a = rng.normal(size=(100_000,)).astype(np.float32)
    b = rng.normal(size=(100_000,)).astype(np.float32)
    out = np.asarray(mp_add(jnp.asarray(a), jnp.asarray(b), 0.3))
    assert abs(out.std() - 1.0) < 0.02


def test_mp_cat_preserves_magnitude():
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.normal(size=(1000, 64)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(1000, 192)).astype(np.float32))
    out = np.asarray(mp_cat(a, b, axis=-1))
    assert abs(out.std() - 1.0) < 0.02


def test_edm_precond_identities():
    sigma = jnp.asarray([0.002, 0.5, 80.0], jnp.float32)
    sd = 0.5
    c = edm_precond(sigma, sd)
    s = np.asarray(sigma, np.float64)
    np.testing.assert_allclose(
        np.asarray(c.c_skip).reshape(-1), sd**2 / (s**2 + sd**2), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(c.c_out).reshape(-1), s * sd / np.sqrt(s**2 + sd**2), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(c.c_in).reshape(-1), 1 / np.sqrt(sd**2 + s**2), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(c.c_noise), np.log(s) / 4, rtol=1e-5)
    # EDM identity: c_skip^2 + c_out^2/sigma_data^2 * ... -> variance preservation
    np.testing.assert_allclose(
        np.asarray(c.c_out).reshape(-1) ** 2 + np.asarray(c.c_skip).reshape(-1) * sd**2,
        sd**2,
        rtol=1e-5,
    )


def test_edm_loss_weight():
    sigma = jnp.asarray([0.1, 1.0, 10.0], jnp.float32)
    w = np.asarray(edm_loss_weight(sigma, 0.5))
    s = np.asarray(sigma, np.float64)
    np.testing.assert_allclose(w, (s**2 + 0.25) / (s * 0.5) ** 2, rtol=1e-5)
