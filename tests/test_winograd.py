"""Winograd F(2x2,3x3) conv kernel (ops/winograd.py) vs lax direct conv.

The kernel is a measured NEGATIVE for the shipped configs (BENCH.md round 2:
VPU/VMEM transform traffic exceeds the MXU saving on v5e, and Mosaic
rejects its strided slicing) but the implementation is exact and kept for
architectures/hardware where the trade flips; these tests pin its
correctness in interpret mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyedm_tpu.ops.winograd import transform_weights, winograd_conv3x3


def direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize(
    "b,h,ci,co",
    [(2, 8, 16, 24), (1, 16, 8, 8), (3, 4, 4, 12)],
)
def test_matches_direct_conv_fp32(b, h, ci, co):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, h, ci))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, ci, co)) * 0.1
    y = winograd_conv3x3(x, w, interpret=True, bb=1)
    yr = direct(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-5, rtol=2e-5)


def test_matches_direct_conv_bf16():
    x = (jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16)) * 0.5).astype(
        jnp.bfloat16
    )
    w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 16, 16)) * 0.1).astype(
        jnp.bfloat16
    )
    y = winograd_conv3x3(x, w, interpret=True, bb=1).astype(jnp.float32)
    yr = direct(x.astype(jnp.float32), w.astype(jnp.float32))
    rel = float(
        jnp.linalg.norm(y - yr) / (jnp.linalg.norm(yr) + 1e-9)
    )
    assert rel < 2e-2, rel


def test_weight_transform_shape_and_exactness():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 4, 6))
    u = transform_weights(w)
    assert u.shape == (4, 4, 4, 6)
    # G g G^T with g = delta at center -> all-0.25 inner block pattern
    g0 = jnp.zeros((3, 3, 1, 1)).at[1, 1, 0, 0].set(1.0)
    u0 = np.asarray(transform_weights(g0))[:, :, 0, 0]
    expected = np.outer([0, 0.5, -0.5, 0], [0, 0.5, -0.5, 0])
    np.testing.assert_allclose(u0, expected, atol=1e-7)


def test_odd_spatial_rejected():
    x = jnp.zeros((1, 7, 8, 4))
    w = jnp.zeros((3, 3, 4, 4))
    with pytest.raises(AssertionError):
        winograd_conv3x3(x, w, interpret=True)
