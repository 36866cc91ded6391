"""Shape/semantics tests for the MP layers (reference: networks.py:22-207)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tinyedm_tpu.models.layers import (
    ClassEmbedding,
    CosineAttention,
    Embedding,
    FourierEmbedding,
    ScaleLong,
    UncertaintyNet,
    WNConv,
    WNLinear,
    downsample_2x,
    upsample_2x,
)


def test_wnlinear_shapes_and_effective_weight():
    m = WNLinear(32)
    x = jnp.ones((4, 16))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (4, 32)
    # effective weight has per-row norm 1/sqrt(fan_in) * sqrt(fan_in) = rows unit RMS
    w = variables["params"]["w"]
    assert w.shape == (32, 16)
    # output of all-ones input equals sum of effective weight rows
    from tinyedm_tpu.ops.mp import weight_normalize

    w_eff = weight_normalize(w) / math.sqrt(16)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w_eff.T), rtol=1e-5)


def test_wnconv_same_padding():
    m = WNConv(8, 3)
    x = jnp.ones((2, 7, 7, 3))  # odd spatial dims
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (2, 7, 7, 8)


def test_wnconv_magnitude_preserving():
    # unit-variance input through a weight-normed conv stays ~unit variance
    m = WNConv(128, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 128))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert 0.8 < float(y.std()) < 1.2


def test_up_down_sample():
    x = jnp.arange(16.0).reshape(1, 2, 2, 4)
    up = upsample_2x(x)
    assert up.shape == (1, 4, 4, 4)
    # nearest: each pixel repeated 2x2
    np.testing.assert_allclose(np.asarray(up[0, 0, 0]), np.asarray(up[0, 1, 1]))
    down = downsample_2x(up)
    np.testing.assert_allclose(np.asarray(down), np.asarray(x), rtol=1e-6)


def test_fourier_embedding_range():
    m = FourierEmbedding(64)
    x = jnp.asarray([0.0, 1.0, -1.0])
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (3, 64)
    assert "constants" in variables  # freqs/phases are buffers, not params
    assert set(variables["constants"].keys()) == {"freqs", "phases"}
    # cos * sqrt(2) is bounded by sqrt(2)
    assert float(jnp.max(jnp.abs(y))) <= math.sqrt(2.0) + 1e-6


def test_class_embedding():
    m = ClassEmbedding(10, 32)
    labels = jnp.asarray([0, 3, 9])
    variables = m.init(jax.random.PRNGKey(0), labels)
    y = m.apply(variables, labels)
    assert y.shape == (3, 32)
    # same label -> same embedding
    y2 = m.apply(variables, jnp.asarray([3, 3, 3]))
    np.testing.assert_allclose(np.asarray(y2[0]), np.asarray(y2[1]))


def test_embedding_unconditional_and_conditional():
    emb = Embedding(fourier_dim=16, embedding_dim=64, num_classes=10)
    sigma = jnp.asarray([0.5, 1.0])
    labels = jnp.asarray([1, 2])
    variables = emb.init(jax.random.PRNGKey(0), sigma, labels)
    fourier, out = emb.apply(variables, sigma, labels)
    assert fourier.shape == (2, 16)
    assert out.shape == (2, 64)
    assert fourier.dtype == jnp.float32 and out.dtype == jnp.float32
    # without labels the class branch must be skipped
    fourier2, out2 = emb.apply(variables, sigma, None)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    np.testing.assert_allclose(np.asarray(fourier), np.asarray(fourier2))


def test_uncertainty_net_zero_at_init():
    m = UncertaintyNet(16)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    variables = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(variables, x)
    assert y.shape == (4, 1)
    np.testing.assert_allclose(np.asarray(y), 0.0)  # gain init 0


def test_scale_long_gain_shape_and_range():
    m = ScaleLong()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
    variables = m.init(jax.random.PRNGKey(1), x)
    g = m.apply(variables, x)
    assert g.shape == (2, 1, 1, 32)
    gn = np.asarray(g)
    assert (gn > 0).all() and (gn < 1).all()  # sigmoid output


def test_cosine_attention_shapes_and_residual():
    m = CosineAttention(num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 64))
    variables = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(variables, x)
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(y), np.asarray(x))


def test_cosine_attention_permutation_equivariance():
    # spatial self-attention + 1x1 convs are permutation-equivariant over tokens
    m = CosineAttention(num_heads=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 2, 32))
    variables = m.init(jax.random.PRNGKey(1), x)
    y = np.asarray(m.apply(variables, x)).reshape(4, 32)
    xt = x.reshape(1, 4, 32)[:, ::-1].reshape(1, 2, 2, 32)
    yt = np.asarray(m.apply(variables, xt)).reshape(4, 32)
    np.testing.assert_allclose(y[::-1], yt, rtol=2e-3, atol=2e-4)
