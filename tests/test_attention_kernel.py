"""Pallas flash-attention kernel vs the XLA reference path (interpret mode on
CPU; the same kernel compiles for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyedm_tpu.ops.attention import (
    _flash_attention_kernel_path,
    _xla_attention,
    flash_attention,
)


@pytest.mark.parametrize(
    "b,n,h,d",
    [
        (2, 64, 2, 32),     # 8x8 tokens, padded n and d
        (1, 256, 4, 64),    # 16x16 tokens, padded d
        (2, 128, 1, 128),   # exact tiles
    ],
)
def test_matches_xla(b, n, h, d):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, n, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, n, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, n, h, d), jnp.float32)
    out = _flash_attention_kernel_path(q, k, v)
    ref = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_bf16():
    key = jax.random.PRNGKey(1)
    q, k, v = (
        jax.random.normal(kk, (1, 64, 2, 64), jnp.bfloat16)
        for kk in jax.random.split(key, 3)
    )
    out = _flash_attention_kernel_path(q, k, v)
    ref = _xla_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=0.05, atol=0.02
    )


@pytest.mark.slow
def test_gradients_match_xla():
    key = jax.random.PRNGKey(2)
    q, k, v = (
        jax.random.normal(kk, (1, 64, 2, 32), jnp.float32)
        for kk in jax.random.split(key, 3)
    )

    def loss_flash(q, k, v):
        return jnp.sum(_flash_attention_kernel_path(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4)


def test_in_cosine_attention_module():
    from tinyedm_tpu.models.layers import CosineAttention

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 64))
    m_ref = CosineAttention(num_heads=4, use_pallas=False)
    m_pal = CosineAttention(num_heads=4, use_pallas=True)
    variables = m_ref.init(jax.random.PRNGKey(1), x)
    y_ref = m_ref.apply(variables, x)
    y_pal = m_pal.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_ref), rtol=2e-4, atol=2e-5
    )


def test_dispatch_by_token_count():
    """flash_attention routes small token counts to XLA (identical results
    either way; this checks the dispatch wiring doesn't break)."""
    import tinyedm_tpu.ops.attention as A

    q, k, v = (
        jax.random.normal(kk, (1, 64, 2, 32), jnp.float32)
        for kk in jax.random.split(jax.random.PRNGKey(5), 3)
    )
    np.testing.assert_allclose(
        np.asarray(A.flash_attention(q, k, v)),
        np.asarray(A._xla_attention(q, k, v)),
        rtol=1e-5,
    )
