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


def test_non_block_multiple_token_count_covers_all_rows():
    """n whose 128-padding is NOT a multiple of 512 (e.g. 1100 -> 1152):
    the forward grid must still cover every query row — the old
    block_q=min(512, n_pad) truncated the grid and left rows >= 1024
    uncomputed (silent garbage in the tail rows)."""
    key = jax.random.PRNGKey(4)
    kq, kk, kv = jax.random.split(key, 3)
    b, n, h, d = 1, 1100, 2, 64
    q = jax.random.normal(kq, (b, n, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, n, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, n, h, d), jnp.float32)
    out = _flash_attention_kernel_path(q, k, v)
    ref = _xla_attention(q, k, v)
    # the tail rows specifically (the truncated region)
    np.testing.assert_allclose(
        np.asarray(out[:, 1024:]), np.asarray(ref[:, 1024:]), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_bf16_gradients_accumulate_in_fp32():
    """dk/dv accumulate across q-blocks through the output refs: with bf16
    outs each block round-trips the running sum to 8 mantissa bits. The fp32
    accumulator must keep bf16 grads close to the fp32-input reference."""
    key = jax.random.PRNGKey(5)
    b, n, h, d = 1, 1024, 1, 64
    q32, k32, v32, g32 = (
        jax.random.normal(kk, (b, n, h, d), jnp.float32)
        for kk in jax.random.split(key, 4)
    )

    def loss(fn, q, k, v, g):
        return jnp.vdot(fn(q, k, v).astype(jnp.float32), g)

    grads_ref = jax.grad(lambda q, k, v: loss(_xla_attention, q, k, v, g32), (0, 1, 2))(
        q32, k32, v32
    )
    bf = jnp.bfloat16
    grads_bf = jax.grad(
        lambda q, k, v: loss(_flash_attention_kernel_path, q, k, v, g32.astype(bf)),
        (0, 1, 2),
    )(q32.astype(bf), k32.astype(bf), v32.astype(bf))
    for gr, gb in zip(grads_ref, grads_bf):
        ref = np.asarray(gr)
        got = np.asarray(gb, np.float32)
        denom = np.maximum(np.abs(ref), 1e-3)
        # bf16 inputs bound per-element error ~1e-2 relative; a bf16
        # accumulator at 8 q-blocks drifts well past this
        assert np.median(np.abs(got - ref) / denom) < 2e-2


def test_flash_attention_under_sharded_jit_adds_no_gather():
    """Under a data-sharded jit the custom_partitioning wrapper must let
    each device run the kernel on its batch shard — a bare pallas_call gets
    replicated (the full batch all-gathered onto every chip). Asserted two
    ways: numerics match the unsharded path, and the optimized HLO contains
    NO all-gather (the replication signature)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from tinyedm_tpu.parallel.audit import collective_inventory

    devs = np.asarray(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("data",))
    b, n, h, d = 8, 1024, 1, 64
    key = jax.random.PRNGKey(6)
    q, k, v = (
        jax.random.normal(kk, (b, n, h, d), jnp.float32)
        for kk in jax.random.split(key, 3)
    )
    shd = NamedSharding(mesh, PartitionSpec("data"))
    jitted = jax.jit(
        _flash_attention_kernel_path,
        in_shardings=(shd, shd, shd),
        out_shardings=shd,
    )
    txt = jitted.lower(q, k, v).compile().as_text()
    inv = collective_inventory(txt)
    assert not [c for c in inv if c.kind == "all-gather"], (
        "sharded flash attention all-gathers the batch: " f"{inv}"
    )
    out = jitted(jax.device_put(q, shd), jax.device_put(k, shd), jax.device_put(v, shd))
    ref = _flash_attention_kernel_path(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)
