"""Fused cosine-attention kernel (ops/fused_attention.py) vs the XLA path.

Runs the Pallas kernels in interpreter mode on the CPU test backend; the
reference implementation is the same math CosineAttention's XLA branch uses
(reference semantics: networks.py:194-207).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyedm_tpu.ops.fused_attention import (
    MAX_FUSED_TOKENS,
    _bwd_impl,
    _fwd_impl,
    _pick_bb,
)
from tinyedm_tpu.ops.mp import pixel_norm


def xla_attention(qkv: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    q5 = pixel_norm(qkv.reshape(b, n, 3, heads, hd), axis=-1)
    q, k, v = q5[:, :, 0], q5[:, :, 1], q5[:, :, 2]
    scale = 1.0 / math.sqrt(hd)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    w = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    y = jnp.einsum("bhqk,bkhd->bqhd", w, v, preferred_element_type=qkv.dtype)
    return y.reshape(b, n, c)


@pytest.mark.parametrize(
    "n,heads,dtype",
    [(64, 4, jnp.bfloat16), (256, 4, jnp.bfloat16), (64, 2, jnp.float32), (16, 1, jnp.float32), (56, 4, jnp.bfloat16)],
)
def test_forward_matches_xla(n, heads, dtype):
    c = 64 * heads
    qkv = (jax.random.normal(jax.random.PRNGKey(0), (4, n, 3 * c)) * 0.7).astype(dtype)
    out = _fwd_impl(qkv, heads, interpret=True).astype(jnp.float32)
    ref = xla_attention(qkv, heads).astype(jnp.float32)
    # bf16: the kernel defers softmax normalization to the PV output (divide
    # by the row sums after the matmul), so P is rounded as bf16(E) rather
    # than bf16(E/s) — within ~1 bf16 ulp of the divide-first XLA form.
    tol = 8e-3 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(out, ref, atol=tol, rtol=tol)


@pytest.mark.parametrize("n,dtype", [(64, jnp.float32), (128, jnp.float32)])
@pytest.mark.slow
def test_backward_exact_fp32(n, dtype):
    """In fp32 the hand-written VJP must match autodiff of the XLA path to
    numerical precision (same exact math)."""
    heads, c = 4, 128
    qkv = (jax.random.normal(jax.random.PRNGKey(0), (2, n, 3 * c)) * 0.7).astype(dtype)
    g = (jax.random.normal(jax.random.PRNGKey(1), (2, n, c)) * 0.5).astype(dtype)
    dref = jax.vjp(lambda q: xla_attention(q, heads), qkv)[1](g)[0]
    o = _fwd_impl(qkv, heads, interpret=True)
    dout = _bwd_impl(qkv, g, o, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(dout), np.asarray(dref), atol=2e-6, rtol=2e-5)


@pytest.mark.slow
def test_backward_bf16_close():
    """bf16 grads differ from XLA autodiff only by rounding (the kernel keeps
    fp32 accumulation but rounds matmul operands to bf16 like XLA does)."""
    heads, c, n = 4, 256, 64
    qkv = (jax.random.normal(jax.random.PRNGKey(0), (4, n, 3 * c)) * 0.7).astype(jnp.bfloat16)
    g = (jax.random.normal(jax.random.PRNGKey(1), (4, n, c)) * 0.5).astype(jnp.bfloat16)
    dref = jax.vjp(lambda q: xla_attention(q, heads), qkv)[1](g)[0].astype(jnp.float32)
    o = _fwd_impl(qkv, heads, interpret=True)
    dout = _bwd_impl(qkv, g, o, heads, interpret=True).astype(jnp.float32)
    rel = float(jnp.linalg.norm(dout - dref) / (jnp.linalg.norm(dref) + 1e-9))
    assert rel < 2e-2, rel


@pytest.mark.slow
def test_spmd_batch_partitioning():
    """Under a sharded jit the kernel must keep the batch sharding (no
    replication all-gather) and produce identical values."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tinyedm_tpu.ops.fused_attention import cosine_attention_qkv
    from tinyedm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 64, 192), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    f = jax.jit(
        lambda q: cosine_attention_qkv(q, 2),
        in_shardings=NamedSharding(mesh, P("data")),
    )
    out = f(xs)
    assert out.sharding.spec == P("data")
    ref = jax.jit(lambda q: cosine_attention_qkv(q, 2))(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    grad = jax.jit(
        jax.grad(lambda q: cosine_attention_qkv(q, 2).astype(jnp.float32).sum()),
        in_shardings=NamedSharding(mesh, P("data")),
    )(xs)
    assert grad.sharding.spec == P("data")


def test_pick_bb_divides_batch():
    for b in (1, 2, 3, 6, 8, 32, 256):
        for n in (16, 64, 256, 512):
            for bwd in (False, True):
                bb = _pick_bb(b, n, 256, 4, bwd)
                assert b % bb == 0


@pytest.mark.slow
def test_module_dispatch_forced_on(monkeypatch):
    """CosineAttention(fused='on') goes through the kernel (interpret mode on
    CPU) and matches fused='off' numerics."""
    from flax import linen as nn

    from tinyedm_tpu.models.layers import CosineAttention

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
    m_on = CosineAttention(num_heads=2, fused="on")
    m_off = CosineAttention(num_heads=2, fused="off")
    v = m_on.init(jax.random.PRNGKey(1), x)
    y_on = m_on.apply(v, x)
    y_off = m_off.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off), atol=1e-5, rtol=1e-5)


def test_max_fused_tokens_bound():
    assert MAX_FUSED_TOKENS == 512


def test_pick_bb_pair_respects_vmem_budget():
    """Regression for the imagenet512 VMEM OOM (C=768, hd=192): the chunk
    picker must charge the kbd/vbd scratch against the budget — bb*per +
    scratch <= _BUDGET for every returned chunk size."""
    from tinyedm_tpu.ops.fused_attention import (
        _BUDGET,
        _pair_sample_bytes,
        _pick_bb_pair,
    )

    for c, heads in [(256, 4), (768, 4), (768, 12), (512, 8), (1024, 4)]:
        hd = c // heads
        for n in (16, 64, 128):
            for b in (8, 32, 256):
                for bwd in (False, True):
                    bb = _pick_bb_pair(b, n, c, heads, bwd)
                    assert b % bb == 0
                    scratch = 2 * bb * 2 * n * 2 * hd * 2
                    assert (
                        bb * _pair_sample_bytes(n, c, heads, bwd) + scratch
                        <= _BUDGET
                        or bb == 1
                    ), (c, heads, n, b, bwd, bb)


def test_pick_bb_block_charges_bwd_accumulators():
    """Regression (ADVICE r2): the whole-block bwd kernel keeps fp32 dW
    accumulators (16c^2 bytes) resident plus the bf16 weights (8c^2), and
    the unrolled head/pair loop keeps every iteration's intermediates live —
    the picker must charge all of it, and block_kernel_fits must say NO at
    wide channels where bwd cannot fit at bb=1."""
    from tinyedm_tpu.ops.fused_attention import (
        _BUDGET,
        _block_sample_bytes,
        _pick_bb_block,
        _use_pair,
        block_kernel_fits,
    )

    for c, heads in [(256, 4), (512, 4), (768, 4), (768, 12)]:
        for n in (64, 256):
            pair = _use_pair(heads, n)
            for b in (8, 32, 256):
                for bwd in (False, True):
                    bb = _pick_bb_block(b, n, c, heads, bwd, pair)
                    assert b % bb == 0
                    fixed = 2 * c * 4 * c + (4 * (3 * c * c + c * c) if bwd else 0)
                    hd = c // heads
                    scratch = 2 * bb * 2 * n * 2 * hd * 2 if pair else 0
                    per = _block_sample_bytes(n, c, heads, bwd, pair)
                    assert bb * per + scratch + fixed <= _BUDGET or bb == 1, (
                        c, heads, n, b, bwd, bb,
                    )
    # wide channels: bwd dW accumulators (9.4 MB at C=768) + weights can't
    # leave room — the layer must fall back, not OOM on-chip
    assert not block_kernel_fits(64, 768, 4)
    assert block_kernel_fits(64, 256, 4)


@pytest.mark.slow
def test_block_dispatch_falls_back_when_kernel_cannot_fit():
    """CosineAttention(fused='block') at a width where the kernel can't fit
    VMEM must take the unfused path (same math) instead of building the
    Pallas call."""
    from tinyedm_tpu.models.layers import CosineAttention

    c = 768
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, c)) * 0.1
    m_block = CosineAttention(num_heads=4, fused="block")
    m_off = CosineAttention(num_heads=4, fused="off")
    v = m_off.init(jax.random.PRNGKey(1), x)
    y_block = m_block.apply(v, x)
    y_off = m_off.apply(v, x)
    np.testing.assert_allclose(
        np.asarray(y_block), np.asarray(y_off), atol=1e-5, rtol=1e-5
    )


def test_unaligned_token_counts_avoid_kernels():
    """MNIST's 7x7 attention (n=49) hit a Mosaic concat limitation in the
    pair kernel; unaligned n must route to the XLA path / per-head form."""
    from tinyedm_tpu.ops.fused_attention import _use_pair

    assert not _use_pair(4, 49)
    assert not _use_pair(4, 196)
    assert _use_pair(4, 64)
    assert _use_pair(4, 56)
