"""Whole-block fused attention (ops/fused_attention.attention_block) vs the
XLA CosineAttention path: forward, input/weight grads, SPMD partitioning
(including the weight-grad psum over the batch axis).

The block kernel is opt-in (CosineAttention(fused="block")) — measured
slower than the split form on the CIFAR recipe (BENCH.md round 2) but kept
for HBM-bound topologies; parity must hold regardless.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyedm_tpu.models.layers import CosineAttention

# jit-heavy integration module: excluded from the fast profile (-m 'not slow')
pytestmark = pytest.mark.slow


@pytest.mark.parametrize(
    "hw,c,heads,dtype,tol",
    [(4, 128, 2, jnp.float32, 2e-5), (8, 128, 4, jnp.float32, 2e-5)],
)
def test_block_matches_xla_path(hw, c, heads, dtype, tol):
    x = (jax.random.normal(jax.random.PRNGKey(0), (3, hw, hw, c)) * 0.6).astype(dtype)
    m_b = CosineAttention(num_heads=heads, dtype=dtype, fused="block")
    m_o = CosineAttention(num_heads=heads, dtype=dtype, fused="off")
    v = m_b.init(jax.random.PRNGKey(1), x)

    yb = m_b.apply(v, x).astype(jnp.float32)
    yo = m_o.apply(v, x).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(yo), atol=tol, rtol=tol)

    def loss(mod):
        return lambda p, xx: mod.apply(p, xx).astype(jnp.float32).sum()

    gb_p, gb_x = jax.grad(loss(m_b), argnums=(0, 1))(v, x)
    go_p, go_x = jax.grad(loss(m_o), argnums=(0, 1))(v, x)
    np.testing.assert_allclose(np.asarray(gb_x), np.asarray(go_x), atol=tol * 5, rtol=tol * 5)
    for a, b in zip(jax.tree_util.tree_leaves(gb_p), jax.tree_util.tree_leaves(go_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol * 5, rtol=tol * 5)


def test_block_param_tree_matches_unfused():
    """fused='block' must create the identical param tree (same names,
    shapes, init) as the WNConv-based path so checkpoints interchange."""
    x = jnp.zeros((2, 4, 4, 64))
    v_b = CosineAttention(num_heads=2, fused="block").init(jax.random.PRNGKey(0), x)
    v_o = CosineAttention(num_heads=2, fused="off").init(jax.random.PRNGKey(0), x)
    pb = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v_b)
    po = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v_o)
    assert jax.tree_util.tree_structure(pb) == jax.tree_util.tree_structure(po)
    for a, b in zip(jax.tree_util.tree_leaves(v_b), jax.tree_util.tree_leaves(v_o)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_block_spmd_weight_grad_psum():
    """Under a batch-sharded jit the dW outputs must equal the unsharded
    global gradient (per-shard partials psum'd, replicated result)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tinyedm_tpu.ops.fused_attention import attention_block
    from tinyedm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    b, n, c, heads = 16, 16, 128, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (b, n, c), jnp.float32) * 0.5
    wq = jax.random.normal(jax.random.PRNGKey(1), (c, 3 * c), jnp.float32) * 0.05
    wo = jax.random.normal(jax.random.PRNGKey(2), (c, c), jnp.float32) * 0.05

    def loss(x, wq, wo):
        return attention_block(x, wq, wo, heads).sum()

    g_ref = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, wq, wo)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    g_sh = jax.jit(
        jax.grad(loss, argnums=(0, 1, 2)),
        in_shardings=(
            NamedSharding(mesh, P("data")),
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P()),
        ),
    )(xs, wq, wo)
    for name, a, b_ in zip(("dx", "dwq", "dwo"), g_ref, g_sh):
        rel = float(jnp.linalg.norm(a - b_) / (jnp.linalg.norm(a) + 1e-9))
        assert rel < 1e-5, (name, rel)
    assert g_sh[0].sharding.spec == P("data")
