"""mp_dropout (ops/dropout.py): nn.Dropout semantics with uint16 masks."""

import jax
import jax.numpy as jnp
import numpy as np

from tinyedm_tpu.ops.dropout import mp_dropout
import pytest


def test_keep_fraction_and_mean_preserving():
    x = jnp.ones((1024, 512), jnp.float32)
    y = mp_dropout(jax.random.PRNGKey(0), x, 0.13)
    keep = float((y != 0).mean())
    assert abs(keep - 0.87) < 5e-3
    # E[y] == x (inverted dropout scaling by the exact configured rate)
    assert abs(float(y.mean()) - 1.0) < 5e-3
    survivors = np.asarray(y)[np.asarray(y) != 0]
    np.testing.assert_allclose(survivors, 1.0 / 0.87, rtol=1e-6)


def test_deterministic_per_key_and_rate_zero():
    x = jax.random.normal(jax.random.PRNGKey(7), (64, 64))
    y1 = mp_dropout(jax.random.PRNGKey(1), x, 0.5)
    y2 = mp_dropout(jax.random.PRNGKey(1), x, 0.5)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3 = mp_dropout(jax.random.PRNGKey(2), x, 0.5)
    assert np.any(np.asarray(y1) != np.asarray(y3))
    np.testing.assert_array_equal(np.asarray(mp_dropout(jax.random.PRNGKey(1), x, 0.0)), np.asarray(x))


def test_dtype_preserved_and_grads_flow():
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 32), jnp.bfloat16)
    y = mp_dropout(jax.random.PRNGKey(1), x, 0.25)
    assert y.dtype == jnp.bfloat16
    g = np.asarray(
        jax.grad(
            lambda x: mp_dropout(jax.random.PRNGKey(1), x.astype(jnp.float32), 0.25).sum()
        )(jnp.ones((8, 8)))
    )
    # grads are 0 for dropped entries and exactly the survivor scale otherwise
    nz = g[g != 0]
    assert nz.size > 0
    np.testing.assert_allclose(nz, 1.0 / 0.75, rtol=1e-6)


@pytest.mark.slow
def test_block_dropout_changes_with_rng_and_off_in_eval():
    """Blocks use mp_dropout under the 'dropout' rng stream when training."""
    from tinyedm_tpu.models.blocks import EncoderBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 12))
    blk = EncoderBlock(out_channels=16, dropout_rate=0.5)
    v = blk.init({"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}, x, emb, True)
    y_eval1 = blk.apply(v, x, emb, False)
    y_eval2 = blk.apply(v, x, emb, False)
    np.testing.assert_array_equal(np.asarray(y_eval1), np.asarray(y_eval2))
    y_tr1 = blk.apply(v, x, emb, True, rngs={"dropout": jax.random.PRNGKey(4)})
    y_tr2 = blk.apply(v, x, emb, True, rngs={"dropout": jax.random.PRNGKey(5)})
    assert np.any(np.asarray(y_tr1) != np.asarray(y_tr2))
