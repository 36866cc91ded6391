"""Denoiser(scan_blocks=True): scanned-group equivalence + checkpoint
migration (ROADMAP 3 / VERDICT r1 next-round item 3).

Runs of identical consecutive blocks fold into nn.scan cells with stacked
params; numerics must match the unrolled model exactly given migrated
params, and existing (unrolled) checkpoints must convert losslessly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyedm_tpu.models.unet import Denoiser
from tinyedm_tpu.training.state import force_weight_norm
from tinyedm_tpu.utils.interop import (
    migrate_params_from_scanned,
    migrate_params_to_scanned,
)

# jit-heavy integration module: excluded from the fast profile (-m 'not slow')
pytestmark = pytest.mark.slow

CFG = dict(
    in_channels=3,
    out_channels=3,
    embedding_dim=16,
    num_heads=2,
    sigma_data=0.5,
    # cifar-like: two scannable runs (Enc x2 at in==out, DecA x3 with equal
    # skips) plus non-scannable resampling/channel-change blocks
    encoder_block_types=("Enc", "Enc", "EncD", "EncA", "EncA"),
    decoder_block_types=("DecA", "DecA", "DecA", "DecU", "Dec", "Dec", "Dec"),
    encoder_out_channels=(16, 16, 16, 16, 16),
    decoder_out_channels=(16, 16, 16, 16, 16, 16, 16),
    skip_connections=(True, True, True, False, True, True, True),
    dropout_rate=0.0,
)


def _models():
    return Denoiser(**CFG), Denoiser(**CFG, scan_blocks=True)


def _inputs(b=2, hw=16):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, hw, hw, 3))
    sigma = jnp.full((b,), 0.7)
    emb = jax.random.normal(jax.random.PRNGKey(1), (b, 16))
    return x, sigma, emb


def test_scanned_tree_has_expected_groups():
    _, scanned = _models()
    x, sigma, emb = _inputs()
    v = scanned.init({"params": jax.random.PRNGKey(0)}, x, sigma, emb)
    keys = set(v["params"].keys())
    assert "encoder_scan_0" in keys  # Enc x2
    assert "encoder_scan_3" in keys  # EncA x2
    assert "decoder_scan_0" in keys  # DecA x3 (equal skips)
    assert "decoder_scan_4" in keys  # Dec x2 (equal skips)
    assert "encoder_blocks_2" in keys  # EncD stays unrolled
    assert "decoder_blocks_3" in keys  # DecU stays unrolled
    # stacked leading axis
    w = v["params"]["encoder_scan_0"]["block"]["conv_3x3_1"]["w"]
    assert w.shape[0] == 2 and w.ndim == 5


def test_forward_equivalence_after_migration():
    unrolled, scanned = _models()
    x, sigma, emb = _inputs()
    v_u = unrolled.init({"params": jax.random.PRNGKey(42)}, x, sigma, emb)
    abstract = jax.eval_shape(
        lambda: scanned.init({"params": jax.random.PRNGKey(0)}, x, sigma, emb)
    )
    p_s = migrate_params_to_scanned(v_u["params"], abstract["params"])
    y_u = unrolled.apply({"params": v_u["params"]}, x, sigma, emb)
    y_s = scanned.apply({"params": p_s}, x, sigma, emb)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_u), atol=1e-6, rtol=1e-6)


def test_migration_roundtrip_lossless():
    unrolled, scanned = _models()
    x, sigma, emb = _inputs()
    v_u = unrolled.init({"params": jax.random.PRNGKey(3)}, x, sigma, emb)
    abstract = jax.eval_shape(
        lambda: scanned.init({"params": jax.random.PRNGKey(0)}, x, sigma, emb)
    )
    p_s = migrate_params_to_scanned(v_u["params"], abstract["params"])
    back = migrate_params_from_scanned(p_s)
    flat_a, tree_a = jax.tree_util.tree_flatten(v_u["params"])
    flat_b, tree_b = jax.tree_util.tree_flatten(back)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_force_weight_norm_on_stacked_kernels():
    _, scanned = _models()
    x, sigma, emb = _inputs()
    v = scanned.init({"params": jax.random.PRNGKey(0)}, x, sigma, emb)
    params = jax.tree_util.tree_map(lambda l: l * 3.7, v["params"])
    fixed = force_weight_norm(params)
    w5 = np.asarray(fixed["encoder_scan_0"]["block"]["conv_3x3_1"]["w"])  # (L,kh,kw,in,out)
    rms = np.sqrt((w5 ** 2).mean(axis=(1, 2, 3)))
    np.testing.assert_allclose(rms, 1.0, rtol=1e-3)
    w3 = np.asarray(fixed["encoder_scan_0"]["block"]["embed"]["w"])  # (L,out,in)
    rms3 = np.sqrt((w3 ** 2).mean(axis=2))
    np.testing.assert_allclose(rms3, 1.0, rtol=1e-3)


def test_scanned_train_step_runs_and_learns():
    from tinyedm_tpu.diffusion.diffuser import Diffuser
    from tinyedm_tpu.models.edm import EDM
    from tinyedm_tpu.models.layers import Embedding
    from tinyedm_tpu.training.train_step import (
        OptimizerConfig,
        init_train_state,
        make_train_step,
    )

    model = EDM(
        embedding=Embedding(fourier_dim=8, embedding_dim=16, num_classes=None),
        denoiser=Denoiser(**{**CFG, "dropout_rate": 0.1}, scan_blocks=True,
                          dtype=jnp.bfloat16),
    )
    cfg = OptimizerConfig(lr=1e-2, rampup_steps=0, steady_steps=100)
    img = jnp.zeros((4, 16, 16, 3))
    state = init_train_state(jax.random.PRNGKey(0), model, img, cfg)
    step = jax.jit(make_train_step(model, Diffuser(-1.2, 1.2), cfg))
    batch = (
        jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3)) * 0.5,
        jnp.zeros((4,), jnp.int32),
    )
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(2), jnp.asarray(50.0))
        losses.append(float(metrics["train_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 8
