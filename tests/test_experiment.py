"""EDMSpec (the reference-shaped recipe dataclass) unit tests."""

import jax.numpy as jnp
import pytest

from tinyedm_tpu.diffusion.diffuser import Diffuser
from tinyedm_tpu.models.layers import Embedding
from tinyedm_tpu.models.unet import Denoiser
from tinyedm_tpu.training.experiment import EDMSpec


def make_spec(**kw):
    defaults = dict(
        diffuser=Diffuser(-1.2, 1.2),
        embedding=Embedding(fourier_dim=8, embedding_dim=16, num_classes=None),
        denoiser=Denoiser(
            in_channels=1, out_channels=1, embedding_dim=16, num_heads=2,
            sigma_data=0.5,
            encoder_block_types=("Enc", "EncD"),
            decoder_block_types=("Dec", "DecU", "Dec", "Dec"),
            encoder_out_channels=(8, 16),
            decoder_out_channels=(16, 8, 8, 8),
            skip_connections=(True, False, True, True),
        ),
        lr=0.02,
        rampup_steps=3,
        steady_steps=7,
        scheduler_interval="step",
    )
    defaults.update(kw)
    return EDMSpec(**defaults)


def test_optimizer_config_mapping():
    spec = make_spec(betas=(0.5, 0.9), accum_steps=4)
    oc = spec.build_optimizer_config()
    assert oc.lr == 0.02
    assert oc.betas == (0.5, 0.9)
    assert oc.rampup_steps == 3 and oc.steady_steps == 7
    assert oc.scheduler_interval == "step"
    assert oc.accum_steps == 4


def test_ema_config_default_single_profile():
    spec = make_spec(use_ema=True, ema_length=0.13, every_n_steps=2)
    ec = spec.build_ema_config()
    assert ec.sigma_rels == (0.13,)
    assert ec.every_n_steps == 2
    assert make_spec(use_ema=False).build_ema_config() is None


def test_ema_lengths_multi_profile():
    spec = make_spec(use_ema=True, ema_lengths=(0.05, 0.13))
    assert spec.build_ema_config().sigma_rels == (0.05, 0.13)


def test_sigma_data_override_propagates():
    # reference: sigma_data or denoiser.sigma_data (edm.py:147)
    spec = make_spec(sigma_data=0.75)
    assert spec.denoiser.sigma_data == 0.75
    assert spec.build_model().sigma_data == 0.75


def test_conditional_flag():
    assert not make_spec().conditional
    cond = make_spec(
        embedding=Embedding(fourier_dim=8, embedding_dim=16, num_classes=5)
    )
    assert cond.conditional
    assert cond.build_model().num_classes == 5


def test_uncertainty_model():
    spec = make_spec(use_uncertainty=True)
    assert spec.build_model().use_uncertainty


def test_missing_ema_length_raises():
    with pytest.raises(ValueError, match="ema_length"):
        make_spec(use_ema=True)


def test_log_norms_flows_to_optimizer_config():
    # wandb_watch wiring (reference train.py:28): spec flag -> OptimizerConfig
    assert make_spec(log_norms=True).build_optimizer_config().log_norms
    assert not make_spec().build_optimizer_config().log_norms


def test_val_ema_index_selects_profile():
    spec = make_spec(use_ema=True, ema_lengths=(0.05, 0.13), val_ema_index=1)
    assert spec.val_ema_index == 1
    assert spec.build_ema_config().sigma_rels == (0.05, 0.13)


def test_val_ema_index_out_of_range_raises():
    with pytest.raises(ValueError, match="val_ema_index"):
        make_spec(use_ema=True, ema_length=0.13, val_ema_index=1)
