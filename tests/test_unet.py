"""U-Net topology + Denoiser tests (reference parity: tests/test_unet_builder.py
plus the skip-channel vector verified in SURVEY.md §2.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyedm_tpu.models.edm import EDM
from tinyedm_tpu.models.layers import Embedding
from tinyedm_tpu.models.topology import (
    default_decoder_block_types,
    default_decoder_out_channels,
    default_encoder_block_types,
    default_encoder_out_channels,
    default_skip_connections,
    get_skip_channels,
    validate_topology,
)
from tinyedm_tpu.models.unet import Denoiser

# the small CIFAR-10 topology from the shipped config (experiments/conf/cifar10.yaml)
CIFAR_TOPOLOGY = dict(
    encoder_block_types=("Enc", "Enc", "EncD", "EncA", "EncA", "EncD", "EncA", "EncA"),
    decoder_block_types=(
        "DecA", "Dec", "DecA", "DecA", "DecA", "DecU",
        "DecA", "DecA", "DecA", "DecU", "Dec", "Dec", "Dec",
    ),
    encoder_out_channels=(256,) * 8,
    decoder_out_channels=(256,) * 13,
    skip_connections=(
        False, False, True, True, True, False,
        True, True, True, False, True, True, True,
    ),
)

def tiny_topology_valid():
    # TINY skip mask must consume len(enc)+1 = 4 skips
    return dict(
        encoder_block_types=("Enc", "EncD", "EncA"),
        decoder_block_types=("DecA", "Dec", "DecU", "Dec", "Dec"),
        encoder_out_channels=(16, 32, 32),
        decoder_out_channels=(32, 32, 32, 16, 16),
        skip_connections=(False, True, True, True, True),
    )


def test_default_topology_lengths():
    # reference invariants (tests/test_unet_builder.py:9-30)
    assert len(default_encoder_block_types()) == 15
    assert len(default_decoder_block_types()) == 21
    assert len(default_encoder_out_channels()) == 15
    assert len(default_decoder_out_channels()) == 21
    assert len(default_skip_connections()) == 21


def test_default_skip_channels_golden():
    # golden vector verified against the reference by executing
    # networks.py:435-444 (SURVEY.md §2.1)
    sc = get_skip_channels(
        default_encoder_out_channels(),
        default_decoder_out_channels(),
        default_skip_connections(),
    )
    assert sc == (
        0, 0, 768, 768, 768, 576, 0, 576, 576, 576, 384,
        0, 384, 384, 384, 192, 0, 192, 192, 192, 192,
    )


def test_cifar_topology_valid():
    validate_topology(**CIFAR_TOPOLOGY)
    sc = get_skip_channels(
        CIFAR_TOPOLOGY["encoder_out_channels"],
        CIFAR_TOPOLOGY["decoder_out_channels"],
        CIFAR_TOPOLOGY["skip_connections"],
    )
    assert sum(1 for c in sc if c) == 9


def test_invalid_topology_raises():
    bad = dict(CIFAR_TOPOLOGY)
    bad["skip_connections"] = (False,) * 13
    with pytest.raises(ValueError):
        validate_topology(**bad)


@pytest.fixture(scope="module")
def tiny_denoiser():
    model = Denoiser(
        in_channels=3,
        out_channels=3,
        embedding_dim=32,
        num_heads=2,
        sigma_data=0.5,
        **tiny_topology_valid(),
    )
    x = jnp.zeros((2, 8, 8, 3))
    sigma = jnp.ones((2,))
    emb = jnp.zeros((2, 32))
    variables = model.init(jax.random.PRNGKey(0), x, sigma, emb)
    return model, variables


def test_denoiser_shapes(tiny_denoiser):
    model, variables = tiny_denoiser
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    sigma = jnp.asarray([0.5, 2.0])
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    out = model.apply(variables, x, sigma, emb)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32


def test_denoiser_identity_at_init(tiny_denoiser):
    """gain_out init 0 => D(x; sigma) = c_skip * x exactly at init
    (networks.py:538,602-603)."""
    model, variables = tiny_denoiser
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    sigma = jnp.asarray([1.0, 1.0])
    out = model.apply(variables, x, sigma, jnp.zeros((2, 32)))
    c_skip = 0.5**2 / (1.0 + 0.5**2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * c_skip, rtol=1e-5)


@pytest.mark.slow
def test_denoiser_jit_and_grad(tiny_denoiser):
    model, variables = tiny_denoiser

    @jax.jit
    def loss(params, x, sigma, emb):
        out = model.apply({"params": params}, x, sigma, emb)
        return jnp.mean(out**2)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    g = jax.grad(loss)(variables["params"], x, jnp.ones((2,)), jnp.zeros((2, 32)))
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
    # gradient flows through the normalize into stored weights
    assert any(float(jnp.abs(l).max()) > 0 for l in flat)


@pytest.mark.slow
def test_denoiser_bf16_compute(tiny_denoiser):
    model, variables = tiny_denoiser
    model16 = model.replace(dtype=jnp.bfloat16) if hasattr(model, "replace") else None
    model16 = Denoiser(
        in_channels=3,
        out_channels=3,
        embedding_dim=32,
        num_heads=2,
        sigma_data=0.5,
        dtype=jnp.bfloat16,
        **tiny_topology_valid(),
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    sigma = jnp.asarray([0.5, 2.0])
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    out32 = model.apply(variables, x, sigma, emb)
    out16 = model16.apply(variables, x, sigma, emb)
    assert out16.dtype == jnp.float32  # output combine is fp32 regardless
    np.testing.assert_allclose(np.asarray(out32), np.asarray(out16), atol=0.1, rtol=0.1)


def test_cifar_param_count():
    """The 35.6M-parameter CIFAR model (reference README.md:69)."""
    model = Denoiser(
        in_channels=3, out_channels=3, embedding_dim=256, sigma_data=0.5,
        dropout_rate=0.13, **CIFAR_TOPOLOGY,
    )
    x = jnp.zeros((1, 32, 32, 3))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, jnp.ones((1,)), jnp.zeros((1, 256)))
    )
    n = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(variables["params"]))
    assert 34e6 < n < 37e6, f"param count {n/1e6:.2f}M out of expected range"


def test_edm_model_forward():
    embedding = Embedding(fourier_dim=8, embedding_dim=32, num_classes=10)
    denoiser = Denoiser(
        in_channels=3, out_channels=3, embedding_dim=32, num_heads=2,
        sigma_data=0.5, **tiny_topology_valid(),
    )
    model = EDM(embedding=embedding, denoiser=denoiser, use_uncertainty=True)
    x = jnp.zeros((2, 8, 8, 3))
    sigma = jnp.ones((2,))
    labels = jnp.asarray([0, 1])
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x, sigma, labels,
        method=EDM.denoise_with_aux,
    )
    out = model.apply(variables, x, sigma, labels)
    assert out.shape == x.shape
    denoised, u = model.apply(
        variables, x, sigma, labels, method=EDM.denoise_with_aux
    )
    assert denoised.shape == x.shape
    assert u.shape == (2,)


@pytest.mark.slow
def test_remat_identical_outputs_and_grads():
    """remat=True must change memory behavior only: outputs and gradients
    are identical to the non-remat model with the same params."""
    kwargs = dict(
        in_channels=3, out_channels=3, embedding_dim=32, num_heads=2,
        sigma_data=0.5, **tiny_topology_valid(),
    )
    m1 = Denoiser(**kwargs)
    m2 = Denoiser(remat=True, **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    sigma = jnp.asarray([0.5, 2.0])
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    variables = m1.init(jax.random.PRNGKey(0), x, sigma, emb)

    o1 = m1.apply(variables, x, sigma, emb)
    o2 = m2.apply(variables, x, sigma, emb)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-6)

    def loss(m, p):
        return jnp.mean(m.apply({"params": p}, x, sigma, emb) ** 2)

    g1 = jax.grad(lambda p: loss(m1, p))(variables["params"])
    g2 = jax.grad(lambda p: loss(m2, p))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_denoiser_wrapper_forwards_train_flag():
    """The torch reference's wrapper inherits train mode implicitly (module
    state); the functional wrapper must forward train= to nets that take it
    (else dropout silently trains disabled) while keeping the bare 3-arg
    contract for nets that don't."""
    import flax.linen as nn

    from tinyedm_tpu.models.unet import DenoiserWrapper

    class TrainAwareNet(nn.Module):
        @nn.compact
        def __call__(self, x, c_noise, emb=None, *, train=False):
            return x * (2.0 if train else 1.0)

    class BareNet(nn.Module):
        @nn.compact
        def __call__(self, x, c_noise, emb=None):
            return x

    x = jnp.ones((2, 4, 4, 3))
    sigma = jnp.full((2,), 0.7)

    w = DenoiserWrapper(net=TrainAwareNet())
    v = w.init({"params": jax.random.PRNGKey(0)}, x, sigma)
    y_eval = w.apply(v, x, sigma, train=False)
    y_train = w.apply(v, x, sigma, train=True)
    assert not np.allclose(np.asarray(y_eval), np.asarray(y_train)), (
        "train flag did not reach the wrapped net"
    )

    wb = DenoiserWrapper(net=BareNet())
    vb = wb.init({"params": jax.random.PRNGKey(0)}, x, sigma)
    yb = wb.apply(vb, x, sigma, train=True)  # must not TypeError
    assert np.isfinite(np.asarray(yb)).all()
