"""Numerical validation of the flax InceptionV3 port against tf_keras.

VERDICT r3 item 1: the FID-4.0 parity gate rests on utils/inception.py, whose
fidelity had only been exercised with a synthetic torchvision-format state
dict (converter plumbing, not numerics). tf_keras ships an independent
InceptionV3 (keras.applications, TF-slim lineage); with randomized weights it
pins every conv geometry, stride, padding, BN folding, branch ordering, and
concat of the port to fp32 tolerance — no pretrained weights needed.

The one semantic difference between the keras/TF lineage and torchvision is
the 3x3 stride-1 branch-pool average (TF 'SAME' excludes padding from the
denominator; torch F.avg_pool2d includes it). The keras comparison runs the
port with ``tf_avgpool=True``; ``TestAvgPoolVariants`` pins BOTH semantics
against torch.nn.functional.avg_pool2d directly, so the torchvision variant's
only differing op is covered by an independent implementation too.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")


@pytest.fixture(scope="module")
def keras_inception():
    tf_keras = pytest.importorskip("tf_keras")
    model = tf_keras.applications.InceptionV3(
        weights=None, include_top=False, pooling="avg", input_shape=(299, 299, 3)
    )
    # Randomize: glorot-initialized kernels scaled toward He (relu trunk would
    # otherwise decay ~0.5x variance per layer and the deep features underflow
    # toward zero, weakening the comparison); BN stats/offsets randomized so
    # the folding math is actually exercised (default mean=0/var=1/beta=0
    # folds to a near-identity).
    rng = np.random.default_rng(0)
    for layer in model.layers:
        kind = layer.__class__.__name__
        if kind == "Conv2D":
            layer.kernel.assign(np.asarray(layer.kernel) * np.sqrt(2.0))
        elif kind == "BatchNormalization":
            n = int(np.asarray(layer.moving_mean).shape[0])
            layer.moving_mean.assign(rng.normal(0.0, 0.05, n).astype(np.float32))
            layer.moving_variance.assign(rng.uniform(0.5, 1.5, n).astype(np.float32))
            layer.beta.assign(rng.normal(0.0, 0.05, n).astype(np.float32))
    return model


class TestKerasParity:
    def test_pool3_features_match(self, keras_inception):
        """Converted keras weights + tf_avgpool=True reproduce keras pool3
        features on random inputs to fp32 tolerance."""
        import jax.numpy as jnp

        from tinyedm_tpu.utils.inception import (
            InceptionV3Pool3,
            convert_keras_inception,
        )

        rng = np.random.default_rng(1)
        x = rng.uniform(-1.0, 1.0, (2, 299, 299, 3)).astype(np.float32)
        ref = np.asarray(keras_inception(x, training=False))
        params = convert_keras_inception(keras_inception)
        mine = np.asarray(
            InceptionV3Pool3(tf_avgpool=True).apply({"params": params}, jnp.asarray(x))
        )
        assert mine.shape == ref.shape == (2, 2048)
        # guard against a vacuous pass through near-zero activations
        assert float(np.abs(ref).mean()) > 1e-3, "keras features degenerate"
        scale = float(np.abs(ref).max())
        np.testing.assert_allclose(mine, ref, rtol=2e-4, atol=2e-4 * scale)

    def test_avgpool_variant_changes_features(self, keras_inception):
        """tf_avgpool actually flips the pooling semantic (the two lineages
        are NOT interchangeable — scoring must use the matching variant)."""
        import jax.numpy as jnp

        from tinyedm_tpu.utils.inception import (
            InceptionV3Pool3,
            convert_keras_inception,
        )

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(-1.0, 1.0, (1, 299, 299, 3)).astype(np.float32))
        params = convert_keras_inception(keras_inception)
        a = np.asarray(InceptionV3Pool3(tf_avgpool=True).apply({"params": params}, x))
        b = np.asarray(InceptionV3Pool3(tf_avgpool=False).apply({"params": params}, x))
        assert not np.allclose(a, b, rtol=1e-3)

    def test_converter_rejects_non_inception(self):
        from tinyedm_tpu.utils.inception import convert_keras_inception

        class FakeLayer:
            name = "conv2d"

        class FakeModel:
            layers = [FakeLayer()]

        FakeLayer.__name__ = "Conv2D"  # not enough pairs -> clear error
        with pytest.raises(ValueError, match="conv/bn pairs"):
            convert_keras_inception(FakeModel())


class TestAvgPoolVariants:
    """Pin both _avgpool3 semantics against torch (independent kernels)."""

    @pytest.mark.parametrize("count_include_pad", [True, False])
    def test_matches_torch(self, count_include_pad):
        import torch

        from tinyedm_tpu.utils.inception import _avgpool3

        rng = np.random.default_rng(3)
        # even AND odd spatial sizes (8x8 Mixed_7x, 35x35 Mixed_5x, 17x17)
        for hw in (8, 17, 35):
            x = rng.standard_normal((2, hw, hw, 5)).astype(np.float32)
            mine = np.asarray(_avgpool3(x, count_include_pad))
            ref = (
                torch.nn.functional.avg_pool2d(
                    torch.from_numpy(x).permute(0, 3, 1, 2),
                    kernel_size=3,
                    stride=1,
                    padding=1,
                    count_include_pad=count_include_pad,
                )
                .permute(0, 2, 3, 1)
                .numpy()
            )
            np.testing.assert_allclose(mine, ref, rtol=1e-6, atol=1e-6)


class TestProxyFallbackForbidden:
    def test_default_spec_raises_without_weights(self, tmp_path, monkeypatch):
        """resolve_feature_fn(None) must HARD-FAIL when no Inception weights
        exist — never silently score with proxy features (VERDICT r3)."""
        import tinyedm_tpu.utils.inception as inception_mod
        from tinyedm_tpu.utils.fid import resolve_feature_fn

        monkeypatch.setattr(
            inception_mod, "DEFAULT_WEIGHTS", tmp_path / "absent.npz"
        )
        with pytest.raises(FileNotFoundError, match="--features proxy"):
            resolve_feature_fn(None)

    def test_explicit_proxy_still_works(self):
        from tinyedm_tpu.utils.fid import resolve_feature_fn

        fn, kind = resolve_feature_fn("proxy")
        assert kind == "proxy"
        imgs = np.zeros((4, 32, 32, 3), np.uint8)
        assert fn(imgs).shape[0] == 4
