"""Flax InceptionV3 pool3 feature extractor for FID + a validated proxy.

The reference's only published number is CIFAR-10 FID 4.0 (README.md:67-69)
but it ships no FID code; the standard extractor is torchvision's
``inception_v3(IMAGENET1K_V1)`` with the fc head removed (2048-d pool3
features). This module is a TPU-native (flax, NHWC) port of that exact
architecture plus ``convert_torch_inception`` to map a locally provided
torchvision state dict (no network egress exists in this environment, so
weights are loaded from disk when present — same pattern as
data/vae.py:convert_torch_vae).

BatchNorms are folded into the convolutions at conversion time (inference
only), so the flax graph is conv+bias+relu throughout — fewer ops and
exactly the eval-mode math (eps=1e-3, torchvision default).

Geometry is pinned by golden per-stage shapes in tests/test_fid_posthoc.py
(299 -> 149 -> 147 -> 73 -> 71 -> 35x35x288 -> 17x17x768 -> 8x8x2048). In an
environment WITH torchvision weights, cross-check numerics in one command::

    python -c "
    import numpy as np, torch, torchvision, jax
    from tinyedm_tpu.utils import inception as I
    tv = torchvision.models.inception_v3(weights='IMAGENET1K_V1', init_weights=False)
    tv.transform_input = False; tv.fc = torch.nn.Identity(); tv.eval()
    imgs = np.random.default_rng(0).integers(0, 256, (4, 299, 299, 3), dtype=np.uint8)
    with torch.no_grad():
        ref = tv(torch.from_numpy(imgs).permute(0, 3, 1, 2).float().div(255).sub(0.5).div(0.5)).numpy()
    params = I.convert_torch_inception(tv.state_dict())
    mine = np.asarray(I.InceptionV3Pool3().apply({'params': params}, I.preprocess_uint8(imgs)))
    print(np.abs(mine - ref).max()); assert np.allclose(mine, ref, atol=1e-3)
    "

(preprocess_uint8 resizes to 299 first; feeding already-299 inputs makes the
resize an identity, so the two pipelines see identical tensors.)

``proxy_feature_fn`` is the always-available fallback: a fixed-seed
random-feature extractor (linear + rectified random projections of 32x32
RGB). It makes the full 50k-sample FID protocol executable end to end in
this weights-less environment and is pinned by tests against known
synthetic distributions. Proxy-FID values are NOT comparable to published
Inception-FID numbers — they share only the metric's structure.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

BN_EPS = 1e-3  # torchvision BasicConv2d BatchNorm eps


class FoldedConv(nn.Module):
    """Conv + bias + ReLU; the bias/scale come from a folded BatchNorm."""

    features: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: Any = (0, 0)

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=pad,
            use_bias=True,
            name="conv",
        )(x)
        return nn.relu(x)


def _maxpool(x, window=3, stride=2):
    return nn.max_pool(x, (window, window), strides=(stride, stride))


def _avgpool3(x, count_include_pad: bool = True):
    """3x3 stride-1 pad-1 average pool. count_include_pad=True is the
    torchvision semantic (F.avg_pool2d default: border windows divide by 9);
    False is the TF/keras 'SAME' semantic (divide by the valid-element count),
    which TF-slim, keras InceptionV3, and the TF-FID graph all use."""
    return nn.avg_pool(
        x,
        (3, 3),
        strides=(1, 1),
        padding=((1, 1), (1, 1)),
        count_include_pad=count_include_pad,
    )


class InceptionA(nn.Module):
    pool_features: int
    tf_avgpool: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = FoldedConv(64, (1, 1), name="branch1x1")(x)
        b5 = FoldedConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = FoldedConv(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = FoldedConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = FoldedConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = FoldedConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = FoldedConv(self.pool_features, (1, 1), name="branch_pool")(
            _avgpool3(x, not self.tf_avgpool)
        )
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = FoldedConv(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = FoldedConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = FoldedConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = FoldedConv(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _maxpool(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    tf_avgpool: bool = False

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = FoldedConv(192, (1, 1), name="branch1x1")(x)
        b7 = FoldedConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = FoldedConv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = FoldedConv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = FoldedConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = FoldedConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = FoldedConv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = FoldedConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = FoldedConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = FoldedConv(192, (1, 1), name="branch_pool")(
            _avgpool3(x, not self.tf_avgpool)
        )
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = FoldedConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = FoldedConv(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = FoldedConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = FoldedConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = FoldedConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = FoldedConv(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _maxpool(x)], axis=-1)


class InceptionE(nn.Module):
    tf_avgpool: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = FoldedConv(320, (1, 1), name="branch1x1")(x)
        b3 = FoldedConv(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                FoldedConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
                FoldedConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = FoldedConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = FoldedConv(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                FoldedConv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
                FoldedConv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        bp = FoldedConv(192, (1, 1), name="branch_pool")(
            _avgpool3(x, not self.tf_avgpool)
        )
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Pool3(nn.Module):
    """InceptionV3 up to the 2048-d global-average pool (aux head and fc
    omitted — FID never uses them).

    ``tf_avgpool`` selects the only semantic difference between the two
    standard weight lineages (the conv/concat geometry is identical and is
    validated against tf_keras in tests/test_inception_keras.py):

    - False (default): torchvision semantics — the 3x3 stride-1 branch-pool
      averages divide by 9 even at borders (F.avg_pool2d
      count_include_pad=True). Use with ``convert_torch_inception`` on a
      torchvision IMAGENET1K_V1 state dict.
    - True: TF/keras 'SAME' semantics — border windows divide by the valid
      count. Use with ``convert_keras_inception`` or any TF-slim-lineage
      weights. The canonical FID graph (pt_inception-2015-12-05, what
      pytorch-fid / clean-fid / torch-fidelity score with, hence what
      published FID ~4.0 numbers mean) uses THIS pooling semantic.
    """

    tf_avgpool: bool = False

    @nn.compact
    def __call__(self, x):  # x: (B, 299, 299, 3) in [-1, 1]
        tf_ap = self.tf_avgpool
        x = FoldedConv(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = FoldedConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = FoldedConv(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _maxpool(x)
        x = FoldedConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = FoldedConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _maxpool(x)
        x = InceptionA(pool_features=32, tf_avgpool=tf_ap, name="Mixed_5b")(x)
        x = InceptionA(pool_features=64, tf_avgpool=tf_ap, name="Mixed_5c")(x)
        x = InceptionA(pool_features=64, tf_avgpool=tf_ap, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(channels_7x7=128, tf_avgpool=tf_ap, name="Mixed_6b")(x)
        x = InceptionC(channels_7x7=160, tf_avgpool=tf_ap, name="Mixed_6c")(x)
        x = InceptionC(channels_7x7=160, tf_avgpool=tf_ap, name="Mixed_6d")(x)
        x = InceptionC(channels_7x7=192, tf_avgpool=tf_ap, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(tf_avgpool=tf_ap, name="Mixed_7b")(x)
        x = InceptionE(tf_avgpool=tf_ap, name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))  # (B, 2048)


def _fold_bn(sd: dict, prefix: str) -> dict:
    """Fold eval-mode BatchNorm into the preceding conv:
    w' = w * gamma / sqrt(var + eps);  b' = beta - mean * gamma / sqrt(var+eps).
    torchvision OIHW -> flax HWIO."""
    w = np.asarray(sd[f"{prefix}.conv.weight"], np.float32)  # (O, I, kh, kw)
    gamma = np.asarray(sd[f"{prefix}.bn.weight"], np.float32)
    beta = np.asarray(sd[f"{prefix}.bn.bias"], np.float32)
    mean = np.asarray(sd[f"{prefix}.bn.running_mean"], np.float32)
    var = np.asarray(sd[f"{prefix}.bn.running_var"], np.float32)
    scale = gamma / np.sqrt(var + BN_EPS)
    w = w * scale[:, None, None, None]
    b = beta - mean * scale
    return {"conv": {"kernel": w.transpose(2, 3, 1, 0), "bias": b}}


_BLOCK_BRANCHES = {
    "InceptionA": ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                   "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"],
    "InceptionB": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"],
    "InceptionC": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                   "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                   "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "InceptionD": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
                   "branch7x7x3_3", "branch7x7x3_4"],
    "InceptionE": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                   "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                   "branch3x3dbl_3b", "branch_pool"],
}

_TOPOLOGY = [
    ("Mixed_5b", "InceptionA"), ("Mixed_5c", "InceptionA"), ("Mixed_5d", "InceptionA"),
    ("Mixed_6a", "InceptionB"),
    ("Mixed_6b", "InceptionC"), ("Mixed_6c", "InceptionC"),
    ("Mixed_6d", "InceptionC"), ("Mixed_6e", "InceptionC"),
    ("Mixed_7a", "InceptionD"),
    ("Mixed_7b", "InceptionE"), ("Mixed_7c", "InceptionE"),
]


_STEMS = ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
          "Conv2d_3b_1x1", "Conv2d_4a_3x3")


def convert_torch_inception(state_dict: dict) -> dict:
    """Map a torchvision ``inception_v3`` state dict (IMAGENET1K_V1) onto
    InceptionV3Pool3 params, folding every BatchNorm into its conv."""
    params: dict[str, Any] = {}
    for stem in _STEMS:
        params[stem] = _fold_bn(state_dict, stem)
    for name, kind in _TOPOLOGY:
        params[name] = {
            br: _fold_bn(state_dict, f"{name}.{br}") for br in _BLOCK_BRANCHES[kind]
        }
    return params


def convert_keras_inception(model) -> dict:
    """Map a keras/tf_keras ``applications.InceptionV3`` model onto
    InceptionV3Pool3 params (use with ``tf_avgpool=True`` — keras average
    pools exclude padding from the denominator).

    Keras builds the graph with one ``conv2d_bn`` call per conv (Conv2D then
    BatchNormalization), and the default layer names encode the global
    creation counter ('conv2d', 'conv2d_1', ...). Creation order follows the
    source call order, which is exactly the _STEMS + _TOPOLOGY/_BLOCK_BRANCHES
    flattening used here (model.layers itself is topologically sorted and
    interleaves branches — it cannot be zipped directly). Duck-typed: no
    keras import, works with keras 2/3 and tf_keras."""
    import re

    def creation_index(layer) -> int:
        m = re.fullmatch(r"[a-z_\d]*?(?:_(\d+))?", layer.name)
        if m is None:
            raise ValueError(
                f"layer {layer.name!r} is not default-named; "
                "convert_keras_inception needs a freshly built "
                "applications.InceptionV3 (default layer names)"
            )
        return int(m.group(1) or 0)

    convs = sorted(
        (l for l in model.layers if l.__class__.__name__ == "Conv2D"),
        key=creation_index,
    )
    bns = sorted(
        (l for l in model.layers if l.__class__.__name__ == "BatchNormalization"),
        key=creation_index,
    )
    targets = [(s, None) for s in _STEMS] + [
        (name, br) for name, kind in _TOPOLOGY for br in _BLOCK_BRANCHES[kind]
    ]
    if not (len(convs) == len(bns) == len(targets)):
        raise ValueError(
            f"expected {len(targets)} conv/bn pairs, got "
            f"{len(convs)} convs / {len(bns)} bns - not an InceptionV3 trunk"
        )
    params: dict[str, Any] = {}
    for (block, branch), conv, bn in zip(targets, convs, bns):
        w = np.asarray(conv.kernel, np.float32)  # keras kernels are HWIO
        n_out = w.shape[-1]
        gamma = (np.asarray(bn.gamma, np.float32) if bn.scale
                 else np.ones(n_out, np.float32))
        beta = (np.asarray(bn.beta, np.float32) if bn.center
                else np.zeros(n_out, np.float32))
        mean = np.asarray(bn.moving_mean, np.float32)
        var = np.asarray(bn.moving_variance, np.float32)
        scale = gamma / np.sqrt(var + bn.epsilon)
        cb = np.asarray(conv.bias, np.float32) if conv.use_bias else 0.0
        leaf = {"conv": {"kernel": w * scale, "bias": beta + (cb - mean) * scale}}
        if branch is None:
            params[block] = leaf
        else:
            params.setdefault(block, {})[branch] = leaf
    return params


DEFAULT_WEIGHTS = Path("datasets/inception_v3_pool3.npz")
_VARIANT_KEY = "__tf_avgpool__"
_PRETRAINED_KEY = "__pretrained__"


class UnverifiedInceptionWeights(RuntimeError):
    """Raised when a converted weight file does not carry the
    ``pretrained=True`` provenance stamp. In this no-egress environment the
    only files that can exist at DEFAULT_WEIGHTS are rehearsal conversions of
    RANDOMIZED keras/torch models; letting one of those feed a default
    'inception' score would silently poison any FID parity claim (the exact
    failure mode VERDICT r3 item 1 forbids)."""


def save_converted(
    params: dict,
    path: str | Path = DEFAULT_WEIGHTS,
    tf_avgpool: bool = False,
    pretrained: bool = False,
) -> None:
    """Save converted weights; ``tf_avgpool`` records which avg-pool semantic
    the weight lineage was trained under (False for convert_torch_inception
    on torchvision weights, True for convert_keras_inception / TF-slim /
    TF-FID lineage) so scoring picks the matching graph automatically.

    ``pretrained`` is a provenance stamp: set it True ONLY when the source
    model carried real ImageNet weights (torchvision IMAGENET1K_V1 or
    keras ``weights='imagenet'``). Scoring refuses unstamped files unless
    unverified use is requested explicitly (see inception_feature_fn)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {jax.tree_util.keystr(k): v for k, v in flat}
    arrays[_VARIANT_KEY] = np.asarray(bool(tf_avgpool))
    arrays[_PRETRAINED_KEY] = np.asarray(bool(pretrained))
    np.savez(path, **arrays)


def load_converted(path: str | Path = DEFAULT_WEIGHTS) -> tuple[dict, bool, bool]:
    """Returns (params, tf_avgpool, pretrained). Files written before a flag
    existed load with that flag False (torchvision-semantic, unverified —
    any pre-flag file in this environment is a rehearsal conversion)."""
    data = np.load(path)
    params: dict = {}
    tf_avgpool = False
    pretrained = False
    for key in data.files:
        if key == _VARIANT_KEY:
            tf_avgpool = bool(data[key])
            continue
        if key == _PRETRAINED_KEY:
            pretrained = bool(data[key])
            continue
        node = params
        parts = [p.strip("'") for p in key.replace("]", "").split("['") if p]
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return params, tf_avgpool, pretrained


def preprocess_uint8(images: np.ndarray) -> jnp.ndarray:
    """uint8 NHWC (any HxW) -> (B, 299, 299, 3) in [-1, 1], bilinear resize
    with half-pixel centers (torch interpolate align_corners=False)."""
    x = jnp.asarray(images, jnp.float32) / 255.0
    if x.ndim == 3:
        x = x[..., None]
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    x = jax.image.resize(x, (x.shape[0], 299, 299, 3), method="bilinear")
    return (x - 0.5) / 0.5


def inception_feature_fn(
    weights_path: str | Path = DEFAULT_WEIGHTS,
    batch: int = 64,
    allow_unverified: bool = False,
):
    """Jitted uint8-NHWC -> (N, 2048) pool3 features from converted local
    weights. Raises FileNotFoundError when no weights exist (this
    environment has no egress; see proxy_feature_fn for the fallback) and
    UnverifiedInceptionWeights when the file lacks the ``pretrained`` stamp
    — pass ``allow_unverified=True`` only for pipeline rehearsals whose
    numbers will never be read as Inception FID."""
    path = Path(weights_path)
    if not path.exists():
        raise FileNotFoundError(
            f"no converted InceptionV3 weights at {path}; run "
            "convert_torch_inception on a torchvision state dict first"
        )
    params, tf_avgpool, pretrained = load_converted(path)
    if not pretrained and not allow_unverified:
        raise UnverifiedInceptionWeights(
            f"{path} is not stamped pretrained=True (it is a rehearsal "
            "conversion of a randomized model, not real InceptionV3). "
            "Scores computed with it are NOT Inception FIDs. Pass "
            "--features inception-unverified (CLI) / allow_unverified=True "
            "(API) to use it for pipeline rehearsal anyway."
        )
    model = InceptionV3Pool3(tf_avgpool=tf_avgpool)
    apply = jax.jit(lambda imgs: model.apply({"params": params}, preprocess_uint8(imgs)))

    def fn(images: np.ndarray) -> np.ndarray:
        # one-deep device pipeline: dispatch sub-batch k+1 before forcing
        # k's features to host, so readback and host work ride under the
        # next forward instead of adding a link round trip per sub-batch.
        # Honest accounting (BENCH.md round 5): on the tunneled chip the
        # measured gain is within the backend's minute-scale throughput
        # variance (~620-820 img/s either way) — kept because the values
        # are identical and the overlap is free.
        out = []
        pending = None
        for start in range(0, len(images), batch):
            cur = apply(images[start : start + batch])
            if pending is not None:
                out.append(np.asarray(pending))
            pending = cur
        if pending is not None:
            out.append(np.asarray(pending))
        return np.concatenate(out)

    # async protocol for cross-chunk pipelining (consumed by
    # utils/fid.compute_stats*): dispatch launches the forwards and returns
    # un-forced device arrays; gather forces them to host. A streaming
    # consumer keeps one chunk in flight and forces chunk k only after
    # chunk k+1 is dispatched — removing the per-chunk round trip the
    # synchronous fn pays at its call boundary (worth ~1 readback latency
    # per chunk; see the honest measurement note in fid._feature_stream).
    def dispatch(images: np.ndarray):
        return [
            apply(images[start : start + batch])
            for start in range(0, len(images), batch)
        ]

    def gather(handles) -> np.ndarray:
        return np.concatenate([np.asarray(h) for h in handles])

    fn.dispatch = dispatch
    fn.gather = gather
    return fn


# ---------------------------------------------------------------------------
# Proxy features: always available, deterministic, validated by tests.
# ---------------------------------------------------------------------------


def proxy_feature_fn(dim: int = 256, seed: int = 0, image_size: int = 32):
    """Fixed random-feature extractor: resize to ``image_size``, scale to
    [-1, 1], then [P1 x, relu(P2 x)] with fixed Gaussian projections.

    The linear half makes proxy-FID exactly sensitive to pixel mean/covariance
    differences; the rectified half adds sensitivity to higher moments.
    Deterministic in (dim, seed, image_size). NOT comparable to
    Inception-FID — use for relative tracking and pipeline validation only.
    """
    rng = np.random.default_rng(seed)
    d_in = image_size * image_size * 3
    half = dim // 2
    p1 = rng.standard_normal((d_in, half)).astype(np.float32) / np.sqrt(d_in)
    p2 = rng.standard_normal((d_in, dim - half)).astype(np.float32) / np.sqrt(d_in)

    @jax.jit
    def apply(imgs):
        x = jnp.asarray(imgs, jnp.float32) / 127.5 - 1.0
        if x.ndim == 3:
            x = x[..., None]
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        if x.shape[1] != image_size or x.shape[2] != image_size:
            x = jax.image.resize(
                x, (x.shape[0], image_size, image_size, 3), method="bilinear"
            )
        flat = x.reshape(x.shape[0], -1)
        return jnp.concatenate([flat @ p1, jax.nn.relu(flat @ p2)], axis=-1)

    def fn(images: np.ndarray) -> np.ndarray:
        return np.asarray(apply(np.asarray(images)))

    # same async protocol as inception_feature_fn (see there): lets
    # compute_stats* overlap this chunk's forward with the previous
    # chunk's readback
    fn.dispatch = lambda images: [apply(np.asarray(images))]
    fn.gather = lambda handles: np.concatenate(
        [np.asarray(h) for h in handles]
    )
    return fn
