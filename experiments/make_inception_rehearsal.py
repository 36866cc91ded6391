"""Write rehearsal InceptionV3 weights for end-to-end FID pipeline drills.

This environment has no egress, so real pretrained InceptionV3 weights cannot
be downloaded; what CAN be validated end to end is the *pipeline* — the flax
pool3 graph (independently pinned against tf_keras in
tests/test_inception_keras.py), the converter, the stats/score CLIs, and the
TPU execution path. This script builds a tf_keras ``applications.InceptionV3``
with deterministic randomized weights (He-scaled kernels + randomized BN so
the folding math is exercised; same scheme as the parity test), converts it,
and writes ``datasets/inception_v3_pool3.npz`` WITHOUT the ``pretrained``
stamp: scoring with it requires the explicit ``--features inception-unverified``
spec, and the numbers are pipeline-rehearsal values, never Inception FIDs.

Usage:  python experiments/make_inception_rehearsal.py [--out PATH] [--seed N]

With real weights available instead, see datasets/README.md for the one-liner
that writes a ``pretrained=True`` file from torchvision or keras.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_randomized_keras_inception(seed: int = 0):
    import tf_keras

    model = tf_keras.applications.InceptionV3(
        weights=None, include_top=False, pooling="avg", input_shape=(299, 299, 3)
    )
    # He-scale the glorot-initialized kernels (a relu trunk at glorot scale
    # decays ~0.5x variance per layer and 48 layers deep the features
    # underflow); randomize BN stats/offsets so conversion folding is real.
    rng = np.random.default_rng(seed)
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


def main(argv=None) -> None:
    from tinyedm_tpu.utils.inception import DEFAULT_WEIGHTS, convert_keras_inception, save_converted

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", default=str(DEFAULT_WEIGHTS))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    model = build_randomized_keras_inception(args.seed)
    params = convert_keras_inception(model)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_converted(params, out, tf_avgpool=True, pretrained=False)
    print(
        f"wrote REHEARSAL (pretrained=False) InceptionV3 pool3 weights to {out}\n"
        "scoring with them requires --features inception-unverified; the "
        "numbers are pipeline-rehearsal values, not Inception FIDs"
    )


if __name__ == "__main__":
    main()
