"""Stand-in FID feature extractor for tests (no torchvision/weights in this
environment): downsampled pixel statistics are enough to exercise the
stats/score pipeline."""

import numpy as np


def feature_fn():
    def fn(images: np.ndarray) -> np.ndarray:
        x = np.asarray(images, np.float64)
        # 4x4x3 average-pooled pixels as a 48-d feature
        n, h, w, c = x.shape
        fh, fw = max(h // 4, 1), max(w // 4, 1)
        x = x[:, : fh * 4, : fw * 4]
        x = x.reshape(n, 4, fh, 4, fw, c).mean(axis=(2, 4))
        return x.reshape(n, -1)

    return fn
