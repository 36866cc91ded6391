"""Write reference PNGs of the soak's synthetic data law for FID sweeps.

The real-chip soak (experiments/soak.py) trains on smooth class templates +
pixel noise in normalized space (std 0.5, matching sigma_data). To run the
FID machinery against its checkpoints (`eval_fid.py sweep`), reference
statistics need a sample of that SAME distribution rendered exactly the way
generated samples are rendered: the PreditionWriter mapping
``x * std * 2 + mean -> clamp [0,1] -> uint8`` with the CIFAR-10 stats
(reference: generate.py:31-34, callbacks.py:141-156). This script writes N
such PNGs; feed the directory to ``eval_fid.py stats --format png_dir``.

Usage: python experiments/soak_reference_pngs.py --out /tmp/soak_ref --num 2048
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from soak import make_templates  # noqa: E402

from tinyedm_tpu.generate import CIFAR10_MEAN, CIFAR10_STD  # noqa: E402
from tinyedm_tpu.training.callbacks import PreditionWriter  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    templates = make_templates()
    rng = np.random.default_rng(args.seed)
    writer = PreditionWriter(args.out, "batch", CIFAR10_MEAN, CIFAR10_STD)
    for start in range(0, args.num, args.batch):
        n = min(args.batch, args.num - start)
        cls = rng.integers(0, templates.shape[0], n)
        x = templates[cls] + rng.normal(scale=0.1, size=(n, 32, 32, 3)).astype(
            np.float32
        )
        writer.write_batch(x, list(range(start, start + n)))
    print(f"wrote {args.num} reference PNGs to {args.out}")


if __name__ == "__main__":
    main()
