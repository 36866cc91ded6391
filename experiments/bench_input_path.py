"""A/B the trainer input path: host-normalized f32 batches vs device_preprocess.

The bare jitted step runs at ~157 ms (bench.py) but the end-to-end Trainer
loop pays host batch work + the host->device transfer serially with dispatch
(BENCH.md round 3: ~163 ms/step; threading the input path made it 60% WORSE
over this tunnel — negative result, do not re-thread). ``device_preprocess``
attacks the same overhead without threads: ship uint8 + flip flags (0.77 MB
vs 3 MB per CIFAR batch) and normalize/flip inside the jitted step.

Runs the REAL Trainer loop (shuffle, augment, shard, log cadence) on a
CIFAR-shaped synthetic uint8 dataset with hflip augmentation, both arms,
and reports per-epoch samples/s after the compile epoch.

Run: python experiments/bench_input_path.py --steps-per-epoch 100 --epochs 4
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--steps-per-epoch", type=int, default=100)
    parser.add_argument("--epochs", type=int, default=4)
    parser.add_argument("--arm", choices=["host", "device", "both"], default="both")
    args = parser.parse_args()

    from tinyedm_tpu.config.registry import instantiate, load_config
    from tinyedm_tpu.data.datamodules import SyntheticDataModule
    from tinyedm_tpu.training.trainer import Trainer
    from tinyedm_tpu.utils.tpu import tune_for_tpu

    tune_for_tpu()

    class FlippedSynthetic(SyntheticDataModule):
        """CIFAR-shaped uint8 synthetic data WITH hflip augmentation, so the
        host arm pays the same augment cost the CIFAR pipeline does."""

        raw_flip = True

        def _flip_flags(self, n, rng):
            return rng.random(n) < 0.5

    cfg = load_config(Path(__file__).parent / "conf" / "cifar10.yaml")
    spec = instantiate(cfg["model"])

    results = {}
    arms = ("host", "device") if args.arm == "both" else (args.arm,)
    for arm in arms:
        dm = FlippedSynthetic(
            batch_size=args.batch,
            image_size=32,
            num_channels=3,
            num_samples=args.batch * args.steps_per_epoch,
        )
        out = Path("runs") / f"bench_input_{arm}"
        # the logger appends: drop rows from previous invocations
        (out / "metrics.jsonl").unlink(missing_ok=True)
        trainer = Trainer(
            spec=spec,
            datamodule=dm,
            max_epochs=args.epochs,
            check_val_every_n_epoch=10**6,
            ckpt_every_n_epochs=10**6,
            log_every_n_steps=10**6,
            out_dir=out,
            seed=0,
            device_preprocess=(arm == "device"),
        )
        t0 = time.time()
        trainer.fit()
        wall = time.time() - t0
        # per-epoch samples/s from the metrics the trainer already logs
        rates = [
            json.loads(line)["samples_per_sec"]
            for line in open(out / "metrics.jsonl")
            if "samples_per_sec" in line
        ]
        steady = rates[1:] if len(rates) > 1 else rates  # drop compile epoch
        results[arm] = {
            "per_epoch_samples_per_s": [round(r, 1) for r in rates],
            "steady_mean": round(float(np.mean(steady)), 1),
            "wall_s": round(wall, 1),
        }
        print(f"{arm}: {results[arm]}", flush=True)
    if len(results) == 2:
        h, d = results["host"]["steady_mean"], results["device"]["steady_mean"]
        print(f"device_preprocess speedup: {d / h:.3f}x "
              f"({h} -> {d} samples/s end-to-end)")


if __name__ == "__main__":
    main()
