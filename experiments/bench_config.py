"""Time the jitted train step for any shipped config at a given per-chip
batch (the ad-hoc harness behind BENCH.md's ImageNet-64/-512 tables, made
permanent). Prints step time, samples/s/chip, and achieved TF/s from XLA's
own cost analysis.

Usage: python experiments/bench_config.py --config imagenet --batch 64
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from tinyedm_tpu.utils.tpu import tune_for_tpu

tune_for_tpu()

WARMUP, ITERS = 3, 10


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="cifar10")
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()

    from _common import build_compiled_step

    s = build_compiled_step(args.config, args.batch)
    compiled, state, size, ch, batch = s.compiled, s.state, s.size, s.channels, s.batch
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = 0.0
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(state.params))

    for _ in range(WARMUP):
        state, metrics = compiled(state, s.feed, s.key, s.sched)
    float(metrics["train_loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = compiled(state, s.feed, s.key, s.sched)
    assert np.isfinite(float(metrics["train_loss"]))
    dt = (time.perf_counter() - t0) / ITERS

    from tinyedm_tpu.utils.profiling import device_memory_stats

    mem = next(iter(device_memory_stats().values()), None) or {}
    peak = mem.get("peak_bytes_in_use")
    print(
        f"{args.config}: {n_params/1e6:.1f}M params, batch {batch}, "
        f"{size}x{size}x{ch} -> step {dt*1e3:.1f} ms, "
        f"{batch/dt:.1f} samples/s/chip"
        + (f", {flops/dt/1e12:.1f} TF/s" if flops else "")
        + (f", peak HBM {peak/2**30:.2f} GiB" if peak else "")
    )


if __name__ == "__main__":
    main()
