"""Trace the 32-step Heun sampler at two batch sizes and print per-category
op time normalized PER SAMPLE, to localize the batch-scaling anomaly
(86.6 img/s at batch 128 vs 71.9 at 512, round-1 BENCH.md).

Usage: python experiments/profile_sampler.py [--batches 128 512] [--top N]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import shutil
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from tinyedm_tpu.utils.tpu import tune_for_tpu

tune_for_tpu()


def build():
    from tinyedm_tpu.config.registry import instantiate, load_config
    from tinyedm_tpu.diffusion.solver import DeterministicSolver
    from tinyedm_tpu.training.train_step import init_train_state

    cfg = load_config("experiments/conf/cifar10.yaml")
    spec = instantiate(cfg["model"])
    model = spec.build_model(inference_fast=True)
    base = spec.build_model()
    img = jnp.zeros((8, 32, 32, 3), jnp.float32)
    state = init_train_state(
        jax.random.PRNGKey(0), base, img, spec.build_optimizer_config(), None
    )
    variables = {"params": state.params, "constants": state.constants}
    solver = DeterministicSolver(num_steps=32, dtype="float32")

    def sample(x0):
        def denoise_fn(x, sigma, lab):
            return model.apply(variables, x, sigma, None)

        return solver.solve(denoise_fn, x0)

    return jax.jit(sample)


def capture(sample, batch: int, tracedir: str) -> float:
    import time

    x0 = jax.random.normal(jax.random.PRNGKey(2), (batch, 32, 32, 3))
    float(sample(x0).sum())  # compile
    t0 = time.perf_counter()
    float(sample(x0).sum())
    dt = time.perf_counter() - t0
    jax.profiler.start_trace(tracedir)
    float(sample(x0).sum())
    jax.profiler.stop_trace()
    return dt


def summarize(tracedir: str, batch: int, top: int):
    paths = sorted(glob.glob(f"{tracedir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    by_cat = defaultdict(float)
    by_name = defaultdict(float)
    total = 0.0
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or not e.get("dur"):
            continue
        cat = (e.get("args", {}) or {}).get("hlo_category") or ""
        if not cat:
            continue
        us_per_sample = e["dur"] / batch
        by_cat[cat] += us_per_sample
        by_name[f"{cat:22s} {e['name']}"] += us_per_sample
        total += us_per_sample
    print(f"\n== batch {batch}: us/sample by category (total {total:.1f}) ==")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{us:9.2f}  {cat}")
    print(f"== top {top} ops (us/sample) ==")
    for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{us:9.2f}  {name[:120]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[128, 512])
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()
    sample = build()
    for b in args.batches:
        tracedir = f"/tmp/tinyedm_sampler_{b}"
        shutil.rmtree(tracedir, ignore_errors=True)
        dt = capture(sample, b, tracedir)
        print(f"\nbatch {b}: {dt:.3f} s/solve = {b / dt:.1f} img/s")
        summarize(tracedir, b, args.top)


if __name__ == "__main__":
    main()
