"""Sampler throughput harness: img/s for (solver, num_steps, batch) combos
on a shipped config's model (random weights — sampling cost is
weight-independent). The permanent tool for Heun-vs-multistep numbers in
BENCH.md; measure on an IDLE chip and compare only within this harness.

Usage:
  python experiments/bench_sampler.py [--config cifar10] [--batch 128]
      [--combos heun:32 dpmpp2m:32 dpmpp2m:16]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from tinyedm_tpu.utils.tpu import tune_for_tpu

tune_for_tpu()


def build(config: str):
    from experiments._common import train_shapes
    from tinyedm_tpu.config.registry import instantiate, load_config
    from tinyedm_tpu.training.train_step import init_train_state

    cfg = load_config(f"experiments/conf/{config}.yaml")
    spec = instantiate(cfg["model"])
    model = spec.build_model(inference_fast=True)
    base = spec.build_model()
    size, chans, _, _ = train_shapes(cfg)
    img = jnp.zeros((8, size, size, chans), jnp.float32)
    state = init_train_state(
        jax.random.PRNGKey(0), base, img, spec.build_optimizer_config(), None
    )
    variables = {"params": state.params, "constants": state.constants}
    return model, variables, size, chans


def make_solver(name: str, steps: int):
    from tinyedm_tpu.diffusion.solver import DeterministicSolver, MultistepSolver

    if name == "heun":
        return DeterministicSolver(num_steps=steps, dtype="float32")
    if name == "dpmpp2m":
        return MultistepSolver(num_steps=steps, dtype="float32")
    raise SystemExit(f"unknown solver {name!r}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="cifar10")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--combos", nargs="+", default=["heun:32", "dpmpp2m:32", "dpmpp2m:16"],
        help="solver:num_steps pairs",
    )
    args = ap.parse_args()

    model, variables, size, chans = build(args.config)
    x0 = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, size, size, chans), jnp.float32
    )

    print(f"config={args.config} batch={args.batch} ({size}x{size}x{chans})")
    for combo in args.combos:
        name, steps_s = combo.split(":")
        solver = make_solver(name, int(steps_s))

        @jax.jit
        def sample(x0):
            return solver.solve(
                lambda x, s, l: model.apply(variables, x, s, l), x0, None
            )

        jax.block_until_ready(sample(x0))  # compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(sample(x0))
            best = min(best, time.perf_counter() - t0)
        fwd = 2 * int(steps_s) - 1 if name == "heun" else int(steps_s)
        print(
            f"{name:>8}:{steps_s:<3} {args.batch / best:8.1f} img/s "
            f"({best * 1e3:7.1f} ms/batch, {fwd} forwards)"
        )


if __name__ == "__main__":
    main()
