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
import jax.numpy as jnp
import numpy as np

from tinyedm_tpu.utils.tpu import tune_for_tpu

tune_for_tpu()

WARMUP, ITERS = 3, 10


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="cifar10")
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()

    from tinyedm_tpu.config.registry import instantiate, load_config
    from tinyedm_tpu.parallel.mesh import (
        ShardingPlan,
        make_mesh,
        replicate_state,
        shard_batch,
    )
    from tinyedm_tpu.training.train_step import init_train_state, make_train_step

    cfg = load_config(f"experiments/conf/{args.config}.yaml")
    spec = instantiate(cfg["model"])
    model = spec.build_model()
    opt_cfg = spec.build_optimizer_config()
    ema_cfg = spec.build_ema_config()

    dm_cfg = cfg.get("datamodule", {})
    # latent datamodules carry no image_size key; EDM2 latent configs are
    # 64x64 (512px images through the f8 VAE)
    default_size = 64 if "latents" in str(dm_cfg.get("_target_", "")).lower() or "latpack" in str(dm_cfg.get("_target_", "")).lower() else 32
    size = int(dm_cfg.get("image_size", default_size))
    mdl_cfg = cfg["model"].get("denoiser", cfg["model"])
    ch = int(mdl_cfg.get("in_channels", 3))
    batch = args.batch or int(dm_cfg.get("batch_size", 256))
    n_classes = cfg["model"].get("embedding", {}).get("num_classes")

    mesh = make_mesh()
    plan = ShardingPlan(mesh)
    img = jnp.zeros((batch, size, size, ch), jnp.float32)
    init_labels = jnp.zeros((batch,), jnp.int32) if n_classes else None
    state = init_train_state(
        jax.random.PRNGKey(0), model, img, opt_cfg, ema_cfg, sample_labels=init_labels
    )
    state = replicate_state(mesh, state)
    step = plan.jit_train_step(make_train_step(model, spec.diffuser, opt_cfg, ema_cfg))

    rng = np.random.default_rng(0)
    labels = (
        rng.integers(0, n_classes, (batch,)).astype(np.int32)
        if n_classes
        else np.zeros((batch,), np.int32)
    )
    batch_dev = shard_batch(
        mesh, (rng.standard_normal((batch, size, size, ch), dtype=np.float32) * 0.5, labels)
    )

    key = jax.random.PRNGKey(1)
    sched = jnp.asarray(250.0)
    compiled = step.lower(state, batch_dev, key, sched).compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = 0.0
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(state.params))

    for _ in range(WARMUP):
        state, metrics = compiled(state, batch_dev, key, sched)
    float(metrics["train_loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = compiled(state, batch_dev, key, sched)
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
