"""Capture a device trace of the CIFAR train step and print the op-time
breakdown, aggregated by fusion kind. Reads the perfetto trace.json.gz the
jax profiler writes.

Usage: python experiments/profile_step.py [--sampler] [--top N]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from tinyedm_tpu.utils.tpu import tune_for_tpu

tune_for_tpu()

BATCH = 256


def capture(tracedir: str, config: str = "cifar10", batch: int | None = None) -> None:
    from tinyedm_tpu.config.registry import instantiate, load_config
    from tinyedm_tpu.parallel.mesh import (
        ShardingPlan,
        make_mesh,
        replicate_state,
        shard_batch,
    )
    from tinyedm_tpu.training.train_step import init_train_state, make_train_step

    cfg = load_config(f"experiments/conf/{config}.yaml")
    spec = instantiate(cfg["model"])
    model = spec.build_model()
    opt_cfg = spec.build_optimizer_config()
    ema_cfg = spec.build_ema_config()

    dm_cfg = cfg.get("datamodule", {})
    tgt = str(dm_cfg.get("_target_", "")).lower()
    default_size = 64 if ("latents" in tgt or "latpack" in tgt) else 32
    size = int(dm_cfg.get("image_size", default_size))
    mdl_cfg = cfg["model"].get("denoiser", cfg["model"])
    ch = int(mdl_cfg.get("in_channels", 3))
    bsz = batch or (BATCH if config == "cifar10" else int(dm_cfg.get("batch_size", BATCH)))
    n_classes = cfg["model"].get("embedding", {}).get("num_classes")

    mesh = make_mesh()
    plan = ShardingPlan(mesh)
    img = jnp.zeros((bsz, size, size, ch), jnp.float32)
    init_labels = jnp.zeros((bsz,), jnp.int32) if n_classes else None
    state = init_train_state(
        jax.random.PRNGKey(0), model, img, opt_cfg, ema_cfg, sample_labels=init_labels
    )
    state = replicate_state(mesh, state)
    step = plan.jit_train_step(make_train_step(model, spec.diffuser, opt_cfg, ema_cfg))
    rng = np.random.default_rng(0)
    labels = (
        rng.integers(0, n_classes, (bsz,)).astype(np.int32)
        if n_classes
        else np.zeros((bsz,), np.int32)
    )
    batch = shard_batch(
        mesh,
        (rng.standard_normal((bsz, size, size, ch), dtype=np.float32) * 0.5, labels),
    )
    key = jax.random.PRNGKey(1)
    sched = jnp.asarray(250.0)
    compiled = step.lower(state, batch, key, sched).compile()
    for _ in range(3):
        state, metrics = compiled(state, batch, key, sched)
    float(metrics["train_loss"])
    jax.profiler.start_trace(tracedir)
    for _ in range(5):
        state, metrics = compiled(state, batch, key, sched)
    float(metrics["train_loss"])
    jax.profiler.stop_trace()


def summarize(tracedir: str, top: int, n_steps: int = 5) -> None:
    paths = sorted(glob.glob(f"{tracedir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace found under", tracedir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = [
        e
        for e in trace.get("traceEvents", [])
        if e.get("ph") == "X" and e.get("dur") and "pid" in e
    ]
    # keep device-thread events only (XLA ops carry run ids / hlo names)
    by_name = defaultdict(float)
    by_cat = defaultdict(float)
    total = 0.0
    for e in events:
        name = e.get("name", "")
        args = e.get("args", {})
        hlo_cat = args.get("hlo_category") or ""
        if not hlo_cat:
            continue
        dur_ms = e["dur"] / 1e3 / n_steps
        by_name[f"{hlo_cat:26s} {name}"] += dur_ms
        by_cat[hlo_cat] += dur_ms
        total += dur_ms
    print(f"\n== per-category (ms/step, total {total:.1f}) ==")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{ms:9.2f}  {cat}")
    print(f"\n== top {top} ops (ms/step) ==")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:9.3f}  {name[:150]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--tracedir", default="/tmp/tinyedm_profile")
    ap.add_argument("--no-capture", action="store_true")
    ap.add_argument("--config", default="cifar10")
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()
    if not args.no_capture:
        import shutil

        shutil.rmtree(args.tracedir, ignore_errors=True)
        capture(args.tracedir, args.config, args.batch)
    summarize(args.tracedir, args.top)


if __name__ == "__main__":
    main()
