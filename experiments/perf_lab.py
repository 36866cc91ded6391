"""Perf ablation lab: time the CIFAR train step with components knocked out.

Each ablation monkeypatches one component to (numerically wrong but shape-
and FLOP-comparable) cheap form, to measure that component's true cost in
the fused step — XLA fusion makes per-op trace numbers unreliable, so we
measure end-to-end deltas instead. Results guide which optimizations are
worth building for real (VERDICT round-1 item 2).

Usage: python experiments/perf_lab.py [ablation ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from tinyedm_tpu.utils.tpu import tune_for_tpu

tune_for_tpu()

BATCH = 256
WARMUP = 2
ITERS = 10


def apply_ablation(name: str) -> None:
    import flax.linen as nn

    import tinyedm_tpu.models.blocks as blocks
    import tinyedm_tpu.models.layers as layers

    if name == "baseline":
        return
    if name == "no_wnorm":
        # skip normalize(w) in every forward; stored w is already unit-RMS
        f = lambda w, eps=1e-4: w
        layers.weight_normalize = f
        return
    if name == "no_attn":
        from typing import Any

        class IdentityAttn(nn.Module):
            num_heads: int = 4
            dtype: Any = jnp.float32
            use_pallas: bool = False

            @nn.compact
            def __call__(self, x):
                return x

        blocks.CosineAttention = IdentityAttn
        return
    if name == "no_blk_pixelnorm":
        orig = blocks.pixel_norm
        blocks.pixel_norm = lambda x, axis=-1, eps=1e-4: x
        return
    if name == "no_scalelong":
        from typing import Any

        class OnesGain(nn.Module):
            r: int = 16
            dtype: Any = jnp.float32

            @nn.compact
            def __call__(self, x):
                return jnp.ones_like(x[..., :1])

        blocks.ScaleLong = OnesGain
        return
    if name == "no_dropout":
        return  # handled via config
    if name == "scan_blocks":
        return  # handled via config
    if name == "no_emamod":
        return  # handled in build
    raise ValueError(f"unknown ablation {name}")


def build_and_time(ablation: str) -> tuple[float, float]:
    apply_ablation(ablation)

    from tinyedm_tpu.config.registry import instantiate, load_config
    from tinyedm_tpu.parallel.mesh import (
        ShardingPlan,
        make_mesh,
        replicate_state,
        shard_batch,
    )
    from tinyedm_tpu.training.train_step import init_train_state, make_train_step

    cfg = load_config("experiments/conf/cifar10.yaml")
    if ablation == "no_dropout":
        cfg["model"]["denoiser"]["dropout_rate"] = 0.0
    if ablation == "scan_blocks":
        cfg["model"]["denoiser"]["scan_blocks"] = True
    spec = instantiate(cfg["model"])
    model = spec.build_model()
    opt_cfg = spec.build_optimizer_config()
    ema_cfg = None if ablation == "no_emamod" else spec.build_ema_config()

    mesh = make_mesh()
    plan = ShardingPlan(mesh)
    img = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
    state = init_train_state(jax.random.PRNGKey(0), model, img, opt_cfg, ema_cfg)
    state = replicate_state(mesh, state)
    step = plan.jit_train_step(make_train_step(model, spec.diffuser, opt_cfg, ema_cfg))

    rng = np.random.default_rng(0)
    batch = shard_batch(
        mesh,
        (
            rng.standard_normal((BATCH, 32, 32, 3), dtype=np.float32) * 0.5,
            np.zeros((BATCH,), np.int32),
        ),
    )
    key = jax.random.PRNGKey(1)
    sched = jnp.asarray(250.0)
    t_c0 = time.perf_counter()
    compiled = step.lower(state, batch, key, sched).compile()
    compile_s = time.perf_counter() - t_c0
    for _ in range(WARMUP):
        state, metrics = compiled(state, batch, key, sched)
    float(metrics["train_loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = compiled(state, batch, key, sched)
    assert np.isfinite(float(metrics["train_loss"]))
    dt = (time.perf_counter() - t0) / ITERS
    return dt, compile_s


def main() -> None:
    ablations = sys.argv[1:] or [
        "baseline",
        "no_wnorm",
        "no_attn",
        "no_blk_pixelnorm",
        "no_scalelong",
        "no_dropout",
        "no_emamod",
    ]
    # one ablation per process would be cleaner; monkeypatching is global, so
    # run them via subprocess when multiple are requested
    if len(ablations) > 1:
        import subprocess

        for a in ablations:
            subprocess.run([sys.executable, __file__, a], check=False)
        return
    a = ablations[0]
    dt, compile_s = build_and_time(a)
    print(
        f"ABLATION {a}: step={dt * 1e3:.2f} ms, {BATCH / dt:.0f} samples/s "
        f"(compile {compile_s:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
