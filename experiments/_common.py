"""Shared harness for the experiments/ diagnostic tools (bench_config,
profile_step, hlo_inspect): load a shipped config, derive its feed shapes,
build the sharded train state, and AOT-compile the jitted train step.

One source of truth for the config-to-shapes heuristics — a new config
convention only needs fixing here, not in every tool.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np


def train_shapes(cfg: dict, batch: int | None = None) -> tuple[int, int, int, int | None]:
    """(image_size, in_channels, batch, num_classes) for a loaded config.

    Latent datamodules carry no image_size key; the EDM2 latent configs are
    64x64 (512px images through the f8 VAE).
    """
    dm_cfg = cfg.get("datamodule", {})
    tgt = str(dm_cfg.get("_target_", "")).lower()
    default_size = 64 if ("latents" in tgt or "latpack" in tgt) else 32
    size = int(dm_cfg.get("image_size", default_size))
    mdl_cfg = cfg["model"].get("denoiser", cfg["model"])
    ch = int(mdl_cfg.get("in_channels", 3))
    bsz = int(batch or dm_cfg.get("batch_size", 256))
    n_classes = cfg["model"].get("embedding", {}).get("num_classes")
    return size, ch, bsz, n_classes


def build_compiled_step(
    config: str, batch: int | None = None, seed: int = 0
) -> SimpleNamespace:
    """Build everything a diagnostic tool needs to run real train steps:
    the AOT-compiled step, the replicated state, a synthetic sharded feed
    (N(0, 0.5) images + random labels when conditional), and the shapes."""
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
    size, ch, bsz, n_classes = train_shapes(cfg, batch)

    mesh = make_mesh()
    plan = ShardingPlan(mesh)
    img = jnp.zeros((bsz, size, size, ch), jnp.float32)
    init_labels = jnp.zeros((bsz,), jnp.int32) if n_classes else None
    state = init_train_state(
        jax.random.PRNGKey(seed), model, img, opt_cfg, ema_cfg,
        sample_labels=init_labels,
    )
    state = replicate_state(mesh, state)
    step = plan.jit_train_step(make_train_step(model, spec.diffuser, opt_cfg, ema_cfg))

    rng = np.random.default_rng(seed)
    labels = (
        rng.integers(0, n_classes, (bsz,)).astype(np.int32)
        if n_classes
        else np.zeros((bsz,), np.int32)
    )
    feed = shard_batch(
        mesh,
        (rng.standard_normal((bsz, size, size, ch), dtype=np.float32) * 0.5, labels),
    )
    key = jax.random.PRNGKey(1)
    sched = jnp.asarray(250.0)
    compiled = step.lower(state, feed, key, sched).compile()
    return SimpleNamespace(
        compiled=compiled,
        state=state,
        feed=feed,
        key=key,
        sched=sched,
        spec=spec,
        model=model,
        mesh=mesh,
        size=size,
        channels=ch,
        batch=bsz,
        n_classes=n_classes,
    )
