"""Dump the compiled CIFAR train step's HLO and map fusion names to their
convolution ops (kind, shapes, window) so trace hotspots can be attributed.

Usage: python experiments/hlo_inspect.py [names...]   (default: all conv fusions)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from tinyedm_tpu.utils.tpu import tune_for_tpu

tune_for_tpu()

BATCH = 256


def compile_step(config: str = "cifar10", batch: int | None = None):
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
    feed = shard_batch(
        mesh, (np.zeros((bsz, size, size, ch), np.float32), np.zeros((bsz,), np.int32))
    )
    return step.lower(state, feed, jax.random.PRNGKey(1), jnp.asarray(250.0)).compile()


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="cifar10")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    sys.argv = [sys.argv[0]] + args.names  # downstream code reads sys.argv
    compiled = compile_step(args.config, args.batch)
    txt = compiled.as_text()
    Path("/tmp/train_step_hlo.txt").write_text(txt)
    print(f"HLO dumped to /tmp/train_step_hlo.txt ({len(txt)/1e6:.1f} MB)")

    # index: fusion computation name -> list of conv lines inside it
    # fusion instruction lines look like:
    #   %fusion.677 = ... fusion(...), kind=kOutput, calls=%fused_computation.NNN
    fus_to_comp = {}
    for m in re.finditer(r"%?(fusion[.\w]*) = [^\n]*calls=%?([\w.\-]+)", txt):
        fus_to_comp[m.group(1)] = m.group(2)

    # computation bodies: "%fused_computation.NNN (...) {" ... "}"
    comp_convs: dict[str, list[str]] = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"%?([\w.\-]+) \([^)]*\) -> .* \{", line.strip())
        if m:
            cur = m.group(1)
            continue
        if cur and line.strip() == "}":
            cur = None
            continue
        if cur and ("convolution(" in line or "convolution.clone" in line):
            comp_convs.setdefault(cur, []).append(line.strip())

    names = sys.argv[1:]
    if not names:
        names = sorted(fus_to_comp)
    for name in names:
        comp = fus_to_comp.get(name)
        if not comp:
            continue
        convs = comp_convs.get(comp, [])
        if not convs and not names:
            continue
        print(f"\n== {name} -> {comp} ==")
        for c in convs:
            print("   ", c[:400])


if __name__ == "__main__":
    main()
