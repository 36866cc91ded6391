"""Collective inventory of the sharded hot programs, as a bytes-moved table.

Compiles the train step (and optionally the sampler) for a shipped config on
a virtual N-device CPU mesh and prints every communication collective in the
optimized HLO with payload bytes and per-chip wire bytes (ring algorithm
estimates, payload = HLO result bytes: all-reduce 2(n-1)/n x payload,
all-gather (n-1)/n x payload, reduce-scatter (n-1) x payload (its result is
the 1/n shard of the reduced input), all-to-all (n-1)/n x payload,
collective-permute exactly its payload once). Collectives inside while-loop
bodies (lax.scan — e.g. the sampler's Heun scan) appear once in the static
HLO but execute once per trip; they are totaled separately with a per-trip
label so the wire number is never silently understated by the trip count.
Source for the table in docs/PERFORMANCE.md and the positive assertions in
tests/test_collective_audit.py.

Usage:
  python experiments/collective_audit.py --config cifar10 --batch 32
  python experiments/collective_audit.py --config cifar10 --model_parallel 2 --zero1
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="cifar10")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--model_parallel", type=int, default=1)
    ap.add_argument("--zero1", action="store_true")
    ap.add_argument("--sampler", action="store_true", help="audit the Heun solve too")
    args = ap.parse_args()

    # virtual CPU mesh before any jax import (the audit is about program
    # structure, not speed; no real multi-chip hardware exists here)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from tinyedm_tpu.config.registry import instantiate, load_config
    from tinyedm_tpu.parallel.audit import collective_inventory, while_body_computations
    from tinyedm_tpu.parallel.mesh import (
        ShardingPlan,
        batch_sharding,
        make_mesh,
        place_state,
        shard_batch,
    )
    from tinyedm_tpu.training.train_step import init_train_state, make_train_step

    from _common import train_shapes

    repo = Path(__file__).resolve().parents[1]
    cfg = load_config(str(repo / "experiments" / "conf" / f"{args.config}.yaml"))
    spec = instantiate(cfg["model"])
    model = spec.build_model()
    opt_cfg = spec.build_optimizer_config()
    ema_cfg = spec.build_ema_config()
    size, ch, _, n_classes = train_shapes(cfg, args.batch)
    bsz = args.batch

    mesh = make_mesh(model_parallel=args.model_parallel)
    img = jnp.zeros((bsz, size, size, ch), jnp.float32)
    labels = np.zeros((bsz,), np.int32)
    state = init_train_state(
        jax.random.PRNGKey(0), model, img, opt_cfg, ema_cfg,
        sample_labels=jnp.asarray(labels) if n_classes else None,
    )
    param_bytes = sum(x.size * 4 for x in jax.tree_util.tree_leaves(state.params))
    state = place_state(mesh, state, zero1=args.zero1)
    plan = ShardingPlan(mesh, zero1=args.zero1)
    step = plan.jit_train_step(
        make_train_step(model, spec.diffuser, opt_cfg, ema_cfg), state=state
    )
    batch = shard_batch(mesh, (np.asarray(img), labels))
    print(
        f"compiling train step: config={args.config} batch={bsz} "
        f"mesh={dict(mesh.shape)} zero1={args.zero1} "
        f"params={param_bytes/1e6:.1f} MB fp32 ...",
        flush=True,
    )
    txt = (
        step.lower(state, batch, jax.random.PRNGKey(1), jnp.asarray(0.0))
        .compile()
        .as_text()
    )
    inv = collective_inventory(txt)
    _report("train step", inv, param_bytes, mesh, while_body_computations(txt))

    if args.sampler:
        from tinyedm_tpu.diffusion.solver import DeterministicSolver

        solver = DeterministicSolver(num_steps=4)
        # sample from EMA weights like the generate CLI; configs without an
        # EMA profile (use_ema: false) sample from the train params
        sample_params = state.ema[0] if state.ema else state.params

        def sample(params, constants, x0, labs):
            return solver.solve(
                lambda x, s, l: model.apply(
                    {"params": params, "constants": constants}, x, s, l
                ),
                x0,
                labs if n_classes else None,
            )

        sample_j = jax.jit(
            sample,
            in_shardings=(
                jax.tree_util.tree_map(lambda a: a.sharding, sample_params),
                jax.tree_util.tree_map(lambda a: a.sharding, state.constants),
                batch_sharding(mesh),
                batch_sharding(mesh),
            ),
            out_shardings=batch_sharding(mesh),
        )
        print("compiling sampler ...", flush=True)
        stxt = (
            sample_j.lower(
                sample_params,
                state.constants,
                shard_batch(mesh, np.zeros((bsz, size, size, ch), np.float32)),
                shard_batch(mesh, labels),
            )
            .compile()
            .as_text()
        )
        _report("sampler (4-step Heun scan)", collective_inventory(stxt),
                param_bytes, mesh, while_body_computations(stxt))


def _wire_bytes(c, mesh, group_shape):
    """Ring-algorithm per-chip wire estimate for one collective.

    Payload = HLO result bytes. all-reduce moves 2(n-1)/n x payload
    (reduce-scatter + all-gather halves); all-gather's result is the full
    gathered array, (n-1)/n of which transits the wire; reduce-scatter's
    result is the 1/n output shard, so the wire carries (n-1) x that; an
    all-to-all result is the per-chip shard, (n-1)/n of it leaves the chip;
    a collective-permute sends its payload exactly once regardless of group
    size (point-to-point, no ring)."""
    gs = group_shape(c)
    n = gs[1] if gs else mesh.devices.size
    if c.kind == "all-reduce":
        return c.bytes * 2 * (n - 1) / n
    if c.kind == "all-gather":
        return c.bytes * (n - 1) / n
    if c.kind == "reduce-scatter":
        return c.bytes * (n - 1)
    if c.kind == "all-to-all":
        return c.bytes * (n - 1) / n
    return float(c.bytes)  # collective-permute


def _report(tag, inv, param_bytes, mesh, loop_bodies=frozenset()):
    from tinyedm_tpu.parallel.audit import (
        format_inventory,
        group_shape,
        inventory_summary,
    )

    print(f"\n===== {tag} =====")
    print(f"summary: {inventory_summary(inv)}")
    once = [c for c in inv if c.computation not in loop_bodies]
    looped = [c for c in inv if c.computation in loop_bodies]
    wire = sum(_wire_bytes(c, mesh, group_shape) for c in once)
    print(
        f"payload total: {sum(c.bytes for c in inv)/1e6:.2f} MB; "
        f"ring-estimate wire bytes/chip/step (loop bodies excluded): "
        f"{wire/1e6:.2f} MB (params: {param_bytes/1e6:.2f} MB fp32)"
    )
    if looped:
        lw = sum(_wire_bytes(c, mesh, group_shape) for c in looped)
        print(
            f"PLUS {len(looped)} collective(s) inside while-loop bodies "
            f"(lax.scan): {lw/1e6:.2f} MB wire/chip PER TRIP — multiply by "
            f"the trip count (an n-step Heun solve scans n-1 trips) for "
            f"bytes per execution"
        )
    print(format_inventory(inv))


if __name__ == "__main__":
    main()
