"""Measure the per-dispatch overhead left in the wall step time: the same
compiled train step driven (a) one dispatch per step (the trainer's form,
what bench.py times) vs (b) K steps chained inside one jitted lax.scan
(one dispatch per K steps — host out of the loop entirely).

If (b) is materially faster per step, the remaining wall-vs-optime gap is
host/tunnel dispatch cost, recoverable by a multi-step trainer dispatch;
if they match, async dispatch already hides the host and the wall number
is the device number.

Run on the real TPU:  python experiments/bench_multistep.py [--k 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--k", type=int, default=8, help="steps per scan dispatch")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--passes", type=int, default=5)
    args = p.parse_args()

    import bench  # repo-root bench.py: same model/step/batch construction
    import jax
    import jax.numpy as jnp

    from tinyedm_tpu.config.registry import instantiate, load_config
    from tinyedm_tpu.parallel.mesh import (
        ShardingPlan,
        batch_sharding,
        make_mesh,
        replicate_state,
        replicated,
        shard_batch,
    )
    from tinyedm_tpu.training.train_step import init_train_state, make_train_step

    cfg = load_config("experiments/conf/cifar10.yaml")
    spec = instantiate(cfg["model"])
    model = spec.build_model()
    opt_cfg = spec.build_optimizer_config()
    ema_cfg = spec.build_ema_config()

    mesh = make_mesh()
    plan = ShardingPlan(mesh)
    img = jnp.zeros((bench.BATCH, 32, 32, 3), jnp.float32)
    state = init_train_state(jax.random.PRNGKey(0), model, img, opt_cfg, ema_cfg)
    state = replicate_state(mesh, state)
    train_step = make_train_step(model, spec.diffuser, opt_cfg, ema_cfg)

    rng = np.random.default_rng(0)
    batch_np = (
        rng.standard_normal((bench.BATCH, 32, 32, 3), dtype=np.float32) * 0.5,
        np.zeros((bench.BATCH,), np.int32),
    )
    batch = shard_batch(mesh, batch_np)
    key = jax.random.PRNGKey(1)
    sched = jnp.asarray(250.0)

    def fresh_state():
        # the jitted steps donate their state argument; each part needs its
        # own live copy
        return jax.tree_util.tree_map(jnp.copy, state)

    # ---- (a) per-step dispatch (bench.py's measurement)
    step = plan.jit_train_step(train_step)
    compiled = step.lower(state, batch, key, sched).compile()
    st = fresh_state()
    for _ in range(3):
        st, metrics = compiled(st, batch, key, sched)
    float(metrics["train_loss"])
    times = []
    for _ in range(args.passes):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st, metrics = compiled(st, batch, key, sched)
        assert np.isfinite(float(metrics["train_loss"]))
        times.append((time.perf_counter() - t0) / args.iters)
    per_step = float(np.median(times))
    print(f"per-step dispatch: {per_step * 1e3:.2f} ms/step")

    # ---- (b) K steps in one lax.scan dispatch (same numerics modulo the
    # per-step rng split; identical program per iteration)
    rep = replicated(mesh)
    st_sh = plan._state_shardings(state)
    data = batch_sharding(mesh)

    def k_steps2(state, batch, key, sched):
        def body(state, key_i):
            state, metrics = train_step(state, batch, key_i, sched)
            return state, metrics["train_loss"]

        keys = jax.random.split(key, args.k)
        state, losses = jax.lax.scan(body, state, keys)
        return state, losses[-1]

    k_jit = jax.jit(
        plan._with_constraint_mesh(k_steps2),
        in_shardings=(st_sh, data, rep, rep),
        out_shardings=(st_sh, rep),
        donate_argnums=(0,),
    )
    kc = k_jit.lower(state, batch, key, sched).compile()
    st = fresh_state()
    for _ in range(2):
        st, loss = kc(st, batch, key, sched)
    float(loss)
    times = []
    for _ in range(args.passes):
        t0 = time.perf_counter()
        for _ in range(max(1, args.iters // args.k)):
            st, loss = kc(st, batch, key, sched)
        assert np.isfinite(float(loss))
        times.append(
            (time.perf_counter() - t0) / (max(1, args.iters // args.k) * args.k)
        )
    per_scan = float(np.median(times))
    print(f"scan({args.k}) dispatch: {per_scan * 1e3:.2f} ms/step")
    print(
        f"dispatch overhead recoverable: {(per_step - per_scan) * 1e3:.2f} "
        f"ms/step ({(per_step / per_scan - 1) * 100:.1f}%)"
    )


if __name__ == "__main__":
    main()
