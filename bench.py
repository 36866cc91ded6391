"""Benchmark: CIFAR-10 training throughput (primary) + 32-step Heun sampling.

Runs on the real TPU chip(s) in this environment. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
compares against an analytic A100 estimate: FLOPs/step from XLA's own cost
analysis of the compiled step, at 40% MFU on 312 TFLOP/s bf16 — a generous
stand-in for a well-tuned torch DDP implementation of the same model.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tinyedm_tpu.utils.tpu import tune_for_tpu

# persistent compilation cache + RBG PRNG (threefry dropout masks alone cost
# 99 ms of a 271 ms step on v5e; see utils/tpu.py)
tune_for_tpu()

BATCH = 256
SAMPLE_BATCH = 128
WARMUP = 3
ITERS = 20
# median over several timing passes: a single 20-iter mean is exposed to
# transient host/tunnel noise (a concurrent host process or one slow tunnel
# round-trip moves it ~1 ms); the median of independent passes estimates
# sustained device throughput robustly. Per-pass sync overhead (one host
# read per ITERS steps) is identical to the single-pass form.
PASSES = 5

A100_BF16_FLOPS = 312e12
ASSUMED_A100_MFU = 0.40


def build(mod_fp32: bool = True):
    from tinyedm_tpu.config.registry import instantiate, load_config
    from tinyedm_tpu.parallel.mesh import ShardingPlan, make_mesh, replicate_state, shard_batch
    from tinyedm_tpu.training.train_step import init_train_state, make_train_step

    cfg = load_config("experiments/conf/cifar10.yaml")
    if not mod_fp32:
        cfg["model"]["denoiser"]["mod_fp32"] = False
    spec = instantiate(cfg["model"])
    model = spec.build_model()
    opt_cfg = spec.build_optimizer_config()
    ema_cfg = spec.build_ema_config()

    mesh = make_mesh()
    plan = ShardingPlan(mesh)
    img = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
    state = init_train_state(jax.random.PRNGKey(0), model, img, opt_cfg, ema_cfg)
    state = replicate_state(mesh, state)
    step = plan.jit_train_step(make_train_step(model, spec.diffuser, opt_cfg, ema_cfg))

    rng = np.random.default_rng(0)
    batch_np = (
        rng.standard_normal((BATCH, 32, 32, 3), dtype=np.float32) * 0.5,
        np.zeros((BATCH,), np.int32),
    )
    batch = shard_batch(mesh, batch_np)
    return model, spec, state, step, batch, mesh


def bench_train(state, step, batch):
    """Returns (step_time_s, state, flops_per_step). AOT-compile once; reuse
    the executable for timing and its cost analysis for FLOPs."""
    key = jax.random.PRNGKey(1)
    sched = jnp.asarray(250.0)  # steady-phase LR
    compiled = step.lower(state, batch, key, sched).compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = 0.0
    for _ in range(WARMUP):
        state, metrics = compiled(state, batch, key, sched)
    float(metrics["train_loss"])  # host read: drain the dispatch pipeline
    times = []
    for _ in range(PASSES):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, metrics = compiled(state, batch, key, sched)
        # sync via host read of a step output (block_until_ready alone has
        # been observed to return early over the device tunnel)
        assert np.isfinite(float(metrics["train_loss"]))
        times.append((time.perf_counter() - t0) / ITERS)
    return float(np.median(times)), state, flops


def bench_sampler(model, state, spec=None):
    """Returns (imgs_per_sec, solve_flops_per_batch). The FLOPs come from
    XLA's cost analysis of ONE compiled model forward x the solver's static
    forward count (Heun-32 = 63) — the solve itself is a lax.scan whose body
    XLA's cost analysis counts once, not per trip, so analyzing the solve
    program would undercount 63x. Same bookkeeping as the training baseline
    (cost analysis of OUR compiled program), so the A100 sampling stand-in
    (40% MFU on 312 TF/s bf16) compares like against like."""
    from tinyedm_tpu.diffusion.solver import DeterministicSolver

    if spec is not None:
        model = spec.build_model(inference_fast=True)
    solver = DeterministicSolver(num_steps=32, dtype="float32")
    variables = {"params": state.params, "constants": state.constants}

    def denoise_fn(x, sigma, lab):
        return model.apply(variables, x, sigma, None)

    def sample(x0):
        return solver.solve(denoise_fn, x0)

    x0 = jax.random.normal(jax.random.PRNGKey(2), (SAMPLE_BATCH, 32, 32, 3))
    compiled = jax.jit(sample).lower(x0).compile()
    n_forwards = 2 * solver.num_steps - 1  # Heun: 2 per step, 1 on the last
    try:
        fwd = (
            jax.jit(denoise_fn)
            .lower(x0, jnp.full((SAMPLE_BATCH,), 1.0, jnp.float32), None)
            .compile()
            .cost_analysis()
        )
        if isinstance(fwd, list):
            fwd = fwd[0]
        flops = float(fwd.get("flops", 0.0)) * n_forwards
    except Exception:
        flops = 0.0
    float(compiled(x0).sum())  # warm + drain
    times = []
    for _ in range(3):  # median of 3 passes (same noise argument as training)
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            out = compiled(x0)
        float(out.sum())  # host read sync
        times.append((time.perf_counter() - t0) / n)
    return SAMPLE_BATCH / float(np.median(times)), flops


def main() -> None:
    n_chips = len(jax.devices())
    model, spec, state, step, batch, mesh = build()
    n_params = sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(state.params)
    )

    dt, state, fl = bench_train(state, step, batch)
    samples_per_sec = BATCH / dt
    samples_per_sec_per_chip = samples_per_sec / n_chips

    a100_samples_per_sec = (
        (A100_BF16_FLOPS * ASSUMED_A100_MFU) / (fl / BATCH) if fl else 0.0
    )
    vs_baseline = samples_per_sec / a100_samples_per_sec if a100_samples_per_sec else 0.0

    imgs_per_sec, sample_flops = bench_sampler(model, state, spec)
    # sampling stand-in (VERDICT r3 missing #4): same analytic method as
    # training — solve FLOPs per image at 40% MFU on A100 bf16
    a100_imgs_per_sec = (
        (A100_BF16_FLOPS * ASSUMED_A100_MFU) / (sample_flops / SAMPLE_BATCH)
        if sample_flops
        else 0.0
    )
    sampler_vs_baseline = (
        imgs_per_sec / a100_imgs_per_sec if a100_imgs_per_sec else 0.0
    )

    # optional-knob headroom: bf16 modulation islands (mod_fp32: false in the
    # config; convergence-validated, BENCH.md) — reported as an extra, the
    # primary number stays at strict reference-parity numerics
    _, _, state_f, step_f, batch_f, _ = build(mod_fp32=False)
    dt_f, _, _ = bench_train(state_f, step_f, batch_f)
    fast_samples_per_sec = BATCH / dt_f / n_chips

    print(
        json.dumps(
            {
                "metric": "cifar10_train_samples_per_sec_per_chip",
                "value": round(samples_per_sec_per_chip, 1),
                "unit": "samples/s/chip",
                "vs_baseline": round(vs_baseline, 3),
                "extras": {
                    "params_m": round(n_params / 1e6, 2),
                    "batch": BATCH,
                    "step_time_ms": round(dt * 1e3, 2),
                    "train_flops_per_step": fl,
                    "a100_estimate_samples_per_sec": round(a100_samples_per_sec, 1),
                    "heun32_imgs_per_sec": round(imgs_per_sec, 1),
                    "heun32_a100_estimate_imgs_per_sec": round(a100_imgs_per_sec, 1),
                    "heun32_vs_baseline": round(sampler_vs_baseline, 3),
                    "heun32_flops_per_batch": sample_flops,
                    "samples_per_sec_mod_fp32_false": round(fast_samples_per_sec, 1),
                    "n_chips": n_chips,
                    "chip": str(jax.devices()[0].device_kind),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
