"""Compile the full train step of EVERY shipped config on the current
backend (the real TPU when run in this environment). Catches the bug
classes the CPU test suite structurally cannot: Mosaic kernel-lowering
limits at particular shapes and scoped-VMEM budget overruns — both of
which shipped broken configs in round 2 (imagenet512 C=768 VMEM OOM,
MNIST n=49 attention concat) despite 200 green tests.

Run after any kernel or dispatch change:
    python experiments/compile_check.py            # all configs
    python experiments/compile_check.py mnist ...  # subset
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from tinyedm_tpu.utils.tpu import tune_for_tpu

tune_for_tpu()

# config name -> (batch, H, W, C) for the compile probe (small batches:
# compile coverage, not perf)
SHAPES = {
    "smoke": (8, 16, 16, 3),
    "mnist": (16, 28, 28, 1),
    "cifar10": (16, 32, 32, 3),
    "imagenet": (8, 64, 64, 4),
    "imagenet512": (8, 64, 64, 4),
}


def check(name: str) -> None:
    from tinyedm_tpu.config.registry import instantiate, load_config
    from tinyedm_tpu.parallel.mesh import (
        ShardingPlan,
        make_mesh,
        replicate_state,
        shard_batch,
    )
    from tinyedm_tpu.training.train_step import init_train_state, make_train_step

    cfg = load_config(f"experiments/conf/{name}.yaml")
    spec = instantiate(cfg["model"])
    model = spec.build_model()
    shape = SHAPES[name]
    img = jnp.zeros(shape, jnp.float32)
    labels = jnp.zeros((shape[0],), jnp.int32) if model.conditional else None
    t0 = time.perf_counter()
    state = init_train_state(
        jax.random.PRNGKey(0),
        model,
        img,
        spec.build_optimizer_config(),
        spec.build_ema_config(),
        sample_labels=labels,
    )
    mesh = make_mesh()
    plan = ShardingPlan(mesh)
    state = replicate_state(mesh, state)
    step = plan.jit_train_step(
        make_train_step(
            model, spec.diffuser, spec.build_optimizer_config(), spec.build_ema_config()
        )
    )
    batch = shard_batch(
        mesh, (jnp.zeros(shape, jnp.float32), jnp.zeros((shape[0],), jnp.int32))
    )
    step.lower(state, batch, jax.random.PRNGKey(1), jnp.asarray(5.0)).compile()
    print(
        f"{name:12s}: train step compiles OK "
        f"({time.perf_counter() - t0:.0f}s, backend={jax.default_backend()})",
        flush=True,
    )


def check_block_kernel() -> None:
    """Opt-in whole-block attention at narrow AND wide channels: the narrow
    case must compile the Pallas block kernel fwd+bwd on-chip (VMEM budget
    honored); the wide case (C=768, where the bwd dW accumulators alone
    approach the budget) must FALL BACK to the unfused path and still
    compile — the exact on-chip-only failure class this script exists for."""
    from tinyedm_tpu.models.layers import CosineAttention
    from tinyedm_tpu.ops.fused_attention import block_kernel_fits

    t0 = time.perf_counter()
    for c, n_side, heads in ((256, 16, 4), (768, 8, 4)):
        layer = CosineAttention(num_heads=heads, dtype=jnp.bfloat16, fused="block")
        x = jnp.zeros((8, n_side, n_side, c), jnp.bfloat16)
        variables = layer.init(jax.random.PRNGKey(0), x)

        def loss(v, x):
            return jnp.sum(layer.apply(v, x).astype(jnp.float32) ** 2)

        jax.jit(jax.grad(loss)).lower(variables, x).compile()
        fits = block_kernel_fits(n_side * n_side, c, heads)
        print(
            f"block C={c:4d} n={n_side * n_side}: fwd+bwd compile OK "
            f"({'block kernel' if fits else 'fallback path'})",
            flush=True,
        )
    print(f"block-kernel probes OK ({time.perf_counter() - t0:.0f}s)", flush=True)


def main() -> None:
    names = sys.argv[1:] or list(SHAPES) + ["block_kernel"]
    failed = []
    for name in names:
        try:
            check_block_kernel() if name == "block_kernel" else check(name)
        except Exception as e:  # noqa: BLE001 — report all, fail at end
            failed.append(name)
            print(f"{name:12s}: FAILED — {type(e).__name__}: {str(e)[:300]}", flush=True)
    if failed:
        sys.exit(f"compile check failed for: {', '.join(failed)}")
    print("all configs compile.")


if __name__ == "__main__":
    main()
