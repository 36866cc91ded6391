"""Micro-bench: the flattened 1x1-conv GEMMs at the decoder shapes
((B*H*W, 512) @ (512, 256) at 32x32), chained inside one jit so the axon
tunnel's per-dispatch latency (~1-3 ms) cannot floor sub-ms ops.

Each chain iteration executes an op PAIR with a data dependency:
  fwd+dgrad : g' = g + eps * ((g @ W^T) @ W)
  fwd+wgrad : g' = g + eps * (x @ (x^T @ g))
so the reported per-iter time covers two GEMMs of the stated FLOPs each.

Usage: python experiments/bench_1x1_bwd.py
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

WARMUP, ITERS, CHAIN = 2, 5, 32
B, H, W = 256, 32, 32
CI, CO = 512, 256


def run_chain(step, x0) -> float:
    f = jax.jit(lambda x: jax.lax.fori_loop(0, CHAIN, lambda i, v: step(v), x))
    for _ in range(WARMUP):
        out = f(x0)
    _ = float(out.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(x0)
    _ = float(out.reshape(-1)[0])
    return (time.perf_counter() - t0) / (ITERS * CHAIN) * 1e3


def main() -> None:
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (B * H * W, CI)) * 0.5).astype(jnp.bfloat16)
    w = (jax.random.normal(key, (CI, CO)) * 0.05).astype(jnp.bfloat16)
    g0 = (jax.random.normal(key, (B * H * W, CO)) * 0.5).astype(jnp.bfloat16)
    gemm_flops = 2.0 * B * H * W * CI * CO
    eps = jnp.bfloat16(1e-6)

    def fwd_dgrad(g):
        dx = jax.lax.dot_general(  # g @ W^T  (dgrad)
            g, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.bfloat16
        )
        y = jax.lax.dot_general(  # x' @ W  (fwd)
            dx, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.bfloat16
        )
        return g + eps * y

    t = run_chain(fwd_dgrad, g0)
    print(
        f"fwd+dgrad pair: {t:7.3f} ms/iter -> {2 * gemm_flops / t / 1e9:6.1f} TF/s",
        flush=True,
    )

    def fwd_wgrad(g):
        dw = jax.lax.dot_general(  # x^T @ g  (wgrad, K = BHW)
            x, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        y = jax.lax.dot_general(  # x @ dW  (fwd)
            x, dw.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )
        return g + eps * y

    t = run_chain(fwd_wgrad, g0)
    print(
        f"fwd+wgrad pair: {t:7.3f} ms/iter -> {2 * gemm_flops / t / 1e9:6.1f} TF/s",
        flush=True,
    )

    # reference: a square-ish well-shaped GEMM at the same FLOPs
    a = (jax.random.normal(key, (8192, 1024)) * 0.1).astype(jnp.bfloat16)
    bmat = (jax.random.normal(key, (1024, 8192)) * 0.1).astype(jnp.bfloat16)
    ref_flops = 2.0 * 8192 * 1024 * 8192

    def square(c):
        y = jax.lax.dot_general(
            c, bmat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.bfloat16
        )
        return c + eps * jax.lax.dot_general(
            y, bmat, (((1,), (1,)), ((), ())), preferred_element_type=jnp.bfloat16
        )

    t = run_chain(square, a)
    print(
        f"square GEMM pair (8192x1024x8192): {t:7.3f} ms/iter -> "
        f"{2 * ref_flops / t / 1e9:6.1f} TF/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
