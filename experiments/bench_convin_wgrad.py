"""Micro-bench: conv_in's im2col weight-gradient — the skinny (36, BHW) @
(BHW, 256) contraction the round-3 fusion table shows at 8.6 TF/s /
~240 GB/s effective (convert_multiply_fusion.141, 0.56 ms), 3x over its
~0.19 ms HBM floor (dout 134 MB + padded image 2.4 MB at 819 GB/s).

Candidate forms, all computing the SAME dW (fp32-accumulated to bf16):
  A. flat dot, contract dim0 — what autodiff of the im2col forward emits
  B. split-K: (G, K/G, 36)^T @ (G, K/G, 256) batched dot -> sum over G —
     gives the MXU G independent output tiles instead of one 36x256 tile
  C. conv-emitter wgrad (the form the im2col rewrite replaced)

Usage: python experiments/bench_convin_wgrad.py
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

WARMUP, ITERS = 3, 30
B, H, W, CI, CO = 256, 32, 32, 4, 256
K = B * H * W
M = 9 * CI  # 36


CHAIN = 10


def time_fn(fn, *args):
    # chain CHAIN data-dependent evaluations inside ONE jit: per-dispatch
    # latency over the device tunnel is 1-3 ms, swamping sub-ms ops
    def chained(*a):
        acc = None
        for i in range(CHAIN):
            scale = jnp.bfloat16(1.0) if acc is None else (
                jnp.bfloat16(1.0) + (acc.reshape(-1)[0] * jnp.bfloat16(1e-24))
            )
            out = fn(a[0] * scale, *a[1:])
            acc = out if acc is None else acc + out
        return acc

    f = jax.jit(chained)
    out = f(*args)
    for _ in range(WARMUP):
        out = f(*args)
    float(np.asarray(out).sum())
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    float(np.asarray(out).sum())
    return (time.perf_counter() - t0) / (ITERS * CHAIN)


def main() -> None:
    key = jax.random.PRNGKey(0)
    patches = jax.random.normal(key, (K, M), jnp.bfloat16)
    dout = jax.random.normal(key, (K, CO), jnp.bfloat16)
    x = jax.random.normal(key, (B, H, W, CI), jnp.bfloat16)
    dy = dout.reshape(B, H, W, CO)

    def form_a(p, d):
        return jax.lax.dot_general(
            p, d, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    def make_form_b(g):
        def form_b(p, d):
            pk = p.reshape(g, K // g, M)
            dk = d.reshape(g, K // g, CO)
            parts = jax.lax.dot_general(
                pk, dk, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (g, M, CO)
            return parts.sum(axis=0).astype(jnp.bfloat16)

        return form_b

    def form_c(xx, dd):
        w0 = jnp.zeros((3, 3, CI, CO), jnp.bfloat16)

        def f(w):
            return jax.lax.conv_general_dilated(
                xx, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            )

        _, vjp = jax.vjp(f, w0)
        return vjp(dd)[0]

    flops = 2 * K * M * CO
    bytes_min = K * M * 2 + K * CO * 2
    print(f"shape: ({M}, {K}) @ ({K}, {CO});  {flops/1e9:.1f} GFLOP, "
          f"{bytes_min/2**20:.0f} MB min traffic -> HBM floor "
          f"{bytes_min/819e9*1e3:.2f} ms")
    t = time_fn(form_a, patches, dout)
    print(f"A flat dot           : {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s")
    for g in (8, 32, 128, 512):
        t = time_fn(make_form_b(g), patches, dout)
        print(f"B split-K g={g:<4d}     : {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s")
    t = time_fn(form_c, x, dy)
    print(f"C conv-emitter wgrad : {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s")

    def form_d(xx, d):
        # regenerate patches from the padded image inside the bwd, pin them,
        # then the flat dot — what a custom_vjp bwd would run
        b, h, w, ci = xx.shape
        xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))
        p = jnp.concatenate(
            [xp[:, i : i + h, j : j + w, :] for i in range(3) for j in range(3)],
            axis=-1,
        ).reshape(-1, 9 * ci)
        p = jax.lax.optimization_barrier(p)
        return jax.lax.dot_general(
            p, d, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    t = time_fn(form_d, x, dout)
    print(f"D regen+pin+flat dot : {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s")

    def form_e(xx, d):
        # fused regeneration (no pin) — the current in-step wgrad form
        b, h, w, ci = xx.shape
        xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))
        p = jnp.concatenate(
            [xp[:, i : i + h, j : j + w, :] for i in range(3) for j in range(3)],
            axis=-1,
        ).reshape(-1, 9 * ci)
        return jax.lax.dot_general(
            p, d, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    t = time_fn(form_e, x, dout)
    print(f"E regen fused (now)  : {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
