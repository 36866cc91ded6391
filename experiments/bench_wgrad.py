"""Micro-bench: 3x3-conv weight-gradient (bwd-filter) — XLA's conv emitter
vs an explicit 9-shifted-slice GEMM rewrite.

The round-2 profile shows wgrad convs at ~78% MFU (AllBatchInSublanes
emitter) across ~36 ms/step. dW[kh,kw,ci,co] = sum_{b,h,w} xpad[b,h+kh,w+kw,ci]
* dy[b,h,w,co] is 9 independent (Ci, BHW)@(BHW, Co) GEMMs — tall-K shapes the
plain dot emitter handles well. If the rewrite wins here, it ships as a
custom_vjp on WNConv's 3x3 path.

Usage: python experiments/bench_wgrad.py
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from tinyedm_tpu.utils.tpu import tune_for_tpu

tune_for_tpu()

WARMUP, ITERS = 3, 20


def wgrad_conv(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """XLA bwd-filter conv: dW (3,3,Ci,Co) exactly as autodiff of the fwd
    NHWC/HWIO conv emits it (the fwd conv is dead code under jit)."""
    ci, co = x.shape[-1], dy.shape[-1]
    w0 = jnp.zeros((3, 3, ci, co), jnp.bfloat16)

    def f(w):
        return jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )

    _, vjp = jax.vjp(f, w0)
    return vjp(dy)[0]


def wgrad_dots(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """9-slice GEMM rewrite: zero-pad x, slice per tap, flatten, dot."""
    b, h, w, ci = x.shape
    co = dy.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dyf = dy.reshape(b * h * w, co)
    taps = []
    for kh in range(3):
        for kw in range(3):
            xs = jax.lax.slice(xp, (0, kh, kw, 0), (b, kh + h, kw + w, ci))
            taps.append(
                jax.lax.dot_general(
                    xs.reshape(b * h * w, ci),
                    dyf,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
    return jnp.stack(taps).reshape(3, 3, ci, co).astype(jnp.bfloat16)


def timeit(fn, *args) -> float:
    f = jax.jit(fn)
    for _ in range(WARMUP):
        out = f(*args)
    _ = float(out.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    _ = float(out.reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main() -> None:
    rng = np.random.default_rng(0)
    for (b, hw, ci, co) in [
        (256, 32, 512, 256),
        (256, 32, 256, 256),
        (256, 16, 512, 256),
        (256, 16, 256, 256),
        (256, 8, 512, 256),
    ]:
        x = jnp.asarray(rng.standard_normal((b, hw, hw, ci)), jnp.bfloat16)
        dy = jnp.asarray(rng.standard_normal((b, hw, hw, co)), jnp.bfloat16)
        gf = 2 * b * hw * hw * 9 * ci * co / 1e9
        t_conv = timeit(wgrad_conv, x, dy)
        t_dots = timeit(wgrad_dots, x, dy)
        ref = jax.jit(wgrad_conv)(x, dy).astype(jnp.float32)
        alt = jax.jit(wgrad_dots)(x, dy).astype(jnp.float32)
        rel = float(jnp.linalg.norm(ref - alt) / (jnp.linalg.norm(ref) + 1e-9))
        print(
            f"B{b} {hw}x{hw} {ci}->{co}: conv {t_conv:7.3f} ms ({gf/t_conv:6.1f} TF/s) "
            f"dots {t_dots:7.3f} ms ({gf/t_dots:6.1f} TF/s)  rel-diff {rel:.2e}"
        )


if __name__ == "__main__":
    main()
