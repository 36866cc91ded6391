"""Diagnose what dominates the fused-attention kernel time: sweep head
count (matmul size / lane alignment), with fixed total qkv bytes and FLOPs
roughly proportional to heads*n^2*hd = n^2*C (head-count independent).

heads=4 (hd=64): 8 small K=64 matmuls per chunk, 64-lane slices.
heads=2 (hd=128): 4 matmuls K=128, aligned 128-lane slices.
heads=1 (hd=256): 2 matmuls K=256, no slicing.

If time ~ heads -> per-matmul overhead / lane-slicing dominates.
If time ~ flat -> VPU (n,n)-pass bound (element count is head-independent).

Usage: python experiments/attn_diag.py
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

from tinyedm_tpu.ops.fused_attention import _bwd_impl, _fwd_impl  # noqa: E402

B, C = 256, 256
CHAIN = 32
WARMUP, ITERS = 2, 5


def run(f, qkv) -> float:
    for _ in range(WARMUP):
        out = f(qkv)
    _ = float(out.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(qkv)
    _ = float(out.reshape(-1)[0])
    return (time.perf_counter() - t0) / (ITERS * CHAIN) * 1e3


def main() -> None:
    for n in (256, 64):
        qkv0 = (jax.random.normal(jax.random.PRNGKey(0), (B, n, 3 * C)) * 0.7).astype(
            jnp.bfloat16
        )
        g = (jax.random.normal(jax.random.PRNGKey(1), (B, n, C)) * 0.5).astype(
            jnp.bfloat16
        )
        for heads in (4, 2, 1):
            for bb, unroll in ((4, True), (8, False)):
                def fstep(q, bb=bb, unroll=unroll, heads=heads):
                    o = _fwd_impl(q, heads, interpret=False, bb=bb, unroll=unroll)
                    return q + jnp.concatenate([o, o, o], axis=-1) * jnp.bfloat16(1e-7)

                def bstep(q, bb=bb, unroll=unroll, heads=heads):
                    o = _fwd_impl(q, heads, interpret=False, bb=min(bb, 8), unroll=False)
                    d = _bwd_impl(q, g, o, heads, interpret=False, bb=bb, unroll=unroll)
                    return q + d * jnp.bfloat16(1e-7)

                def chain(step):
                    return jax.jit(
                        lambda q: jax.lax.fori_loop(0, CHAIN, lambda i, x: step(x), q)
                    )

                try:
                    tf = run(chain(fstep), qkv0)
                except Exception:
                    tf = float("nan")
                try:
                    tb = run(chain(bstep), qkv0)
                except Exception:
                    tb = float("nan")
                print(
                    f"n={n:4d} heads={heads} bb={bb} unroll={int(unroll)}: "
                    f"fwd {tf:7.3f} ms   fwd+bwd {tb:7.3f} ms",
                    flush=True,
                )


if __name__ == "__main__":
    main()
