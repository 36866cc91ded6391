"""Compare fused-attention kernel variants on the real TPU.

Tunnel dispatch costs ~1-2 ms per jit call, swamping sub-ms kernels, so each
variant runs CHAIN times inside one jit with a data dependency between
iterations; the reported per-iter time includes one full elementwise pass
over qkv (identical across variants — only deltas are meaningful).

Usage: python experiments/bench_attn_variants.py
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

B, C, HEADS = 256, 256, 4
CHAIN = 32
WARMUP, ITERS = 2, 5


def time_chain(step) -> float:
    """step(qkv) -> qkv'; returns ms per chain iteration."""

    def chain(qkv):
        return jax.lax.fori_loop(0, CHAIN, lambda i, q: step(q), qkv)

    f = jax.jit(chain)
    return f


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
        qkv0 = (
            jax.random.normal(jax.random.PRNGKey(0), (B, n, 3 * C)) * 0.7
        ).astype(jnp.bfloat16)
        g = (jax.random.normal(jax.random.PRNGKey(1), (B, n, C)) * 0.5).astype(
            jnp.bfloat16
        )

        variants = (
            [("switch bb4", 4, False), ("unroll bb4", 4, True), ("unroll bb8", 8, True)]
            if n == 256
            else [("switch bb16", 16, False), ("unroll bb16", 16, True), ("unroll bb32", 32, True)]
        )
        for label, bb, unroll in variants:
            def fstep(q, bb=bb, unroll=unroll):
                o = _fwd_impl(q, HEADS, interpret=False, bb=bb, unroll=unroll)
                return q + jnp.concatenate([o, o, o], axis=-1) * jnp.bfloat16(1e-7)

            def bstep(q, bb=bb, unroll=unroll):
                o = _fwd_impl(q, HEADS, interpret=False, bb=min(bb, 8), unroll=False)
                d = _bwd_impl(q, g, o, HEADS, interpret=False, bb=bb, unroll=unroll)
                return q + d * jnp.bfloat16(1e-7)

            try:
                tf = run(time_chain(fstep), qkv0)
            except Exception as e:
                tf = float("nan")
            try:
                tb = run(time_chain(bstep), qkv0)
            except Exception:
                tb = float("nan")
            print(
                f"n={n:4d} {label:12s}: fwd-chain {tf:7.3f} ms  fwd+bwd-chain {tb:7.3f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
