"""Micro-benchmark the fused cosine-attention kernels on the real TPU.

Times fwd and fwd+bwd at the shipped CIFAR shapes (n=256 and n=64, C=256,
4 heads, batch 256) against the XLA einsum path, and reports effective HBM
bandwidth so distance from the roofline is visible.

Usage: python experiments/bench_attention_kernel.py
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

from tinyedm_tpu.ops.fused_attention import _pick_bb, cosine_attention_qkv  # noqa: E402
from tests.test_fused_attention import xla_attention  # noqa: E402

B, C, HEADS = 256, 256, 4
WARMUP, ITERS = 3, 30


def timeit(fn, *args) -> float:
    for _ in range(WARMUP):
        out = fn(*args)
    jax.block_until_ready(out)
    # host-read sync (block_until_ready observed returning early over the
    # axon tunnel; see bench.py)
    _ = jax.tree_util.tree_leaves(out)[0][0, 0]
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(leaf.reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main() -> None:
    for n in (256, 64):
        qkv = (
            jax.random.normal(jax.random.PRNGKey(0), (B, n, 3 * C)) * 0.7
        ).astype(jnp.bfloat16)

        fused_f = jax.jit(lambda q: cosine_attention_qkv(q, HEADS))
        xla_f = jax.jit(lambda q: xla_attention(q, HEADS))
        fused_g = jax.jit(
            jax.grad(lambda q: cosine_attention_qkv(q, HEADS).astype(jnp.float32).sum())
        )
        xla_g = jax.jit(
            jax.grad(lambda q: xla_attention(q, HEADS).astype(jnp.float32).sum())
        )

        t_ff, t_xf = timeit(fused_f, qkv), timeit(xla_f, qkv)
        t_fg, t_xg = timeit(fused_g, qkv), timeit(xla_g, qkv)
        io_f = B * n * 4 * C * 2 / 1e9  # qkv + out, bf16
        io_b = B * n * 8 * C * 2 / 1e9
        bbf = _pick_bb(B, n, C, HEADS, bwd=False)
        bbb = _pick_bb(B, n, C, HEADS, bwd=True)
        print(
            f"n={n:4d} fwd: fused {t_ff:6.3f} ms ({io_f / t_ff * 1e3:5.0f} GB/s, bb={bbf}) "
            f"xla {t_xf:6.3f} | fwd+bwd: fused {t_fg:6.3f} ms "
            f"({(io_f + io_b) / t_fg * 1e3:5.0f} GB/s, bb={bbb}) xla {t_xg:6.3f}"
        )


if __name__ == "__main__":
    main()
