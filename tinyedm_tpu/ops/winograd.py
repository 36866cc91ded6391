"""Winograd F(2x2, 3x3) convolution as a fused Pallas TPU kernel.

Why: the CIFAR step spends ~130 ms in XLA conv fusions at 75-87% MFU — the
emitter is near its ceiling, so the remaining lever is algorithmic. Winograd
F(2x2,3x3) computes a stride-1 SAME 3x3 conv with 2.25x fewer MACs (16
transform-space multiplies per 2x2 output tile vs 36 direct), the same
trade cuDNN applies by default on GPU — so the reference's torch/A100
baseline already benefits from it implicitly. A graph-level (jnp) Winograd
materializes the 4.5x-expanded transform tensors in HBM and loses to
bandwidth; this kernel keeps every transform VMEM-resident — HBM traffic is
exactly the direct conv's (x in, y out, pre-transformed weights).

Math (Lavin & Gray 2015):
    Y_tile(2x2) = A^T [ (G g G^T) ∘ (B^T d B) ] A      per channel pair,
with the channel contraction done as 16 per-component GEMMs
    M[a,b] = V[a,b] @ U[a,b],   V (tiles, Ci), U (Ci, Co)
All transform combos use exact +-1 / +-0.5 coefficients (representable in
bf16/fp32); GEMMs accumulate fp32. The weight transform U = G g G^T runs
once per step in XLA (16*Ci*Co elements — trivial).

Numerics: transform-space accumulation reorders the reduction, so results
differ from the direct conv by bf16 rounding (~1e-2 relative), exactly as
cuDNN's Winograd differs from its direct kernels; fp32 inputs match the
direct conv to ~1e-6 (see tests/test_winograd.py).

Layout: NHWC in/out. The kernel grid runs over batch chunks; each step
  1. reads a pre-padded (bb, H+2, W+2, Ci) input block,
  2. for each of the 16 (a, b) components: builds V[a,b] (bb*T, Ci) from
     strided slices (two-stage row/col combos), GEMMs against U[a,b],
     and accumulates +-M into the four 2x2 output planes (A^T ... A),
  3. writes the interleaved (bb, H, W, Co) output.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# F(2x2, 3x3) transform matrices (exact in binary floating point)
_BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], dtype=np.float64
)
_G = np.array(
    [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], dtype=np.float64
)
_AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], dtype=np.float64)


def transform_weights(w: jnp.ndarray) -> jnp.ndarray:
    """U = G g G^T per channel pair: (3, 3, Ci, Co) -> (4, 4, Ci, Co) fp32."""
    g = w.astype(jnp.float32)
    G = jnp.asarray(_G, jnp.float32)
    u = jnp.einsum("ai,ijco->ajco", G, g)
    return jnp.einsum("bj,ajco->abco", G, u)


def _bt_combos(p):
    """Apply B^T along a 4-list: returns 4 combos of the inputs."""
    return [p[0] - p[2], p[1] + p[2], p[2] - p[1], p[1] - p[3]]


def _at_combos(m):
    """Apply A^T along a 4-list: returns 2 combos."""
    return [m[0] + m[1] + m[2], m[1] - m[2] - m[3]]


def _winograd_fwd_kernel(x_ref, u_ref, o_ref, acc_ref, *, h: int, w: int, ci: int, co: int):
    """One batch chunk. x_ref (bb, h+2, w+2, ci) pre-padded; u_ref
    (16, ci, co) transformed weights; o_ref (bb, h, w, co);
    acc_ref scratch (4, bb, h//2, w//2, co) fp32 — the 2x2 output planes
    (p, q) flattened to p*2+q."""
    bb = x_ref.shape[0]
    th, tw = h // 2, w // 2
    nt = bb * th * tw
    cd = o_ref.dtype

    # strided input planes P[i][j][r,s] = x[2r+i, 2s+j], each (bb, th, tw, ci)
    def plane(i, j):
        return jax.lax.slice(
            x_ref[...], (0, i, j, 0), (bb, i + 2 * th - 1, j + 2 * tw - 1, ci),
            (1, 2, 2, 1),
        )

    # two-stage transform: rows (i) first, at fp32 for exact +-1 combos
    # T[a][j] = sum_i BT[a,i] P[i][j]
    t_aj = [[None] * 4 for _ in range(4)]
    for j in range(4):
        col = [plane(i, j).astype(jnp.float32) for i in range(4)]
        combo = _bt_combos(col)
        for a in range(4):
            t_aj[a][j] = combo[a]

    for p in range(4):
        acc_ref[p] = jnp.zeros_like(acc_ref[p])

    for a in range(4):
        v_b = _bt_combos(t_aj[a])  # V[a][b] for b in 0..3
        for b in range(4):
            v = v_b[b].astype(cd).reshape(nt, ci)
            m = jax.lax.dot_general(
                v,
                u_ref[a * 4 + b],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(bb, th, tw, co)
            # Y[p][q] += AT[p,a] * AT[q,b] * M[a,b]
            for pp in range(2):
                ca = _AT[pp, a]
                if ca == 0.0:
                    continue
                for qq in range(2):
                    cb = _AT[qq, b]
                    if cb == 0.0:
                        continue
                    coef = float(ca * cb)
                    idx = pp * 2 + qq
                    if coef == 1.0:
                        acc_ref[idx] += m
                    elif coef == -1.0:
                        acc_ref[idx] -= m
                    else:
                        acc_ref[idx] += jnp.float32(coef) * m

    # interleave the 2x2 planes back to (bb, h, w, co)
    for pp in range(2):
        for qq in range(2):
            y = acc_ref[pp * 2 + qq].astype(cd)  # (bb, th, tw, co)
            o_ref[:, pp : pp + 2 * th - 1 : 2, qq : qq + 2 * tw - 1 : 2, :] = y


def _pick_bb_wino(b: int, h: int, w: int, ci: int, co: int, itemsize: int) -> int:
    """Chunk size fitting VMEM: x block + 16 live fp32 T-tensors + 4 fp32
    output planes + GEMM operands, double-buffered IO."""
    per = (
        (h + 2) * (w + 2) * ci * itemsize * 2  # x io (double buffered)
        + h * w * co * itemsize * 2  # o io
        + 16 * (h // 2) * (w // 2) * ci * 4  # T[a][j] fp32
        + 4 * (h // 2) * (w // 2) * co * 4  # output planes fp32
        + 2 * (h // 2) * (w // 2) * max(ci, co) * 4  # V + M
    )
    budget = 13 * 1024 * 1024 - 16 * ci * co * itemsize
    cap = max(1, budget // max(per, 1))
    for bb in (16, 8, 4, 2, 1):
        if b % bb == 0 and bb <= cap:
            return bb
    return 1


def winograd_conv3x3(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    interpret: bool | None = None,
    bb: int | None = None,
) -> jnp.ndarray:
    """Stride-1 SAME 3x3 conv via fused Winograd F(2x2,3x3).

    x: (B, H, W, Ci) (H, W even); w: (3, 3, Ci, Co). Returns (B, H, W, Co)
    in x.dtype. Declares the DIRECT conv's FLOPs in its cost estimate so
    throughput comparisons against direct-conv baselines stay apples-to-
    apples (the A100 reference estimate counts direct FLOPs too).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, wd, ci = x.shape
    co = w.shape[-1]
    assert h % 2 == 0 and wd % 2 == 0, "F(2x2,3x3) needs even H, W"
    assert w.shape[:3] == (3, 3, ci), w.shape

    u = transform_weights(w).astype(x.dtype).reshape(16, ci, co)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    bb = bb or _pick_bb_wino(b, h, wd, ci, co, x.dtype.itemsize)
    kernel = functools.partial(
        _winograd_fwd_kernel, h=h, w=wd, ci=ci, co=co
    )
    cost = pl.CostEstimate(
        flops=2 * b * h * wd * 9 * ci * co,  # direct-conv equivalent
        bytes_accessed=(b * h * wd * (ci + co) + 9 * ci * co) * x.dtype.itemsize,
        transcendentals=0,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, wd, co), x.dtype),
        cost_estimate=cost,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec(
                (bb, h + 2, wd + 2, ci), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((16, ci, co), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, h, wd, co), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((4, bb, h // 2, wd // 2, co), jnp.float32)],
        interpret=interpret,
    )(xp, u)
