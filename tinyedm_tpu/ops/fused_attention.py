"""Fused small-n cosine attention: one Pallas kernel from qkv-conv output to
attention output.

Motivation (round-2 profile, BENCH.md): at EDM2's shipped resolutions the
spatial token counts are tiny (8x8=64, 16x16=256) but XLA's attention path
costs ~28 ms of a 183 ms CIFAR train step — it materializes the fp32
(b, heads, n, n) logits in HBM (268 MB per 256-token layer), plus separate
pixel-norm / transpose / reshape passes. The FLOPs are trivial; the cost is
pure HBM traffic. This kernel keeps everything in VMEM:

    qkv (b, n, 3C) bf16  ->  [per head: pixel_norm(fp32 RMS) -> QK^T (fp32
    acc) -> softmax (fp32) -> .V]  ->  out (b, n, C)

and the backward recomputes the softmax in-kernel (flash trade), emitting
d(qkv) in the same layout — so the only HBM traffic in either direction is
the qkv tensor, the output, and their cotangents, all in their native
channel-minor conv layout (no transposes; per-head q/k/v slices are
VMEM-local lane selections).

Numerics match tinyedm_tpu.models.layers.CosineAttention's XLA path to
bf16 rounding placement (exact in fp32): the same pixel_norm formula incl.
the bf16 denominator cast, fp32 logits and softmax — but the kernels defer
the softmax row normalization to the PV epilogue (exp(l - max) matmul'd
with V, then one divide), which moves one bf16 rounding site relative to
the XLA graph (forward parity tolerance 8e-3 in bf16, tests). The
reference semantics are torch SDPA over pixel-normed heads
(networks.py:194-201).

Implementation notes:
  * One grid step processes a whole batch chunk; within it the matmuls are
    batched dots (block-diagonal over the chunk) so Mosaic pipelines the
    per-sample (n, hd) GEMMs without per-matmul drain.
  * Heads run under ``lax.switch`` inside a ``fori_loop`` rather than an
    unrolled python loop: each switch branch has static lane offsets, while
    the loop bounds Mosaic's scoped-VMEM stack to ONE head's intermediates
    (an unrolled loop stacks all heads' fp32 (bb, n, n) tensors and OOMs).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-4  # pixel_norm epsilon (ops/mp.py; reference networks.py:9-14)

# batched (block-diagonal over the batch chunk) matmul dimension numbers:
# contract as annotated, batch over axis 0
_BMM_TT = (((2,), (2,)), ((0,), (0,)))  # (bb,n,d) x (bb,m,d) -> (bb,n,m)
_BMM_TN = (((2,), (1,)), ((0,), (0,)))  # (bb,n,m) x (bb,m,d) -> (bb,n,d)
_BMM_NT = (((1,), (1,)), ((0,), (0,)))  # (bb,m,n) x (bb,m,d) -> (bb,n,d)


def _norm_head(x_c):
    """pixel_norm over the head dim, matching ops.mp.pixel_norm exactly:
    fp32 RMS, eps offset, denominator cast to the input dtype before the
    divide. Returns (normalized, fp32 norm s, fp32 denom D)."""
    m = x_c.shape[-1]
    x32 = x_c.astype(jnp.float32)
    s = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True))
    d = EPS + s * (1.0 / math.sqrt(m))
    y = x_c / d.astype(x_c.dtype)
    return y, s, d


def _pixel_norm_bwd(x_c, s, d, gy, rsqrt_m: float):
    """Exact-math VJP of _norm_head (fp32): for y = x / bf16(D),
    D = eps + |x|/sqrt(m):  dx = g/D - x * sum(g*x) / (D^2 * |x| * sqrt(m)).
    Shared by the per-head and pair-block backward kernels — a numerically
    delicate formula that must not fork between the two."""
    x = x_c.astype(jnp.float32)
    d32 = d.astype(jnp.float32)
    inner = jnp.sum(gy * x, axis=-1, keepdims=True)
    return gy / d32 - x * (inner / (d32 * d32 * jnp.maximum(s, 1e-30) / rsqrt_m))


def _for_each_head(heads: int, body, unroll: bool = False) -> None:
    """Run ``body(h)`` for h in range(heads) with static offsets.

    unroll=True emits a plain python loop: Mosaic can software-pipeline
    across heads (head i's VPU softmax overlaps head i+1's MXU matmuls),
    at the price of summed (not loop-scoped) VMEM liveness for the per-head
    intermediates. unroll=False wraps each head in a ``lax.switch`` branch
    inside a ``fori_loop``, bounding the scoped-VMEM stack to ONE head."""
    if unroll:
        for h in range(heads):
            body(h)
        return
    branches = [functools.partial(body, h) for h in range(heads)]

    def step(h, carry):
        jax.lax.switch(h, branches)
        return carry

    jax.lax.fori_loop(0, heads, step, 0)


def _attn_fwd_kernel(qkv_ref, o_ref, *, heads: int, channels: int, unroll: bool):
    """One batch-chunk: cosine attention for every head, entirely in VMEM.

    No max-subtraction before the exp: cosine-attention logits are BOUNDED —
    |q̂·k̂| <= 1 so |logits| <= 1/sqrt(hd) <= 1 — so exp can never overflow
    and the stabilizer is a wasted cross-lane reduce + subtract pass over the
    (n, n) tensor. (jax.nn.softmax subtracts the max; the difference is
    sub-ulp for inputs this small — covered by the parity-test tolerances.)

    Deferred softmax normalization: instead of P = (E/s) rounded to the
    compute dtype (two full VPU passes over the fp32 (n, n) tensor — divide
    then cast), the kernel rounds E directly and divides the PV matmul
    OUTPUT by the row sums — an (n, hd) pass. The step time of this kernel
    is VPU-bound on (n, n) passes (the matmul FLOPs are trivial at these
    shapes), so saving a pass is ~25% off the critical path; the result
    differs from the divide-first form only by bf16 rounding placement.

    qkv_ref: (bb, n, 3C); o_ref: (bb, n, C)."""
    hd = channels // heads
    scale = 1.0 / math.sqrt(hd)

    def head(h):
        q = qkv_ref[:, :, h * hd : (h + 1) * hd]  # (bb, n, hd)
        k = qkv_ref[:, :, channels + h * hd : channels + (h + 1) * hd]
        v = qkv_ref[:, :, 2 * channels + h * hd : 2 * channels + (h + 1) * hd]
        qn, _, _ = _norm_head(q)
        kn, _, _ = _norm_head(k)
        vn, _, _ = _norm_head(v)
        logits = jax.lax.dot_general(
            qn, kn, dimension_numbers=_BMM_TT, preferred_element_type=jnp.float32
        )
        e = jnp.exp(logits * jnp.float32(scale))  # scale fuses into the exp pass
        s = jnp.sum(e, axis=-1, keepdims=True)
        eb = e.astype(qn.dtype)
        out = jax.lax.dot_general(
            eb, vn, dimension_numbers=_BMM_TN, preferred_element_type=jnp.float32
        ) / s
        o_ref[:, :, h * hd : (h + 1) * hd] = out.astype(o_ref.dtype)

    _for_each_head(heads, head, unroll)


def _attn_bwd_kernel(qkv_ref, g_ref, o_ref, dqkv_ref, *, heads: int, channels: int, unroll: bool):
    """Backward for one batch-chunk: recompute the softmax (flash trade),
    then the attention VJP followed by the pixel_norm VJP, per head.

    Takes the FORWARD OUTPUT o as an extra operand for the flash-attention
    delta trick: the softmax-VJP row term delta_i = sum_j dP_ij P_ij equals
    sum_d g_id o_id (because o = P V̂), an (n, hd) reduction instead of an
    (n, n) one — saving a full pass over the big tensor. o is already in HBM
    (it's the custom_vjp primal output), so this costs one extra C-wide read.

    Deferred-normalization VJP (see fwd kernel): with E = exp(c·Q̂K̂ᵀ),
    s = rowsum(E), r = 1/s, P = r∘E, the per-row factors r and the logit
    scale c never touch an (n, n) tensor —
        dV̂ = Eᵀ (r∘g)                     [fold r into g rows]
        dS' = E ∘ (dP − δ),  dP = g V̂ᵀ,  δ = rowsum(g∘o)
        dQ̂ = (dS' K̂) ∘ (r·c rows)        [row scale on the (n, hd) OUTPUT]
        dK̂ = dS'ᵀ (Q̂ ∘ (r·c rows))      [row scale on the (n, hd) OPERAND]
    which cuts the fp32 (n, n) VPU passes from ~8 (scale, normalize, cast,
    sub, two multiplies, cast) to ~5 (exp, cast E, sub, mul, cast dS').

    pixel_norm VJP for y = x / bf16(D), D = eps + |x|/sqrt(m):
        dx = g/D - x * sum(g * x) / (D^2 * |x| * sqrt(m))
    (exact-math VJP evaluated in fp32)."""
    hd = channels // heads
    scale = 1.0 / math.sqrt(hd)
    rsqrt_m = 1.0 / math.sqrt(hd)

    def pixel_norm_bwd(x_c, s, d, gy):
        return _pixel_norm_bwd(x_c, s, d, gy, rsqrt_m)

    def head(h):
        q = qkv_ref[:, :, h * hd : (h + 1) * hd]  # (bb, n, hd)
        k = qkv_ref[:, :, channels + h * hd : channels + (h + 1) * hd]
        v = qkv_ref[:, :, 2 * channels + h * hd : 2 * channels + (h + 1) * hd]
        g = g_ref[:, :, h * hd : (h + 1) * hd]  # compute dtype
        o = o_ref[:, :, h * hd : (h + 1) * hd]
        qn, sq, dq_ = _norm_head(q)
        kn, sk, dk_ = _norm_head(k)
        vn, sv, dv_ = _norm_head(v)
        logits = jax.lax.dot_general(
            qn, kn, dimension_numbers=_BMM_TT, preferred_element_type=jnp.float32
        )
        e = jnp.exp(logits * jnp.float32(scale))  # bounded logits, no stabilizer
        rc = jnp.float32(scale) / jnp.sum(e, axis=-1, keepdims=True)  # r·c (bb,n,1)
        eb = e.astype(qn.dtype)

        # All matmuls take compute-dtype operands with fp32 accumulation —
        # same mixed precision XLA's autodiff gives the einsum path, and 2x
        # the MXU rate of fp32 operands.
        g32 = g.astype(jnp.float32)
        gr = (g32 * (rc * jnp.float32(math.sqrt(hd)))).astype(qn.dtype)  # r∘g, r = rc/c = rc·√hd
        dvn = jax.lax.dot_general(  # P^T g = E^T (r∘g)
            eb, gr, dimension_numbers=_BMM_NT, preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(  # g V^T
            g, vn, dimension_numbers=_BMM_TT, preferred_element_type=jnp.float32
        )
        delta = jnp.sum(  # = rowsum(dP ∘ P), via o (see docstring)
            g32 * o.astype(jnp.float32), axis=-1, keepdims=True
        )
        ds = (e * (dp - delta)).astype(qn.dtype)  # dS' = E ∘ (dP − δ)
        qs = (qn.astype(jnp.float32) * rc).astype(qn.dtype)  # Q̂ ∘ (r·c)
        dqn = jax.lax.dot_general(  # (dS' K̂) ∘ (r·c)
            ds, kn, dimension_numbers=_BMM_TN, preferred_element_type=jnp.float32
        ) * rc
        dkn = jax.lax.dot_general(  # dS'ᵀ (Q̂ ∘ (r·c))
            ds, qs, dimension_numbers=_BMM_NT, preferred_element_type=jnp.float32
        )

        dqkv_ref[:, :, h * hd : (h + 1) * hd] = pixel_norm_bwd(
            q, sq, dq_, dqn
        ).astype(dqkv_ref.dtype)
        dqkv_ref[:, :, channels + h * hd : channels + (h + 1) * hd] = (
            pixel_norm_bwd(k, sk, dk_, dkn).astype(dqkv_ref.dtype)
        )
        dqkv_ref[:, :, 2 * channels + h * hd : 2 * channels + (h + 1) * hd] = (
            pixel_norm_bwd(v, sv, dv_, dvn).astype(dqkv_ref.dtype)
        )

    _for_each_head(heads, head, unroll)


# ---------------------------------------------------------------------------
# Pair-block kernels (the default for even head counts).
#
# Measured on v5e (experiments/attn_diag.py): per-head (n, hd)@(hd, n) matmuls
# with hd = 64 run ~5x slower than the same total FLOPs issued as full-width
# matmuls — K = 64 fills only half the 128-wide MXU and every (256, 64)
# instance pays its own stream/drain, so the kernel is matmul-GRANULARITY
# bound, not FLOP or VPU bound. The fix: process heads in PAIRS with
# block-diagonal operands,
#
#     [Q0 | Q1] (n, 2hd)  @  [[K0, 0], [0, K1]] (2n, 2hd)^T  =  [L0 | L1]
#
# K doubles to 2hd = 128 (full array; the zero-block FLOPs execute in the
# half that K = 64 would leave IDLE, so they are free), instance count
# halves, and every lane slice is 128-aligned. The block-diagonal operands
# live in VMEM scratch: zeroed once on the first grid step, only the two
# diagonal blocks rewritten per step (both writes are lane-aligned copies —
# head h's channels land at the same lane offset they came from).
# ---------------------------------------------------------------------------


def _norm_half(x, lo: int, hd: int):
    """pixel_norm of the 64-lane half [lo, lo+hd) of a (bb, n, 2hd) slice.
    Returns (normalized (bb, n, hd), fp32 norm s, fp32 denom d)."""
    return _norm_head(x[:, :, lo : lo + hd])


def _attn_fwd_kernel_pair(qkv_ref, o_ref, kbd_ref, vbd_ref, *, heads: int, channels: int):
    """Pair-block forward. qkv_ref (bb, n, 3C); o_ref (bb, n, C);
    kbd_ref/vbd_ref (bb, 2n, 2hd) VMEM scratch, persistent across grid steps."""
    hd = channels // heads
    w = 2 * hd
    scale = 1.0 / math.sqrt(hd)
    bb, n, _ = qkv_ref.shape

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        kbd_ref[...] = jnp.zeros_like(kbd_ref)
        vbd_ref[...] = jnp.zeros_like(vbd_ref)

    for p in range(heads // 2):
        q2 = qkv_ref[:, :, p * w : (p + 1) * w]  # (bb, n, 2hd)
        k2 = qkv_ref[:, :, channels + p * w : channels + (p + 1) * w]
        v2 = qkv_ref[:, :, 2 * channels + p * w : 2 * channels + (p + 1) * w]
        qn0, _, _ = _norm_half(q2, 0, hd)
        qn1, _, _ = _norm_half(q2, hd, hd)
        kn0, _, _ = _norm_half(k2, 0, hd)
        kn1, _, _ = _norm_half(k2, hd, hd)
        vn0, _, _ = _norm_half(v2, 0, hd)
        vn1, _, _ = _norm_half(v2, hd, hd)
        qn = jnp.concatenate([qn0, qn1], axis=-1)  # (bb, n, 2hd)
        # diagonal blocks only; off-diagonal zeros persist from step 0
        kbd_ref[:, 0:n, 0:hd] = kn0
        kbd_ref[:, n : 2 * n, hd:w] = kn1
        vbd_ref[:, 0:n, 0:hd] = vn0
        vbd_ref[:, n : 2 * n, hd:w] = vn1

        logits = jax.lax.dot_general(  # (bb, n, 2n) = [L0 | L1]
            qn, kbd_ref[...], dimension_numbers=_BMM_TT,
            preferred_element_type=jnp.float32,
        )
        e = jnp.exp(logits * jnp.float32(scale))
        s0 = jnp.sum(e[:, :, 0:n], axis=-1, keepdims=True)
        s1 = jnp.sum(e[:, :, n : 2 * n], axis=-1, keepdims=True)
        eb = e.astype(qn.dtype)
        y = jax.lax.dot_general(  # (bb, n, 2hd) = [P0 V0 | P1 V1] (unnormalized)
            eb, vbd_ref[...], dimension_numbers=_BMM_TN,
            preferred_element_type=jnp.float32,
        )
        r = jnp.concatenate(
            [
                jnp.broadcast_to(1.0 / s0, (bb, n, hd)),
                jnp.broadcast_to(1.0 / s1, (bb, n, hd)),
            ],
            axis=-1,
        )
        o_ref[:, :, p * w : (p + 1) * w] = (y * r).astype(o_ref.dtype)


def _attn_bwd_kernel_pair(
    qkv_ref, g_ref, o_ref, dqkv_ref, kbd_ref, vbd_ref, *, heads: int, channels: int
):
    """Pair-block backward: recompute the softmax, then the deferred-
    normalization VJP (see _attn_bwd_kernel docstring for the math) with all
    five dots issued at pair width."""
    hd = channels // heads
    w = 2 * hd
    scale = 1.0 / math.sqrt(hd)
    rsqrt_m = 1.0 / math.sqrt(hd)
    bb, n, _ = qkv_ref.shape

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        kbd_ref[...] = jnp.zeros_like(kbd_ref)
        vbd_ref[...] = jnp.zeros_like(vbd_ref)

    def pixel_norm_bwd(x_c, s, d, gy):
        return _pixel_norm_bwd(x_c, s, d, gy, rsqrt_m)

    for p in range(heads // 2):
        q2 = qkv_ref[:, :, p * w : (p + 1) * w]
        k2 = qkv_ref[:, :, channels + p * w : channels + (p + 1) * w]
        v2 = qkv_ref[:, :, 2 * channels + p * w : 2 * channels + (p + 1) * w]
        g2 = g_ref[:, :, p * w : (p + 1) * w]
        o2 = o_ref[:, :, p * w : (p + 1) * w]
        qn0, sq0, dq0 = _norm_half(q2, 0, hd)
        qn1, sq1, dq1 = _norm_half(q2, hd, hd)
        kn0, sk0, dk0 = _norm_half(k2, 0, hd)
        kn1, sk1, dk1 = _norm_half(k2, hd, hd)
        vn0, sv0, dv0 = _norm_half(v2, 0, hd)
        vn1, sv1, dv1 = _norm_half(v2, hd, hd)
        qn = jnp.concatenate([qn0, qn1], axis=-1)
        kbd_ref[:, 0:n, 0:hd] = kn0
        kbd_ref[:, n : 2 * n, hd:w] = kn1
        vbd_ref[:, 0:n, 0:hd] = vn0
        vbd_ref[:, n : 2 * n, hd:w] = vn1

        logits = jax.lax.dot_general(
            qn, kbd_ref[...], dimension_numbers=_BMM_TT,
            preferred_element_type=jnp.float32,
        )
        e = jnp.exp(logits * jnp.float32(scale))
        s0 = jnp.sum(e[:, :, 0:n], axis=-1, keepdims=True)
        s1 = jnp.sum(e[:, :, n : 2 * n], axis=-1, keepdims=True)
        rc0 = jnp.float32(scale) / s0  # r·c per head half
        rc1 = jnp.float32(scale) / s1
        rcfull = jnp.concatenate(
            [
                jnp.broadcast_to(rc0, (bb, n, hd)),
                jnp.broadcast_to(rc1, (bb, n, hd)),
            ],
            axis=-1,
        )  # (bb, n, 2hd) fp32
        eb = e.astype(qn.dtype)

        g32 = g2.astype(jnp.float32)
        gr = (g32 * (rcfull * jnp.float32(math.sqrt(hd)))).astype(qn.dtype)  # r∘g
        dvbd = jax.lax.dot_general(  # (bb, 2n, 2hd): diag blocks = dV̂
            eb, gr, dimension_numbers=_BMM_NT, preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(  # (bb, n, 2n) = [dP0 | dP1]
            g2, vbd_ref[...], dimension_numbers=_BMM_TT,
            preferred_element_type=jnp.float32,
        )
        go = g32 * o2.astype(jnp.float32)
        d0 = jnp.sum(go[:, :, 0:hd], axis=-1, keepdims=True)  # δ per head
        d1 = jnp.sum(go[:, :, hd:w], axis=-1, keepdims=True)
        dd = jnp.concatenate(
            [jnp.broadcast_to(d0, (bb, n, n)), jnp.broadcast_to(d1, (bb, n, n))],
            axis=-1,
        )
        ds = (e * (dp - dd)).astype(qn.dtype)  # dS' = E ∘ (dP − δ)
        dqn = jax.lax.dot_general(  # (bb, n, 2hd) = [dS0' K̂0 | dS1' K̂1]
            ds, kbd_ref[...], dimension_numbers=_BMM_TN,
            preferred_element_type=jnp.float32,
        ) * rcfull
        qs = (qn.astype(jnp.float32) * rcfull).astype(qn.dtype)
        dkbd = jax.lax.dot_general(  # (bb, 2n, 2hd): diag blocks = dK̂
            ds, qs, dimension_numbers=_BMM_NT, preferred_element_type=jnp.float32
        )

        dq = jnp.concatenate(
            [
                pixel_norm_bwd(q2[:, :, 0:hd], sq0, dq0, dqn[:, :, 0:hd]),
                pixel_norm_bwd(q2[:, :, hd:w], sq1, dq1, dqn[:, :, hd:w]),
            ],
            axis=-1,
        )
        dk = jnp.concatenate(
            [
                pixel_norm_bwd(k2[:, :, 0:hd], sk0, dk0, dkbd[:, 0:n, 0:hd]),
                pixel_norm_bwd(k2[:, :, hd:w], sk1, dk1, dkbd[:, n : 2 * n, hd:w]),
            ],
            axis=-1,
        )
        dv = jnp.concatenate(
            [
                pixel_norm_bwd(v2[:, :, 0:hd], sv0, dv0, dvbd[:, 0:n, 0:hd]),
                pixel_norm_bwd(v2[:, :, hd:w], sv1, dv1, dvbd[:, n : 2 * n, hd:w]),
            ],
            axis=-1,
        )
        dqkv_ref[:, :, p * w : (p + 1) * w] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, channels + p * w : channels + (p + 1) * w] = dk.astype(
            dqkv_ref.dtype
        )
        dqkv_ref[:, :, 2 * channels + p * w : 2 * channels + (p + 1) * w] = dv.astype(
            dqkv_ref.dtype
        )


# ---------------------------------------------------------------------------
# Whole-block fusion: qkv GEMM -> cosine attention -> out GEMM -> mp_add
# residual, one kernel each way. Removes the HBM round trips of the qkv
# tensor (b, n, 3C), the attention output, and their cotangents (~0.5 GB/step
# at CIFAR shapes) and keeps the two 1x1-conv GEMMs on data already resident
# in VMEM. Weight gradients accumulate in fp32 VMEM across grid steps
# (constant-index output blocks revisited every step).
# ---------------------------------------------------------------------------

_RES_T = 0.5  # CosineAttention residual factor (reference networks.py:206)


def _attn_block_fwd_kernel(
    x_ref, wq_ref, wo_ref, o_ref, *scratch, heads: int, channels: int,
    pair: bool, unroll: bool
):
    bb, n, c = x_ref.shape
    cd = x_ref.dtype
    x = x_ref[...]
    xf = x.reshape(bb * n, c)
    qkv = jax.lax.dot_general(
        xf, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if pair:
        qkv_scr, y_scr, kbd, vbd = scratch
    else:
        qkv_scr, y_scr = scratch
    qkv_scr[...] = qkv.astype(cd).reshape(bb, n, 3 * c)
    if pair:
        _attn_fwd_kernel_pair(qkv_scr, y_scr, kbd, vbd, heads=heads, channels=channels)
    else:
        _attn_fwd_kernel(qkv_scr, y_scr, heads=heads, channels=channels, unroll=unroll)
    y = y_scr[...].reshape(bb * n, c)
    out = jax.lax.dot_general(
        y, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cd).reshape(bb, n, c)
    # mp_add(x, out, t) exactly as ops.mp.mp_add (compute dtype arithmetic)
    t = jnp.asarray(_RES_T, cd)
    s = jnp.asarray(1.0 / math.sqrt((1.0 - _RES_T) ** 2 + _RES_T**2), cd)
    o_ref[...] = ((x + (out - x) * t) * s).astype(o_ref.dtype)


def _attn_block_bwd_kernel(
    x_ref, wq_ref, wo_ref, g_ref, dx_ref, dwq_ref, dwo_ref, *scratch,
    heads: int, channels: int, pair: bool, unroll: bool
):
    bb, n, c = x_ref.shape
    cd = x_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _zero_dw():
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)

    if pair:
        qkv_scr, y_scr, gat_scr, dqkv_scr, kbd, vbd = scratch
    else:
        qkv_scr, y_scr, gat_scr, dqkv_scr = scratch

    x = x_ref[...]
    xf = x.reshape(bb * n, c)
    qkv = jax.lax.dot_general(
        xf, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv_scr[...] = qkv.astype(cd).reshape(bb, n, 3 * c)
    if pair:
        _attn_fwd_kernel_pair(qkv_scr, y_scr, kbd, vbd, heads=heads, channels=channels)
    else:
        _attn_fwd_kernel(qkv_scr, y_scr, heads=heads, channels=channels, unroll=unroll)

    g = g_ref[...]
    # d(mp_add)/d(out) = d(mp_add)/dx_direct = t*s = (1-t)*s for t = 0.5
    ts = jnp.asarray(_RES_T / math.sqrt((1.0 - _RES_T) ** 2 + _RES_T**2), cd)
    gout = g * ts  # (bb, n, c)
    goutf = gout.reshape(bb * n, c)
    yf = y_scr[...].reshape(bb * n, c)
    dwo_ref[...] += jax.lax.dot_general(  # y^T g_out
        yf, goutf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dy = jax.lax.dot_general(  # g_out @ W_out^T
        goutf, wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gat_scr[...] = dy.astype(cd).reshape(bb, n, c)
    if pair:
        _attn_bwd_kernel_pair(
            qkv_scr, gat_scr, y_scr, dqkv_scr, kbd, vbd,
            heads=heads, channels=channels,
        )
    else:
        _attn_bwd_kernel(
            qkv_scr, gat_scr, y_scr, dqkv_scr,
            heads=heads, channels=channels, unroll=unroll,
        )
    dqkvf = dqkv_scr[...].reshape(bb * n, 3 * c)
    dwq_ref[...] += jax.lax.dot_general(  # x^T dqkv
        xf, dqkvf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dxq = jax.lax.dot_general(  # dqkv @ W_qkv^T
        dqkvf, wq_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[...] = (dxq.astype(cd).reshape(bb, n, c) + gout).astype(dx_ref.dtype)


def _block_sample_bytes(n: int, channels: int, heads: int, bwd: bool, pair: bool) -> int:
    """Per-sample VMEM for the whole-block kernels: IO + qkv/y/(gat/dqkv)
    scratches + the attention core's live intermediates. The head/pair loop
    runs with unroll=True (see _block_{fwd,bwd}_impl), so the core
    intermediates of ALL iterations are charged as simultaneously live —
    Mosaic may reuse some, but under-counting here is a scoped-VMEM OOM on
    the chip that no CPU test can see (BENCH.md round 2, imagenet512)."""
    c = channels
    io = (4 if bwd else 2) * n * c * 2 * 2  # x, o (+ g, dx), double buffered
    scr = (2 * n * 4 * c + (2 * n * 4 * c if bwd else 0)) * 2  # qkv+y (+gat+dqkv)
    if pair:
        iters = max(heads // 2, 1)
        core = iters * ((4 if bwd else 2) * n * 2 * n * 4 + 2 * n * 2 * n * 2)
    else:
        core = heads * (
            (3 if bwd else 2) * n * n * 4 + (12 if bwd else 6) * n * (c // heads) * 4
        )
    return io + scr + core


def _block_fixed_bytes(c: int, bwd: bool) -> int:
    """VMEM bytes resident across the WHOLE grid: the bf16 weights wq (c,3c)
    + wo (c,c); in backward also the fp32 dW accumulator blocks dwq (c,3c) +
    dwo (c,c) = 16c^2 bytes (~9.4 MB at C=768). Shared by the bb picker and
    the fits-check so the two can never disagree."""
    fixed = 2 * c * 4 * c
    if bwd:
        fixed += 4 * (3 * c * c + c * c)
    return fixed


def _block_pair_scratch_bytes(bb: int, n: int, hd: int, pair: bool) -> int:
    """Pair-layout kbd+vbd scratch buffers (per grid step, bb samples)."""
    return 2 * bb * 2 * n * 2 * hd * 2 if pair else 0


def _pick_bb_block(b: int, n: int, channels: int, heads: int, bwd: bool, pair: bool) -> int:
    hd = channels // heads
    fixed = _block_fixed_bytes(channels, bwd)
    per = max(_block_sample_bytes(n, channels, heads, bwd, pair), 1)
    for bb in (8, 4, 2, 1):
        if b % bb:
            continue
        if bb * per + _block_pair_scratch_bytes(bb, n, hd, pair) + fixed <= _BUDGET:
            return bb
    return 1


def _block_scratch(bb: int, n: int, c: int, hd: int, dtype, bwd: bool, pair: bool):
    scr = [pltpu.VMEM((bb, n, 3 * c), dtype), pltpu.VMEM((bb, n, c), dtype)]
    if bwd:
        scr += [pltpu.VMEM((bb, n, c), dtype), pltpu.VMEM((bb, n, 3 * c), dtype)]
    if pair:
        scr += [
            pltpu.VMEM((bb, 2 * n, 2 * hd), dtype),
            pltpu.VMEM((bb, 2 * n, 2 * hd), dtype),
        ]
    return scr


def _block_fwd_impl(x, wq, wo, heads: int, *, interpret: bool | None = None, bb: int | None = None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, c = x.shape
    hd = c // heads
    pair = _use_pair(heads, n)
    unroll = True
    bb = bb or _pick_bb_block(b, n, c, heads, bwd=False, pair=pair)
    kernel = functools.partial(
        _attn_block_fwd_kernel, heads=heads, channels=c, pair=pair, unroll=unroll
    )
    cost = pl.CostEstimate(
        flops=b * n * c * (3 * c + c) * 2 + b * heads * 4 * n * n * hd + 4 * b * n * c,
        bytes_accessed=b * n * 2 * c * x.dtype.itemsize + 4 * c * c * x.dtype.itemsize,
        transcendentals=b * heads * n * n,
    )
    const = lambda i: (0, 0)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        cost_estimate=cost,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=_block_scratch(bb, n, c, hd, x.dtype, bwd=False, pair=pair),
        interpret=interpret,
    )(x, wq, wo)


def _block_bwd_impl(x, wq, wo, g, heads: int, *, interpret: bool | None = None, bb: int | None = None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, c = x.shape
    hd = c // heads
    pair = _use_pair(heads, n)
    unroll = True
    bb = bb or _pick_bb_block(b, n, c, heads, bwd=True, pair=pair)
    kernel = functools.partial(
        _attn_block_bwd_kernel, heads=heads, channels=c, pair=pair, unroll=unroll
    )
    cost = pl.CostEstimate(
        flops=3 * b * n * c * (3 * c + c) * 2 + b * heads * 10 * n * n * hd,
        bytes_accessed=b * n * 3 * c * x.dtype.itemsize + 12 * c * c * 4,
        transcendentals=b * heads * n * n,
    )
    const = lambda i: (0, 0)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c), x.dtype),
            jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
        ),
        cost_estimate=cost,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), const, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=_block_scratch(bb, n, c, hd, x.dtype, bwd=True, pair=pair),
        interpret=interpret,
    )(x, wq, wo, g)


def _per_sample_bytes(n: int, channels: int, heads: int, bwd: bool, unroll: bool) -> int:
    """VMEM bytes one sample needs in a grid step: IO blocks (x2 for the
    cross-step DMA double buffer) + per-head intermediates (~2 fp32 (n, n)
    softmax tensors forward / ~3 backward, plus fp32 (n, hd) casts), summed
    over all heads when the head loop is unrolled."""
    hd = channels // heads
    io_ch = 8 * channels if bwd else 4 * channels
    nn_terms = 3 if bwd else 2
    casts = 12 if bwd else 6
    h_mult = heads if unroll else 1
    return (
        2 * n * io_ch * 2
        + h_mult * (nn_terms * n * n * 4 + casts * n * hd * 4)
    )


_BUDGET = 14 * 1024 * 1024


def _pick_bb_unroll(b: int, n: int, channels: int, heads: int, bwd: bool) -> tuple[int, bool]:
    """(batch-chunk, unroll) fitting VMEM (16 MB/core), preferring an
    unrolled head loop (Mosaic overlaps head i's VPU softmax with head
    i+1's MXU matmuls) over a bigger chunk: measured on v5e at n=256
    C=256 bf16, (bb=4, unrolled) beats (bb=8, switch-loop) ~1.6x."""
    for unroll in (True, False):
        cap = min(64, _BUDGET // max(_per_sample_bytes(n, channels, heads, bwd, unroll), 1))
        for bb in (64, 32, 16, 8, 4, 2, 1):
            if b % bb == 0 and bb <= cap:
                if unroll and bb < 2 and heads > 1:
                    break  # too small a chunk to pay for summed liveness
                return bb, unroll
    return 1, False


def _pick_bb(b: int, n: int, channels: int, heads: int, bwd: bool) -> int:
    return _pick_bb_unroll(b, n, channels, heads, bwd)[0]


def _pair_sample_bytes(n: int, channels: int, heads: int, bwd: bool) -> int:
    """Per-sample VMEM for the pair-block kernels (one pair live at a time):
    IO double buffers + the fp32 (n, 2n) softmax tensors (~2 fwd / ~4 bwd)
    + compute-dtype casts."""
    io_ch = 8 * channels if bwd else 4 * channels
    n2_terms = 4 if bwd else 2
    return 2 * n * io_ch * 2 + n2_terms * n * 2 * n * 4 + 2 * n * 2 * n * 2


def _pick_bb_pair(b: int, n: int, channels: int, heads: int, bwd: bool) -> int:
    # bb capped at 8: larger chunks measured slower (VMEM pressure squeezes
    # the double buffers) — v5e, n=64: bb=8 0.73 ms vs bb=16 0.80 ms bwd-chain
    hd = channels // heads
    per = max(_pair_sample_bytes(n, channels, heads, bwd), 1)
    for bb in (8, 4, 2, 1):
        if b % bb:
            continue
        scratch = 2 * bb * 2 * n * 2 * hd * 2  # kbd+vbd, compute dtype
        if bb * per + scratch <= _BUDGET:
            return bb
    return 1


def _use_pair(heads: int, n: int) -> bool:
    """Pair-block kernels win only at SMALL n: they halve matmul-instance
    count at full-array K = 2hd, worth ~20% bwd at n = 64; at n = 256 the
    kernels are output-stream bound (time ~ heads·n² rows through the MXU)
    and the pair form's bigger fp32 (n, 2n) tensors overflow VMEM for
    nothing (measured equal fwd, compile failure bwd). Unaligned n (not a
    sublane multiple) hits Mosaic concat/offset limitations — per-head
    kernels handle those. See BENCH.md round 2."""
    return heads % 2 == 0 and n <= 128 and n % 8 == 0


def _fwd_impl(
    qkv: jnp.ndarray,
    heads: int,
    *,
    interpret: bool | None = None,
    bb: int | None = None,
    unroll: bool | None = None,
    pair: bool | None = None,
):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, c3 = qkv.shape
    channels = c3 // 3
    hd = channels // heads
    if pair is None:
        pair = _use_pair(heads, n)
    # declare true costs so compiled.cost_analysis() (bench vs_baseline) and
    # the scheduler see through the custom call: QK^T + PV = 4*n^2*hd MACs
    cost = pl.CostEstimate(
        flops=b * heads * 4 * n * n * hd,  # 2 dots x 2*n^2*hd FLOPs
        bytes_accessed=b * n * 4 * channels * qkv.dtype.itemsize,
        transcendentals=b * heads * n * n,
    )
    if pair:
        bb = bb or _pick_bb_pair(b, n, channels, heads, bwd=False)
        kernel = functools.partial(
            _attn_fwd_kernel_pair, heads=heads, channels=channels
        )
        scratch = [
            pltpu.VMEM((bb, 2 * n, 2 * hd), qkv.dtype),
            pltpu.VMEM((bb, 2 * n, 2 * hd), qkv.dtype),
        ]
    else:
        auto_bb, auto_unroll = _pick_bb_unroll(b, n, channels, heads, bwd=False)
        bb = bb or auto_bb
        unroll = auto_unroll if unroll is None else unroll
        kernel = functools.partial(
            _attn_fwd_kernel, heads=heads, channels=channels, unroll=unroll
        )
        scratch = []
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, channels), qkv.dtype),
        cost_estimate=cost,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, n, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (bb, n, channels), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(qkv)


def _bwd_impl(
    qkv,
    g,
    o,
    heads: int,
    *,
    interpret: bool | None = None,
    bb: int | None = None,
    unroll: bool | None = None,
    pair: bool | None = None,
):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, c3 = qkv.shape
    channels = c3 // 3
    hd = channels // heads
    if pair is None:
        pair = _use_pair(heads, n)
    cost = pl.CostEstimate(
        flops=b * heads * 10 * n * n * hd,  # softmax recompute + 5 VJP dots
        bytes_accessed=b * n * 8 * channels * qkv.dtype.itemsize,
        transcendentals=b * heads * n * n,
    )
    if pair:
        bb = bb or _pick_bb_pair(b, n, channels, heads, bwd=True)
        kernel = functools.partial(
            _attn_bwd_kernel_pair, heads=heads, channels=channels
        )
        scratch = [
            pltpu.VMEM((bb, 2 * n, 2 * hd), qkv.dtype),
            pltpu.VMEM((bb, 2 * n, 2 * hd), qkv.dtype),
        ]
    else:
        auto_bb, auto_unroll = _pick_bb_unroll(b, n, channels, heads, bwd=True)
        bb = bb or auto_bb
        unroll = auto_unroll if unroll is None else unroll
        kernel = functools.partial(
            _attn_bwd_kernel, heads=heads, channels=channels, unroll=unroll
        )
        scratch = []
    ch_spec = pl.BlockSpec(
        (bb, n, channels), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, c3), qkv.dtype),
        cost_estimate=cost,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, n, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ch_spec,
            ch_spec,
        ],
        out_specs=pl.BlockSpec(
            (bb, n, c3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(qkv, g, o)


def _batch_partitioned(fn, n_args: int):
    """Make a batch-parallel Pallas entry SPMD-safe under jit-with-shardings.

    XLA's SPMD partitioner cannot see inside a Mosaic custom call, so a bare
    pallas_call under a sharded jit gets replicated (all-gathering the batch
    onto every chip — DP throughput death). custom_partitioning declares the
    truth: every operand and the result shard on the leading (batch) dim
    only, and each device just runs the kernel on its local shard.
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    cp = custom_partitioning(fn)

    def _batch_axis(arg_shapes):
        for s in arg_shapes:
            spec = getattr(s.sharding, "spec", None)
            if spec and len(spec) and spec[0] is not None:
                return spec[0]
        return None

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, PartitionSpec(_batch_axis(arg_shapes)))

    def partition(mesh, arg_shapes, result_shape):
        axis = _batch_axis(arg_shapes)
        sh = NamedSharding(mesh, PartitionSpec(axis))
        return mesh, fn, sh, (sh,) * n_args

    rules = {
        1: "b n c -> b n k",
        2: "b n c, b n d -> b n c",
        3: "b n c, b n d, b n e -> b n c",
    }
    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        # einsum-style rule for the Shardy partitioner: batch dim flows
        # through, token/channel dims stay unsharded
        sharding_rule=rules[n_args],
    )
    return cp


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(heads: int):
    return _batch_partitioned(lambda qkv: _fwd_impl(qkv, heads), n_args=1)


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(heads: int):
    return _batch_partitioned(lambda qkv, g, o: _bwd_impl(qkv, g, o, heads), n_args=3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def cosine_attention_qkv(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Fused pixel_norm + cosine attention on a (b, tokens, 3C) qkv tensor.

    Returns (b, tokens, C) with head-major channel grouping — identical
    layout to the XLA path's ``reshape(b, n, heads, hd) -> (b, n, C)``.
    Differentiable via Pallas forward/backward kernels; batch-dim
    partitioned under SPMD meshes.
    """
    return _fwd_partitioned(num_heads)(qkv)


def _vjp_fwd(qkv, num_heads):
    o = _fwd_partitioned(num_heads)(qkv)
    return o, (qkv, o)


def _vjp_bwd(num_heads, res, g):
    qkv, o = res
    return (_bwd_partitioned(num_heads)(qkv, g, o),)


cosine_attention_qkv.defvjp(_vjp_fwd, _vjp_bwd)


# Maximum token count for the fused single-block path: above this the (n, n)
# fp32 softmax per head no longer fits comfortably in VMEM alongside the
# batch chunk; callers should use ops.attention.flash_attention (q-blocked)
# instead.
MAX_FUSED_TOKENS = 512


# ---------------------------------------------------------------------------
# attention_block: public whole-block entry (see kernel section above)
# ---------------------------------------------------------------------------


def _block_partitioned_fwd(heads: int):
    """Batch-partitioned forward: x sharded on batch, weights replicated."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    fn = lambda x, wq, wo: _block_fwd_impl(x, wq, wo, heads)
    cp = custom_partitioning(fn)

    def _axis(arg_shapes):
        spec = getattr(arg_shapes[0].sharding, "spec", None)
        return spec[0] if spec and len(spec) else None

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, PartitionSpec(_axis(arg_shapes)))

    def partition(mesh, arg_shapes, result_shape):
        axis = _axis(arg_shapes)
        bsh = NamedSharding(mesh, PartitionSpec(axis))
        rep = NamedSharding(mesh, PartitionSpec())
        return mesh, fn, bsh, (bsh, rep, rep)

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b n c, c d, e f -> b n c",
    )
    return cp


def _block_partitioned_bwd(heads: int):
    """Batch-partitioned backward: dx sharded; dW partial sums psum'd over
    the batch axis so every shard returns the REPLICATED global gradient."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    raw = lambda x, wq, wo, g: _block_bwd_impl(x, wq, wo, g, heads)
    cp = custom_partitioning(raw)

    def _axis(arg_shapes):
        spec = getattr(arg_shapes[0].sharding, "spec", None)
        return spec[0] if spec and len(spec) else None

    def infer(mesh, arg_shapes, result_shapes):
        axis = _axis(arg_shapes)
        return (
            NamedSharding(mesh, PartitionSpec(axis)),
            NamedSharding(mesh, PartitionSpec()),
            NamedSharding(mesh, PartitionSpec()),
        )

    def partition(mesh, arg_shapes, result_shapes):
        axis = _axis(arg_shapes)
        bsh = NamedSharding(mesh, PartitionSpec(axis))
        rep = NamedSharding(mesh, PartitionSpec())

        def fn(x, wq, wo, g):
            dx, dwq, dwo = raw(x, wq, wo, g)
            if axis is not None:
                dwq = jax.lax.psum(dwq, axis)
                dwo = jax.lax.psum(dwo, axis)
            return dx, dwq, dwo

        return mesh, fn, (bsh, rep, rep), (bsh, rep, rep, bsh)

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        # b is reduced away in the dW outputs -> all-reduce over its axis
        sharding_rule="b n c, c d, e f, b n h -> b n c, c d, e f",
    )
    return cp


@functools.lru_cache(maxsize=None)
def _block_fwd_part(heads: int):
    return _block_partitioned_fwd(heads)


@functools.lru_cache(maxsize=None)
def _block_bwd_part(heads: int):
    return _block_partitioned_bwd(heads)


def block_kernel_fits(n: int, channels: int, heads: int) -> bool:
    """True if the whole-block kernels (fwd AND bwd) fit the VMEM budget at
    bb=1. At wide channels the bwd kernel's resident fp32 dW accumulators
    (16c^2 bytes) plus the weights alone can exceed the budget — callers
    must fall back to the unfused path rather than OOM on-chip."""
    pair = _use_pair(heads, n)
    hd = channels // heads
    for bwd in (False, True):
        per = _block_sample_bytes(n, channels, heads, bwd, pair)
        scratch = _block_pair_scratch_bytes(1, n, hd, pair)
        if per + scratch + _block_fixed_bytes(channels, bwd) > _BUDGET:
            return False
    return True


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def attention_block(
    x: jnp.ndarray, wqkv: jnp.ndarray, wout: jnp.ndarray, num_heads: int
) -> jnp.ndarray:
    """Fused CosineAttention BLOCK: mp_add(x, out_conv(attn(qkv_conv(x))), 0.5).

    x: (b, tokens, C) compute dtype; wqkv: (C, 3C) / wout: (C, C) EFFECTIVE
    (already weight-normalized) kernels in the compute dtype. One Pallas
    kernel forward and one backward; backward recomputes qkv/attention from
    x (flash trade) and returns (dx, dwqkv fp32, dwout fp32) with weight
    grads accumulated across the batch grid in VMEM.
    """
    return _block_fwd_part(num_heads)(x, wqkv, wout)


def _ab_vjp_fwd(x, wqkv, wout, num_heads):
    return _block_fwd_part(num_heads)(x, wqkv, wout), (x, wqkv, wout)


def _ab_vjp_bwd(num_heads, res, g):
    x, wqkv, wout = res
    dx, dwq, dwo = _block_bwd_part(num_heads)(x, wqkv, wout, g)
    return dx, dwq.astype(wqkv.dtype), dwo.astype(wout.dtype)


attention_block.defvjp(_ab_vjp_fwd, _ab_vjp_bwd)
