"""Encoder/decoder U-Net blocks (reference: src/tinyedm/networks.py:210-329).

NHWC, compute-dtype parametrized. The per-block embedding modulation is an
fp32 island (reference disables autocast around it, networks.py:255-258,
319-321): the embedding linear runs fp32, the modulation product and the
following mp_silu stay fp32, and the next conv casts back to the compute
dtype — mirroring torch autocast semantics exactly.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tinyedm_tpu.models.layers import (
    CosineAttention,
    ScaleLong,
    WNConv,
    WNLinear,
    downsample_2x,
    upsample_2x,
)
from tinyedm_tpu.ops.dropout import dropout_threshold
from tinyedm_tpu.ops.mp import mp_add, mp_silu, pixel_norm
from tinyedm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, constrain

Dtype = Any


def _modulated_residual(
    res: jnp.ndarray,
    gmod: jnp.ndarray,
    key,
    dropout_rate: float,
    out_dtype,
    mod_fp32: bool,
    remat: bool,
) -> jnp.ndarray:
    """modulate (fp32 island) -> mp_silu -> dropout -> cast to compute dtype.

    With ``remat`` (default), the segment is wrapped in ``jax.checkpoint`` so
    the backward pass recomputes it from the (bf16) conv output + the (B, C)
    modulation vector instead of storing the fp32 modulated tensor, the fp32
    silu output, and the dropout mask as residuals — pure elementwise
    recompute (VPU) in exchange for hundreds of MB of fp32 HBM residual
    traffic per 32x32 block. The dropout BITS are drawn outside the
    checkpoint and passed as an argument (= saved residual): re-running the
    RNG in the backward measured +1.9 ms/step, more than the uint16 bits'
    save/reload traffic. Numerically identical either way (same values,
    same bits).
    """
    from tinyedm_tpu.ops.dropout import apply_dropout_bits, dropout_bits

    use_dropout = key is not None and dropout_threshold(dropout_rate) < 65536

    def seg(res_c, gmod, bits):
        r = res_c.astype(jnp.float32) * gmod[:, None, None, :]
        if not mod_fp32:
            r = r.astype(out_dtype)
        r = mp_silu(r)
        if bits is not None:
            r = apply_dropout_bits(bits, r, dropout_rate)
        # fp32 islands only: materialize the island's bf16 output instead of
        # letting XLA fuse the fp32 chain into the next conv's operand
        # pipeline — a prologue-fused fp32 island drops the conv_3x3_2 wgrad
        # from 192 to 116 TF/s (profiled round 3); one extra bf16 write/read
        # is far cheaper. A bf16 island (mod_fp32=False) fuses cleanly, and
        # the barrier only costs there (1622 -> 1558 samples/s measured).
        r = r.astype(out_dtype)
        return jax.lax.optimization_barrier(r) if mod_fp32 else r

    bits = dropout_bits(key, res.shape) if use_dropout else None
    if remat:
        if bits is None:
            seg_nb = jax.checkpoint(lambda r, g: seg(r, g, None))
            return seg_nb(res, gmod)
        return jax.checkpoint(seg)(res, gmod, bits)
    return seg(res, gmod, bits)


class EncoderBlock(nn.Module):
    """Reference EncoderBlock (networks.py:210-265).

    resample(down?) -> 1x1 conv (if channels change) -> pixel_norm(channels)
    -> residual branch [mp_silu -> 3x3 -> emb-mod(fp32) -> mp_silu -> dropout
    -> 3x3] -> mp_add(x, res, add_factor) -> optional cosine attention.
    """

    out_channels: int
    down: bool = False
    attention: bool = False
    num_heads: int = 4
    dropout_rate: float = 0.0
    add_factor: float = 0.3
    dtype: Dtype = jnp.float32
    use_pallas_attention: bool = False
    # True (default) = reference fp32 island semantics (networks.py:255,319).
    # False casts the modulated residual to the compute dtype before mp_silu:
    # measured +5.8%% train throughput on v5e; bf16 keeps fp32 range (the
    # reference's fp16-overflow concern does not apply), only mantissa
    # precision inside the silu differs.
    mod_fp32: bool = True
    remat_island: bool = True  # recompute the island in bwd (same numerics)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, embedding: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        if self.down:
            x = downsample_2x(x)
        if x.shape[-1] != self.out_channels:
            x = WNConv(self.out_channels, 1, dtype=self.dtype, name="conv_1x1")(x)
        x = pixel_norm(x, axis=-1)

        res = mp_silu(x)
        res = WNConv(self.out_channels, 3, dtype=self.dtype, name="conv_3x3_1")(res)

        # fp32 island: embedding modulation (networks.py:255-258)
        g = WNLinear(self.out_channels, dtype=jnp.float32, name="embed")(
            embedding.astype(jnp.float32)
        )
        # TP: pin the tiny (B, C) modulation vector to (data, model) — the
        # layout its consumer (res: B over data, C over model) broadcasts
        # against. Without the hint GSPMD falls back to involuntary full
        # rematerialization here every block (no-op off the model axis).
        g = constrain(g, DATA_AXIS, MODEL_AXIS)
        gain = self.param("gain", nn.initializers.ones, ())
        key = self.make_rng("dropout") if (train and self.dropout_rate > 0.0) else None
        res = _modulated_residual(
            res,
            (g * gain + 1.0),
            key,
            self.dropout_rate,
            self.dtype,
            self.mod_fp32,
            # remat pays for itself by dropping fp32 residuals; with bf16
            # islands (mod_fp32=False) the residuals are already cheap and
            # the recompute is a net loss (1626 -> 1478 samples/s measured)
            self.remat_island and self.mod_fp32,
        )
        res = WNConv(self.out_channels, 3, dtype=self.dtype, name="conv_3x3_2")(res)

        out = mp_add(x, res, self.add_factor)
        if self.attention:
            out = CosineAttention(
                num_heads=self.num_heads,
                dtype=self.dtype,
                use_pallas=self.use_pallas_attention,
                name="attention",
            )(out)
        return out


class DecoderBlock(nn.Module):
    """Reference DecoderBlock (networks.py:268-329).

    If a skip is given it is concatenated scaled by a learned ScaleLong gain
    (networks.py:309-311). Unlike the encoder there is no pixel_norm, and the
    residual branch is taken from the resampled concat-input BEFORE the 1x1
    conv (networks.py:313-317). The 1x1 conv exists only when
    in+skip channels != out channels.
    """

    out_channels: int
    up: bool = False
    attention: bool = False
    num_heads: int = 4
    dropout_rate: float = 0.0
    add_factor: float = 0.3
    dtype: Dtype = jnp.float32
    use_pallas_attention: bool = False
    mod_fp32: bool = True  # see EncoderBlock.mod_fp32
    remat_island: bool = True  # see EncoderBlock.remat_island

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        embedding: jnp.ndarray,
        skip: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        if skip is not None:
            gain = ScaleLong(dtype=self.dtype, name="cat_factor")(skip)
            x = jnp.concatenate([x, skip.astype(self.dtype) * gain], axis=-1)
        if self.up:
            x = upsample_2x(x)

        res = x
        if x.shape[-1] != self.out_channels:
            x = WNConv(self.out_channels, 1, dtype=self.dtype, name="conv_1x1")(x)

        res = mp_silu(res)
        res = WNConv(self.out_channels, 3, dtype=self.dtype, name="conv_3x3_1")(res)

        # fp32 island: embedding modulation (networks.py:319-321)
        g = WNLinear(self.out_channels, dtype=jnp.float32, name="embed")(
            embedding.astype(jnp.float32)
        )
        # TP activation hint — see EncoderBlock (no-op off the model axis)
        g = constrain(g, DATA_AXIS, MODEL_AXIS)
        gain = self.param("gain", nn.initializers.ones, ())
        key = self.make_rng("dropout") if (train and self.dropout_rate > 0.0) else None
        res = _modulated_residual(
            res,
            (g * gain + 1.0),
            key,
            self.dropout_rate,
            self.dtype,
            self.mod_fp32,
            # remat pays for itself by dropping fp32 residuals; with bf16
            # islands (mod_fp32=False) the residuals are already cheap and
            # the recompute is a net loss (1626 -> 1478 samples/s measured)
            self.remat_island and self.mod_fp32,
        )
        res = WNConv(self.out_channels, 3, dtype=self.dtype, name="conv_3x3_2")(res)

        out = mp_add(x, res, self.add_factor)
        if self.attention:
            out = CosineAttention(
                num_heads=self.num_heads,
                dtype=self.dtype,
                use_pallas=self.use_pallas_attention,
                name="attention",
            )(out)
        return out
