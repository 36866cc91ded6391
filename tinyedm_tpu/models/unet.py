"""EDM2 magnitude-preserving U-Net denoiser, TPU-native.

Re-designed from the reference Denoiser (src/tinyedm/networks.py:490-605):
NHWC activations, bf16 compute with fp32 preconditioning/loss path, static
block unrolling (everything under one jit; no dynamic shapes).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from tinyedm_tpu.models.blocks import DecoderBlock, EncoderBlock
from tinyedm_tpu.models.layers import WNConv
from tinyedm_tpu.models.topology import (
    default_decoder_block_types,
    default_decoder_out_channels,
    default_encoder_block_types,
    default_encoder_out_channels,
    default_skip_connections,
    get_skip_channels,
    parse_block_type,
    validate_topology,
)
from tinyedm_tpu.ops.precond import edm_precond

Dtype = Any


class Denoiser(nn.Module):
    """EDM-preconditioned U-Net: D(x; sigma) = c_skip*x + c_out*F(c_in*x, emb).

    Matches reference semantics (networks.py:577-605):
      * input = concat(c_in * noisy, ones-channel)  [ones replaces bias]
      * conv_in output is pushed as the first skip
      * every encoder block output is pushed as a skip
      * decoder blocks pop skips LIFO per the skip_connections mask
      * output = conv_out(x) * gain_out (init 0) * c_out + noisy * c_skip
    """

    in_channels: int = 3
    out_channels: int = 3
    encoder_block_types: Sequence[str] = default_encoder_block_types()
    decoder_block_types: Sequence[str] = default_decoder_block_types()
    encoder_out_channels: Sequence[int] = default_encoder_out_channels()
    decoder_out_channels: Sequence[int] = default_decoder_out_channels()
    skip_connections: Sequence[bool] = default_skip_connections()
    dropout_rate: float = 0.0
    sigma_data: float = 0.5
    encoder_add_factor: float = 0.3
    decoder_add_factor: float = 0.3
    embedding_dim: int = 768
    num_heads: int = 4
    dtype: Dtype = jnp.float32
    use_pallas_attention: bool = False
    mod_fp32: bool = True  # see blocks.py: fp32 modulation-island semantics
    # rematerialize each block in the backward pass (jax.checkpoint): trades
    # ~33% extra forward FLOPs for O(depth) less activation memory — for
    # batch/resolution scales where activations would not fit HBM
    remat: bool = False

    def setup(self) -> None:
        validate_topology(
            self.encoder_block_types,
            self.decoder_block_types,
            self.encoder_out_channels,
            self.decoder_out_channels,
            self.skip_connections,
        )

    @nn.compact
    def __call__(
        self,
        noisy_image: jnp.ndarray,  # (B, H, W, C) — any float dtype; treated fp32
        sigma: jnp.ndarray,  # (B,)
        embedding: jnp.ndarray,  # (B, embedding_dim) fp32
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        noisy32 = noisy_image.astype(jnp.float32)
        c = edm_precond(sigma, self.sigma_data)

        x = c.c_in * noisy32
        ones = jnp.ones_like(x[..., :1])
        x = jnp.concatenate([x, ones], axis=-1)
        x = WNConv(self.encoder_out_channels[0], 3, dtype=self.dtype, name="conv_in")(x)

        skips = [x]
        for i, (btype, ch) in enumerate(
            zip(self.encoder_block_types, self.encoder_out_channels)
        ):
            down, attn = parse_block_type(btype)
            enc_cls = (
                nn.remat(EncoderBlock, static_argnums=(3,))
                if self.remat
                else EncoderBlock
            )
            x = enc_cls(
                out_channels=ch,
                down=down,
                attention=attn,
                num_heads=self.num_heads,
                dropout_rate=self.dropout_rate,
                add_factor=self.encoder_add_factor,
                dtype=self.dtype,
                use_pallas_attention=self.use_pallas_attention,
                mod_fp32=self.mod_fp32,
                name=f"encoder_blocks_{i}",
            )(x, embedding, train)
            skips.append(x)

        for i, (btype, ch, has_skip) in enumerate(
            zip(
                self.decoder_block_types,
                self.decoder_out_channels,
                self.skip_connections,
            )
        ):
            up, attn = parse_block_type(btype)
            skip = skips.pop() if has_skip else None
            dec_cls = (
                nn.remat(DecoderBlock, static_argnums=(4,))
                if self.remat
                else DecoderBlock
            )
            x = dec_cls(
                out_channels=ch,
                up=up,
                attention=attn,
                num_heads=self.num_heads,
                dropout_rate=self.dropout_rate,
                add_factor=self.decoder_add_factor,
                dtype=self.dtype,
                use_pallas_attention=self.use_pallas_attention,
                mod_fp32=self.mod_fp32,
                name=f"decoder_blocks_{i}",
            )(x, embedding, skip, train)

        gain_out = self.param("gain_out", nn.initializers.zeros, ())
        out = WNConv(self.out_channels, 1, dtype=self.dtype, name="conv_out")(x)
        # fp32 combine (matches torch type promotion under autocast: the c_out
        # multiply and the residual add run fp32, so the loss sees fp32)
        out = out.astype(jnp.float32) * gain_out
        return out * c.c_out + noisy32 * c.c_skip


class DenoiserWrapper(nn.Module):
    """Generic EDM preconditioner around any net(c_in*x, c_noise, emb)
    (reference: networks.py:608-647). Exported for API parity; the shipped
    configs use Denoiser directly."""

    net: nn.Module
    sigma_data: float = 0.5

    @nn.compact
    def __call__(
        self,
        noisy_image: jnp.ndarray,
        sigma: jnp.ndarray,
        embedding: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        noisy32 = noisy_image.astype(jnp.float32)
        c = edm_precond(sigma, self.sigma_data)
        f = self.net(c.c_in * noisy32, c.c_noise, embedding)
        return c.c_skip * noisy32 + c.c_out * f.astype(jnp.float32)
