"""EDM2 magnitude-preserving U-Net denoiser, TPU-native.

Re-designed from the reference Denoiser (src/tinyedm/networks.py:490-605):
NHWC activations, bf16 compute with fp32 preconditioning/loss path, static
block unrolling (everything under one jit; no dynamic shapes).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
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
    parse_block_type,
    validate_topology,
)
from tinyedm_tpu.ops.precond import edm_precond

Dtype = Any


def _convs_saveable_policy(prim, *_, **__):
    """jax.checkpoint policy: save conv/matmul/custom-kernel OUTPUTS,
    rematerialize everything elementwise between them in the backward pass.
    Keeps the FLOP-heavy ops single-execution while the fp32-island /
    pixel-norm / mp_add chains stop costing HBM residual traffic (recompute
    is VPU-only)."""
    return getattr(prim, "name", "") in (
        "conv_general_dilated",
        "dot_general",
        "custom_vjp_call",
        "custom_vjp_call_jaxpr",
    )


def _remat_wrap(cls, static_argnums, remat, policy):
    if not remat:
        return cls
    if policy == "convs":
        return nn.remat(cls, static_argnums=static_argnums, policy=_convs_saveable_policy)
    return nn.remat(cls, static_argnums=static_argnums)


class _EncoderScanCell(nn.Module):
    """lax.scan cell wrapping one EncoderBlock: carry = (x, embedding),
    per-iteration output = the block output (pushed as a skip)."""

    out_channels: int
    attention: bool
    num_heads: int
    dropout_rate: float
    add_factor: float
    dtype: Dtype
    use_pallas_attention: bool
    mod_fp32: bool
    remat: bool
    remat_policy: str
    train: bool

    @nn.compact
    def __call__(self, carry, _):
        x, emb = carry
        cls = _remat_wrap(EncoderBlock, (3,), self.remat, self.remat_policy)
        y = cls(
            out_channels=self.out_channels,
            down=False,
            attention=self.attention,
            num_heads=self.num_heads,
            dropout_rate=self.dropout_rate,
            add_factor=self.add_factor,
            dtype=self.dtype,
            use_pallas_attention=self.use_pallas_attention,
            mod_fp32=self.mod_fp32,
            name="block",
        )(x, emb, self.train)
        if self.dtype != jnp.float32:
            # same encoder-output barrier as the unrolled path (see the
            # encoder loop in Denoiser.__call__): the block output is
            # multi-consumer (stacked skip + carry) and must materialize as
            # ONE shared bf16 buffer inside the scanned body
            y = jax.lax.optimization_barrier(y)
        return (y, emb), y


class _DecoderScanCell(nn.Module):
    """lax.scan cell wrapping one DecoderBlock: carry = (x, embedding),
    per-iteration input = that block's skip tensor (or None)."""

    out_channels: int
    attention: bool
    num_heads: int
    dropout_rate: float
    add_factor: float
    dtype: Dtype
    use_pallas_attention: bool
    mod_fp32: bool
    remat: bool
    remat_policy: str
    train: bool

    @nn.compact
    def __call__(self, carry, skip):
        x, emb = carry
        cls = _remat_wrap(DecoderBlock, (4,), self.remat, self.remat_policy)
        y = cls(
            out_channels=self.out_channels,
            up=False,
            attention=self.attention,
            num_heads=self.num_heads,
            dropout_rate=self.dropout_rate,
            add_factor=self.add_factor,
            dtype=self.dtype,
            use_pallas_attention=self.use_pallas_attention,
            mod_fp32=self.mod_fp32,
            name="block",
        )(x, emb, skip, self.train)
        return (y, emb), None


def _scan_cell(cell_cls, length: int):
    """nn.scan a block cell: params stacked on axis 0, per-iteration param
    slices and dropout rngs (same distribution as the unrolled form)."""
    return nn.scan(
        cell_cls,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        length=length,
    )


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
    # remat flavor: "full" recomputes whole blocks (min memory, ~21% slower);
    # "convs" saves conv/matmul outputs and recomputes only the elementwise
    # chains between them - same numerics, trades VPU recompute for HBM
    # residual traffic
    remat_policy: str = "full"
    # Compile-time lever (ROADMAP 3): fold runs of identical consecutive
    # blocks (same type/channels, no resampling, uniform skip usage) into
    # one nn.scan with axis-0-stacked parameters — the XLA graph then
    # contains each distinct block body once instead of once per block,
    # cutting cold-compile time for deep topologies. Changes the checkpoint
    # tree (scanned groups live under {encoder,decoder}_scan_{start}); see
    # utils.interop.migrate_params_to_scanned for converting existing
    # checkpoints. Numerics are identical to the unrolled form.
    scan_blocks: bool = False

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

        enc_types = list(self.encoder_block_types)
        enc_ch = list(self.encoder_out_channels)
        skips = [x]
        i = 0
        while i < len(enc_types):
            down, attn = parse_block_type(enc_types[i])
            ch = enc_ch[i]
            length = 1
            if self.scan_blocks and not down and x.shape[-1] == ch:
                while (
                    i + length < len(enc_types)
                    and enc_types[i + length] == enc_types[i]
                    and enc_ch[i + length] == ch
                ):
                    length += 1
            if length > 1:
                (x, _), ys = _scan_cell(_EncoderScanCell, length)(
                    out_channels=ch,
                    attention=attn,
                    num_heads=self.num_heads,
                    dropout_rate=self.dropout_rate,
                    add_factor=self.encoder_add_factor,
                    dtype=self.dtype,
                    use_pallas_attention=self.use_pallas_attention,
                    mod_fp32=self.mod_fp32,
                    remat=self.remat,
                    remat_policy=self.remat_policy,
                    train=train,
                    name=f"encoder_scan_{i}",
                )((x, embedding), None)
                skips.extend(ys[k] for k in range(length))
            else:
                enc_cls = _remat_wrap(EncoderBlock, (3,), self.remat, self.remat_policy)
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
                if self.dtype != jnp.float32:
                    # Encoder outputs are multi-consumer (skip list + next
                    # block) and always materialize; the barrier pins ONE
                    # shared bf16 buffer. Without it XLA hoists a consumer's
                    # f32 upcast (downsample_2x's mean accumulator) into the
                    # producer fusion, writing the full-res tensor twice —
                    # bf16 + f32, +268 MB HBM at CIFAR's 32x32 site — and
                    # clones epilogue chains into every consumer. Measured
                    # (BENCH.md round 3): barrier on ALL encoder outputs
                    # beats barriering only the pre-downsample ones on both
                    # CIFAR (157.3 vs 159.4 ms) and ImageNet-64 (540.8 vs
                    # 547.6 ms at batch 128). Bit-identical values.
                    x = jax.lax.optimization_barrier(x)
                skips.append(x)
            i += length

        dec_types = list(self.decoder_block_types)
        dec_ch = list(self.decoder_out_channels)
        dec_skip = list(self.skip_connections)
        i = 0
        while i < len(dec_types):
            up, attn = parse_block_type(dec_types[i])
            ch = dec_ch[i]
            has_skip = dec_skip[i]
            length = 1
            if self.scan_blocks and not up and x.shape[-1] == ch:
                while (
                    i + length < len(dec_types)
                    and dec_types[i + length] == dec_types[i]
                    and dec_ch[i + length] == ch
                    and dec_skip[i + length] == has_skip
                    and (
                        not has_skip
                        or skips[-(length + 1)].shape == skips[-1].shape
                    )
                ):
                    length += 1
            if length > 1:
                skip_stack = (
                    jnp.stack([skips.pop() for _ in range(length)])
                    if has_skip
                    else None
                )
                (x, _), _ = _scan_cell(_DecoderScanCell, length)(
                    out_channels=ch,
                    attention=attn,
                    num_heads=self.num_heads,
                    dropout_rate=self.dropout_rate,
                    add_factor=self.decoder_add_factor,
                    dtype=self.dtype,
                    use_pallas_attention=self.use_pallas_attention,
                    mod_fp32=self.mod_fp32,
                    remat=self.remat,
                    remat_policy=self.remat_policy,
                    train=train,
                    name=f"decoder_scan_{i}",
                )((x, embedding), skip_stack)
            else:
                skip = skips.pop() if has_skip else None
                dec_cls = _remat_wrap(DecoderBlock, (4,), self.remat, self.remat_policy)
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
            i += length

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
        # forward the train flag when the wrapped net takes one (the torch
        # reference gets this implicitly through module train mode; dropping
        # it here would silently disable dropout in training). Nets without
        # a train parameter keep the bare 3-arg contract.
        import inspect

        if "train" in inspect.signature(type(self.net).__call__).parameters:
            f = self.net(c.c_in * noisy32, c.c_noise, embedding, train=train)
        else:
            f = self.net(c.c_in * noisy32, c.c_noise, embedding)
        return c.c_skip * noisy32 + c.c_out * f.astype(jnp.float32)
