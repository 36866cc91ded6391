"""Stable-Diffusion VAE (AutoencoderKL) in flax — the jitted TPU encode/decode
pass behind the latent pipeline.

The reference delegates to diffusers' torch AutoencoderKL
(src/tinyedm/datamodules/extract_latents.py:62-82, callbacks.py:102-119).
Here the architecture (sd-vae-ft-ema: 4 channel levels 128/256/512/512, 2
resnets per encoder level, mid resnet-attn-resnet, 4-channel latents) is
implemented NHWC in flax, and ``convert_torch_vae`` maps a diffusers state
dict onto it — so pretrained weights load when available locally (this
environment has no network egress) while the whole pipeline stays testable
with random weights.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head self-attention over spatial tokens (SD VAE mid block)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hh, ww, c = x.shape
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32, name="group_norm")(x)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(h).reshape(b, hh * ww, c)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(h).reshape(b, hh * ww, c)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(h).reshape(b, hh * ww, c)
        logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        w = jax.nn.softmax(logits / jnp.sqrt(jnp.float32(c)), axis=-1).astype(self.dtype)
        out = jnp.einsum("bqk,bkc->bqc", w, v).reshape(b, hh, ww, c)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return x + out


class Downsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # SD VAE uses asymmetric (0,1) padding before a stride-2 conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c)).reshape(
            b, h * 2, w * 2, c
        )
        return nn.Conv(
            self.channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv"
        )(x)


class Encoder(nn.Module):
    base_channels: int = 128
    channel_mults: Sequence[int] = (1, 2, 4, 4)
    latent_channels: int = 4
    layers_per_block: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = self.base_channels
        h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(x)
        for i, mult in enumerate(self.channel_mults):
            out_ch = self.base_channels * mult
            for j in range(self.layers_per_block):
                h = ResnetBlock(out_ch, dtype=self.dtype, name=f"down_{i}_block_{j}")(h)
            if i < len(self.channel_mults) - 1:
                h = Downsample(out_ch, dtype=self.dtype, name=f"down_{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(
            2 * self.latent_channels, (3, 3), padding="SAME",
            dtype=self.dtype, name="conv_out",
        )(h)


class Decoder(nn.Module):
    base_channels: int = 128
    channel_mults: Sequence[int] = (1, 2, 4, 4)
    out_channels: int = 3
    layers_per_block: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        mults = list(reversed(self.channel_mults))
        ch = self.base_channels * mults[0]
        h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(ch, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch, dtype=self.dtype, name="mid_block_2")(h)
        for i, mult in enumerate(mults):
            out_ch = self.base_channels * mult
            for j in range(self.layers_per_block):
                h = ResnetBlock(out_ch, dtype=self.dtype, name=f"up_{i}_block_{j}")(h)
            if i < len(mults) - 1:
                h = Upsample(out_ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(
            self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv_out"
        )(h)


class AutoencoderKL(nn.Module):
    """SD VAE: encode -> diagonal Gaussian latents, decode -> image.
    NHWC; images in [-1, 1]; latents 4-channel at 1/8 resolution."""

    base_channels: int = 128
    channel_mults: Sequence[int] = (1, 2, 4, 4)
    latent_channels: int = 4
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        self.encoder = Encoder(
            self.base_channels, self.channel_mults, self.latent_channels,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            self.base_channels, self.channel_mults, dtype=self.dtype
        )
        self.quant_conv = nn.Conv(
            2 * self.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            self.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
        )

    def encode_moments(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_sample(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """latent_dist.sample() equivalent (extract_latents.py:79)."""
        mean, logvar = self.encode_moments(x)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        return self.decode(self.encode_sample(x, rng))


# ---------------------------------------------------------------------------
# diffusers torch -> flax weight conversion
# ---------------------------------------------------------------------------


def _conv(sd, key):
    # torch OIHW -> flax HWIO
    return {"kernel": np.transpose(np.asarray(sd[f"{key}.weight"]), (2, 3, 1, 0)),
            "bias": np.asarray(sd[f"{key}.bias"])}


def _dense(sd, key):
    w = np.asarray(sd[f"{key}.weight"])
    if w.ndim == 4:  # some checkpoints store attention projs as 1x1 convs
        w = w[:, :, 0, 0]
    return {"kernel": w.T, "bias": np.asarray(sd[f"{key}.bias"])}


def _norm(sd, key):
    return {"scale": np.asarray(sd[f"{key}.weight"]), "bias": np.asarray(sd[f"{key}.bias"])}


def _resnet(sd, key):
    out = {
        "norm1": _norm(sd, f"{key}.norm1"),
        "conv1": _conv(sd, f"{key}.conv1"),
        "norm2": _norm(sd, f"{key}.norm2"),
        "conv2": _conv(sd, f"{key}.conv2"),
    }
    if f"{key}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{key}.conv_shortcut")
    return out


def _attn(sd, key):
    names = (
        ("to_q", "to_k", "to_v", "to_out.0")
        if f"{key}.to_q.weight" in sd
        else ("query", "key", "value", "proj_attn")
    )
    return {
        "group_norm": _norm(sd, f"{key}.group_norm"),
        "to_q": _dense(sd, f"{key}.{names[0]}"),
        "to_k": _dense(sd, f"{key}.{names[1]}"),
        "to_v": _dense(sd, f"{key}.{names[2]}"),
        "to_out": _dense(sd, f"{key}.{names[3]}"),
    }


def convert_torch_vae(state_dict: dict, channel_mults=(1, 2, 4, 4)) -> dict:
    """Map a diffusers AutoencoderKL state dict to this module's params."""
    sd = state_dict
    enc: dict[str, Any] = {"conv_in": _conv(sd, "encoder.conv_in")}
    for i in range(len(channel_mults)):
        for j in range(2):
            enc[f"down_{i}_block_{j}"] = _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < len(channel_mults) - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
            }
    enc["mid_block_1"] = _resnet(sd, "encoder.mid_block.resnets.0")
    enc["mid_attn"] = _attn(sd, "encoder.mid_block.attentions.0")
    enc["mid_block_2"] = _resnet(sd, "encoder.mid_block.resnets.1")
    enc["norm_out"] = _norm(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec: dict[str, Any] = {"conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid_block_1"] = _resnet(sd, "decoder.mid_block.resnets.0")
    dec["mid_attn"] = _attn(sd, "decoder.mid_block.attentions.0")
    dec["mid_block_2"] = _resnet(sd, "decoder.mid_block.resnets.1")
    for i in range(len(channel_mults)):
        for j in range(3):
            dec[f"up_{i}_block_{j}"] = _resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < len(channel_mults) - 1:
            dec[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
            }
    dec["norm_out"] = _norm(sd, "decoder.conv_norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


@dataclasses.dataclass
class JaxVAE:
    """Jitted encode/decode handles around AutoencoderKL + params."""

    module: AutoencoderKL
    params: dict

    def __post_init__(self):
        # params are a jit ARGUMENT, not a closure: closing over the ~84M-
        # param (~335 MB fp32) tree would bake it into the computation as
        # embedded constants — constant-folding at trace time, the weights
        # duplicated into the executable, and a retrace if they're swapped
        self._encode = jax.jit(
            lambda params, x, rng: self.module.apply(
                {"params": params}, x, rng, method=AutoencoderKL.encode_sample
            )
        )
        self._decode = jax.jit(
            lambda params, z: self.module.apply(
                {"params": params}, z, method=AutoencoderKL.decode
            )
        )

    def encode(self, images: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """images NHWC in [-1,1] -> sampled latents NHWC (1/8 res, 4ch)."""
        return self._encode(self.params, images, rng)

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """latents NHWC -> images NHWC roughly in [-1,1]."""
        return self._decode(self.params, latents)


def load_vae(
    name_or_path: str = "stabilityai/sd-vae-ft-ema", dtype=jnp.float32
) -> JaxVAE:
    """Load pretrained VAE weights via diffusers (local cache/path only — no
    egress here) and convert to flax params."""
    try:
        from diffusers import AutoencoderKL as TorchVAE
    except ImportError as e:
        raise ImportError(
            "loading pretrained VAE weights requires the `diffusers` package "
            "(and locally cached weights — this environment has no network "
            "egress). For weight-free pipeline testing use "
            "tinyedm_tpu.data.vae.random_vae()."
        ) from e

    torch_vae = TorchVAE.from_pretrained(name_or_path)
    sd = {k: v.detach().cpu().numpy() for k, v in torch_vae.state_dict().items()}
    module = AutoencoderKL(dtype=dtype)
    params = jax.tree_util.tree_map(jnp.asarray, convert_torch_vae(sd))
    return JaxVAE(module=module, params=params)


def random_vae(rng: jax.Array, dtype=jnp.float32, image_size: int = 64) -> JaxVAE:
    """Randomly initialized VAE — architecture/pipeline testing without
    pretrained weights."""
    module = AutoencoderKL(dtype=dtype)
    x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = jax.jit(
        lambda r: module.init({"params": r}, x, jax.random.PRNGKey(0))
    )(rng)
    return JaxVAE(module=module, params=variables["params"])
