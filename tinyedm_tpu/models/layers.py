"""TPU-native magnitude-preserving layers.

Functional (flax.linen) re-design of the reference's torch layers
(src/tinyedm/networks.py:22-207). Key TPU-first choices:

  * NHWC activations / HWIO weights — channels on the 128-lane axis so XLA
    tiles convs and 1x1-conv matmuls straight onto the MXU.
  * Explicit dtype policy instead of autocast: every module takes a compute
    ``dtype`` (bf16 in training); parameters are stored fp32; the reference's
    fp32 islands (embedding path, per-block modulation, pixel-norm reductions;
    networks.py:10,164,255,319) are explicit casts here.
  * "Forced weight normalization" (networks.py:32-34: in-place re-norm of the
    stored weight each training forward) becomes a pure tree transform applied
    once per optimizer step — see tinyedm_tpu.training.force_weight_norm.
    The effective weight used by every forward is ``normalize(w)/sqrt(fan_in)``
    with gradients flowing through the normalize, exactly as the reference
    (networks.py:35-37, 58-60).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tinyedm_tpu.ops.mp import mp_add, mp_silu, pixel_norm, weight_normalize
from tinyedm_tpu.parallel.mesh import constrain_kernel

Dtype = Any


def _normal_init(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


def _conv3x3_ref(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


@jax.custom_vjp
def _small_ci_conv3x3(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """3x3 SAME conv for tiny input channels (conv_in: Ci = in+1).

    Forward: 9-tap im2col flattened to one GEMM — the conv emitter's forward
    runs Ci<=8 at <10 TF/s (round-2 fusion table) while the flat GEMM is
    HBM-floor bound. Backward: the conv emitter's bwd-filter form — the
    im2col autodiff wgrad regenerates the 9-slice concat inside its fusion
    (formatting-bound: 0.56 ms vs 0.35 for the conv form at CIFAR's conv_in;
    experiments/bench_convin_wgrad.py). Same MACs, fp32 MXU accumulation,
    bf16-rounded outputs in both forms.
    """
    b, hh, ww, ci = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.concatenate(
        [xp[:, i : i + hh, j : j + ww, :] for i in range(3) for j in range(3)],
        axis=-1,
    )  # (B, H, W, 9*Ci), tap-major to match HWIO flattening
    y = jax.lax.dot_general(
        patches.reshape(-1, 9 * ci),
        w.reshape(9 * ci, -1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=x.dtype,
    )
    return y.reshape(b, hh, ww, -1)


def _small_ci_conv3x3_fwd(x, w):
    return _small_ci_conv3x3(x, w), (x, w)


def _small_ci_conv3x3_bwd(res, dy):
    x, w = res
    # both cotangents via the conv emitter's transpose forms; the unused one
    # (conv_in's input is a leaf) is dead code XLA removes
    _, vjp = jax.vjp(_conv3x3_ref, x, w)
    return vjp(dy)


_small_ci_conv3x3.defvjp(_small_ci_conv3x3_fwd, _small_ci_conv3x3_bwd)


class WNLinear(nn.Module):
    """Weight-normalized, bias-free linear layer (reference Linear, networks.py:46-64).

    Stored weight: (out, in) fp32, init N(0,1). Effective weight:
    normalize(w)/sqrt(fan_in), cast to ``dtype`` for the matmul.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        w = self.param("w", _normal_init, (self.features, in_features))
        # TP hint: restate the kernel's own layout at the use site (no-op off
        # the model axis; prevents ZeRO-1 moment layouts leaking into the
        # forward weight pipeline — see parallel/mesh.py::constrain_kernel)
        w = constrain_kernel(w)
        w_eff = weight_normalize(w) * (1.0 / math.sqrt(in_features))
        x = x.astype(self.dtype)
        return jax.lax.dot_general(
            x,
            w_eff.astype(self.dtype),
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=self.dtype,
        )


class WNConv(nn.Module):
    """Weight-normalized, bias-free 2D conv, padding SAME (reference Conv2d,
    networks.py:22-43). NHWC in/out; HWIO stored weight, init N(0,1)."""

    features: int
    kernel_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        k = self.kernel_size
        w = self.param("w", _normal_init, (k, k, in_ch, self.features))
        w = constrain_kernel(w)  # TP hint, no-op off the model axis
        fan_in = in_ch * k * k
        w_eff = weight_normalize(w) * (1.0 / math.sqrt(fan_in))
        x = x.astype(self.dtype)
        if k == 1:
            # 1x1 conv == per-pixel matmul. Flatten to a rank-2 GEMM: a 4D
            # dot_general still goes through XLA:TPU's conv emitter (profiled
            # dgrad at 50 TFLOP/s, 25% MFU), while the flat (B*H*W, Cin) @
            # (Cin, Cout) form takes the plain GEMM path fwd and bwd.
            y = jax.lax.dot_general(
                x.reshape(-1, in_ch),
                w_eff[0, 0].astype(self.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=self.dtype,
            )
            return y.reshape(x.shape[:-1] + (self.features,))
        if k == 3 and in_ch <= 8:
            # tiny-input-channel 3x3 (conv_in: Ci = in+1): im2col-GEMM
            # forward + conv-emitter backward (see _small_ci_conv3x3)
            return _small_ci_conv3x3(x, w_eff.astype(self.dtype))
        return jax.lax.conv_general_dilated(
            x,
            w_eff.astype(self.dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        )


def upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-exact upsampling (reference UpSample, networks.py:67-72).

    For an integer 2x factor, nearest-exact == repeat each pixel twice.
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def downsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average-pool downsampling (reference DownSample, networks.py:75-80).

    Reshape-mean instead of reduce_window: cheaper for XLA to fuse.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))


class UncertaintyNet(nn.Module):
    """EDM2 multi-task uncertainty head (reference: networks.py:91-103).

    Runs on the fp32 fourier embedding; entire module fp32.
    """

    hidden_features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(jnp.float32)
        ones = jnp.ones_like(x[:, :1])
        x = jnp.concatenate([x, ones], axis=-1)
        x = mp_silu(WNLinear(self.hidden_features, dtype=jnp.float32)(x))
        gain = self.param("gain", nn.initializers.zeros, ())
        return gain * WNLinear(1, dtype=jnp.float32)(x)


class ScaleLong(nn.Module):
    """Learned skip-connection gain (ScaleLong; reference: networks.py:106-118).

    Input: skip tensor (B, H, W, C). Output: per-channel gain (B, 1, 1, C).
    """

    r: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        ones = jnp.ones_like(x[..., :1])
        x = jnp.concatenate([x, ones], axis=-1)
        pooled = x.mean(axis=(1, 2), keepdims=True)  # (B,1,1,C+1)
        # max(1, .) guards tiny test channel counts; real configs (>=192 ch)
        # match the reference's int(dim // r) exactly
        h = WNConv(max(1, c // self.r), 1, dtype=self.dtype)(pooled)
        h = mp_silu(h)
        h = WNConv(c, 1, dtype=self.dtype)(h)
        return jax.nn.sigmoid(h)


class ClassEmbedding(nn.Module):
    """One-hot class embedding scaled by sqrt(num_classes)
    (reference: networks.py:121-129). fp32."""

    num_classes: int
    embedding_dim: int

    @nn.compact
    def __call__(self, labels: jnp.ndarray) -> jnp.ndarray:
        onehot = jax.nn.one_hot(labels.reshape(-1), self.num_classes, dtype=jnp.float32)
        onehot = onehot * jnp.float32(math.sqrt(self.num_classes))
        return WNLinear(self.embedding_dim, dtype=jnp.float32)(onehot)


class FourierEmbedding(nn.Module):
    """Random Fourier features (reference: networks.py:132-141).

    freqs/phases are non-trainable constants (torch buffers) — stored in the
    'constants' collection so the optimizer never touches them.
    """

    embedding_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        two_pi = 2.0 * math.pi
        freqs = self.variable(
            "constants",
            "freqs",
            lambda: two_pi * jax.random.normal(self.make_rng("params"), (self.embedding_dim,)),
        ).value
        phases = self.variable(
            "constants",
            "phases",
            lambda: two_pi * jax.random.uniform(self.make_rng("params"), (self.embedding_dim,)),
        ).value
        x = x.reshape(-1).astype(jnp.float32)
        y = jnp.cos(jnp.outer(x, freqs) + phases)
        return y * jnp.float32(math.sqrt(2.0))


class Embedding(nn.Module):
    """sigma (+ optional class) embedding (reference: networks.py:144-178).

    The whole forward is an fp32 island (reference disables autocast,
    networks.py:164). Returns ``(fourier_embedding, embedding)``: the fourier
    half feeds UncertaintyNet during training (edm.py:214).
    """

    fourier_dim: int
    embedding_dim: int
    num_classes: Optional[int] = None
    add_factor: float = 0.5

    @nn.compact
    def __call__(
        self, sigma: jnp.ndarray, class_labels: Optional[jnp.ndarray] = None
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        sigma = sigma.astype(jnp.float32)
        c_noise = jnp.log(sigma) / 4.0  # preconditioning (networks.py:165)
        fourier = FourierEmbedding(self.fourier_dim, name="fourier_embed")(c_noise)
        emb = WNLinear(self.embedding_dim, dtype=jnp.float32, name="sigma_embed")(fourier)
        if class_labels is not None:
            if self.num_classes is None or self.num_classes == -1:
                raise ValueError("class_labels given but num_classes is None")
            class_emb = ClassEmbedding(
                self.num_classes, self.embedding_dim, name="class_embed"
            )(class_labels)
            emb = mp_add(emb, class_emb, self.add_factor)
        return fourier, mp_silu(emb)


class _ConvWeight(nn.Module):
    """Bare stored-weight holder with WNConv's exact param name/shape/init.

    Used by fused whole-block kernels that consume the EFFECTIVE weight
    directly: the param tree stays byte-identical to the WNConv submodule it
    replaces ('<name>/w', HWIO, N(0,1) init), so checkpoints are
    interchangeable between the fused and unfused paths.
    """

    shape: tuple

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("w", _normal_init, self.shape)


class CosineAttention(nn.Module):
    """Cosine self-attention over spatial tokens (reference: networks.py:181-207).

    qkv via 1x1 conv, pixel_norm over head_dim (=> cosine similarity logits),
    softmax(QK^T/sqrt(d))V, 1x1 out conv, residual mp_add(x, y, 0.5).

    Layout: tokens = H*W on the sublane axis, head_dim on the lane axis —
    the (tokens, head_dim) layout SURVEY.md §5 calls for, so a Pallas
    flash-attention kernel can slot in for large token counts.
    Softmax runs in fp32.
    """

    num_heads: int = 4
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    # fused-kernel dispatch: "auto" = the qkv-only fused kernel
    # (pixel_norm + both einsums + softmax in one Pallas call) on TPU for
    # aligned token counts n <= MAX_FUSED_TOKENS; the XLA path elsewhere
    # (CPU tests keep XLA numerics). "block" opts into the WHOLE-block
    # kernel (qkv conv + attention + out conv + residual,
    # ops/fused_attention.py attention_block) where it fits VMEM; "on"
    # forces the qkv-only kernel, "off" forces the XLA path.
    fused: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        assert c % self.num_heads == 0
        hd = c // self.num_heads
        n = h * w

        from tinyedm_tpu.ops.fused_attention import (
            MAX_FUSED_TOKENS,
            attention_block,
            block_kernel_fits,
            cosine_attention_qkv,
        )

        # "block" is opt-in only: measured 176.0 vs 170.5 ms/step on the
        # CIFAR recipe (BENCH.md round 2) — the in-kernel (bb*n, C) GEMMs
        # stream too few rows per instance to match XLA's monolithic
        # (B*n, C) GEMMs, which outweighs the saved qkv/attn-out HBM round
        # trips. Kept for topologies where HBM, not MXU, is the bound.
        # At wide channels the bwd kernel's resident fp32 dW accumulators
        # can't fit VMEM — fall back to the unfused path instead of OOMing.
        use_block = self.fused == "block" and block_kernel_fits(n, c, self.num_heads)
        if use_block:
            wq4 = _ConvWeight((1, 1, c, 3 * c), name="qkv_conv")()
            wo4 = _ConvWeight((1, 1, c, c), name="out_conv")()
            inv = 1.0 / math.sqrt(c)
            wq = (weight_normalize(wq4) * inv)[0, 0].astype(self.dtype)
            wo = (weight_normalize(wo4) * inv)[0, 0].astype(self.dtype)
            y = attention_block(
                x.reshape(b, n, c).astype(self.dtype), wq, wo, self.num_heads
            )
            return y.reshape(b, h, w, c)

        qkv = WNConv(3 * c, 1, dtype=self.dtype, name="qkv_conv")(x)

        # n % 8: Mosaic requires sublane-aligned token counts inside the
        # kernels (MNIST's 7x7=49-token attention hits "offset mismatch on
        # non-concat dimension" otherwise) — unaligned n takes the XLA path
        use_fused = self.fused == "on" or (
            self.fused == "auto"
            and n <= MAX_FUSED_TOKENS
            and n % 8 == 0
            and jax.default_backend() == "tpu"
        )
        if use_fused:
            # one Pallas call replaces pixel_norm + both einsums + softmax +
            # all reshapes; identical math (see fused_attention docstring)
            y = cosine_attention_qkv(qkv.reshape(b, n, 3 * c), self.num_heads)
        else:
            qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
            qkv = pixel_norm(qkv, axis=-1)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, heads, hd)

            if self.use_pallas:
                from tinyedm_tpu.ops.attention import flash_attention

                y = flash_attention(q, k, v)
            else:
                scale = 1.0 / math.sqrt(hd)
                logits = jnp.einsum(
                    "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
                ) * jnp.float32(scale)
                weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
                y = jnp.einsum(
                    "bhqk,bkhd->bqhd", weights, v, preferred_element_type=self.dtype
                )
        y = y.reshape(b, h, w, c)
        y = WNConv(c, 1, dtype=self.dtype, name="out_conv")(y)
        return mp_add(x.astype(self.dtype), y, 0.5)
