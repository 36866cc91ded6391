"""Train state pytree + forced weight normalization transform.

The whole training status — params, Adam moments, the list of EMA trees, the
step counter — is one pytree that lives sharded/replicated on-device and is
threaded through the single jitted train step (SURVEY.md §7.1).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from tinyedm_tpu.ops.mp import pixel_norm, weight_normalize


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32 scalar — optimizer step count
    params: Any
    constants: Any  # non-trainable (fourier freqs/phases)
    opt_state: Any  # (mu, nu) adam moments
    ema: tuple  # tuple of EMA param trees, one per tracked sigma_rel


def force_weight_norm(params: Any) -> Any:
    """Re-normalize every stored weight-normed kernel to unit per-output RMS.

    Functional equivalent of the reference's in-place renorm under no_grad on
    each training forward (networks.py:32-34, 55-57): because
    normalize(normalize(w)) == normalize(w) (up to the eps offset), applying
    it once per optimizer step — after the Adam update, before the next
    forward — reproduces the reference's train-time semantics without
    mutation. Applies to leaves named 'w' (WNConv HWIO / WNLinear (out,in));
    gains, fourier constants etc. are untouched.
    """

    def fix(path, leaf):
        last = path[-1]
        name = getattr(last, "key", None)
        if name != "w":
            return leaf
        if leaf.ndim in (2, 4):
            return weight_normalize(leaf)
        # scan-stacked kernels (Denoiser(scan_blocks=True)): leading axis is
        # the block index, normalization is per (block, output unit)
        if leaf.ndim == 3:  # (L, out, in)
            return pixel_norm(leaf, axis=(2,))
        if leaf.ndim == 5:  # (L, kh, kw, in, out)
            return pixel_norm(leaf, axis=(1, 2, 3))
        return leaf

    return jax.tree_util.tree_map_with_path(fix, params)
