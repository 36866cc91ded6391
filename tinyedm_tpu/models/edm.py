"""Top-level EDM model: embedding + denoiser (+ optional uncertainty head).

The reference's EDM is a LightningModule orchestrating training
(src/tinyedm/edm.py:99-334); here the *model* part is a pure flax module and
all orchestration lives in tinyedm_tpu.training. ``__call__`` matches the
reference's ``EDM.forward`` (edm.py:280-286) — it is what the ODE solver
drives — and ``denoise_with_aux`` is the training-path forward that also
returns the fourier embedding for the uncertainty head (edm.py:209-214).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from tinyedm_tpu.models.layers import Embedding, UncertaintyNet
from tinyedm_tpu.models.unet import Denoiser


class EDM(nn.Module):
    embedding: Embedding
    denoiser: Denoiser
    use_uncertainty: bool = False

    @property
    def num_classes(self) -> Optional[int]:
        return self.embedding.num_classes

    @property
    def conditional(self) -> bool:
        # -1 is the Embedding's unconditional sentinel (layers.py guard)
        n = self.embedding.num_classes
        return n is not None and n != -1

    @property
    def sigma_data(self) -> float:
        return self.denoiser.sigma_data

    def setup(self) -> None:
        if self.use_uncertainty:
            # reference: UncertaintyNet(fourier_dim, fourier_dim), edm.py:142-146
            self.u = UncertaintyNet(self.embedding.fourier_dim)

    def __call__(
        self,
        noisy_image: jnp.ndarray,
        sigma: jnp.ndarray,
        class_labels: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        if not self.conditional:
            class_labels = None
        _, emb = self.embedding(sigma, class_labels)
        return self.denoiser(noisy_image, sigma, emb, train=train)

    def denoise_with_aux(
        self,
        noisy_image: jnp.ndarray,
        sigma: jnp.ndarray,
        class_labels: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
    ) -> tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Training forward: returns (denoised, uncertainty or None)."""
        if not self.conditional:
            class_labels = None
        fourier, emb = self.embedding(sigma, class_labels)
        denoised = self.denoiser(noisy_image, sigma, emb, train=train)
        uncertainty = None
        if self.use_uncertainty:
            uncertainty = self.u(fourier).reshape(-1)
        return denoised, uncertainty
