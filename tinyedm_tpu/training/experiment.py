"""EDMSpec: the reference-shaped experiment description.

The reference's ``EDM`` LightningModule constructor takes the full training
recipe (src/tinyedm/edm.py:100-118: diffuser, embedding, denoiser, use_ema,
use_uncertainty, steady/rampup steps, lr, betas, ema_length, ...). In this
framework the model is a pure flax module and training is a jitted step, so
that constructor surface becomes a dataclass spec that the config system
instantiates (aliased as target ``tinyedm.EDM``) and ``build()`` turns into
the functional pieces.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from tinyedm_tpu.diffusion.diffuser import Diffuser
from tinyedm_tpu.models.edm import EDM
from tinyedm_tpu.models.layers import Embedding
from tinyedm_tpu.models.unet import Denoiser
from tinyedm_tpu.training.ema import EMAConfig
from tinyedm_tpu.training.train_step import OptimizerConfig


@dataclasses.dataclass
class EDMSpec:
    diffuser: Diffuser
    embedding: Embedding
    denoiser: Denoiser
    use_ema: bool = False
    use_uncertainty: bool = False
    steady_steps: int = 1
    rampup_steps: int = 0
    scheduler_interval: str = "epoch"
    sigma_data: Optional[float] = None
    lr: float = 1e-4
    betas: tuple[float, float] = (0.9, 0.999)
    ema_length: Optional[float] = None
    # Multiple tracked EMA profiles enable post-hoc EMA reconstruction;
    # defaults to (ema_length,) for reference parity.
    ema_lengths: Optional[tuple[float, ...]] = None
    validate_original_weights: bool = False
    every_n_steps: int = 1
    # cpu_offload is accepted for config parity but is a no-op: on TPU the EMA
    # update runs inside the jitted step (SURVEY.md §2.2 row 4).
    cpu_offload: bool = False
    accum_steps: int = 1
    # wandb.watch(model, log="all") analog (reference experiments/train.py:28):
    # emit global grad/param L2 norms from the jitted step. Wired from the
    # config's `wandb_watch:` block by the training CLI.
    log_norms: bool = False
    # wandb_watch.per_layer: additionally emit grad_norm/<module.child> and
    # param_norm/<module.child> per depth-2 param group (pre-clip grads)
    log_norms_per_layer: bool = False
    # Optional global-norm gradient clipping (None = off, reference parity)
    grad_clip_norm: Optional[float] = None
    # CFG training (beyond the reference): probability of replacing a class
    # label with the null label per sample (diffusion/guidance.py). 0 = off.
    label_dropout: float = 0.0
    # Which tracked EMA profile validation/checkpoint-selection evaluates
    # (generalizes the reference's single-profile swap, ema.py:83-106).
    val_ema_index: int = 0

    def __post_init__(self) -> None:
        if self.use_ema and self.ema_length is None and not self.ema_lengths:
            raise ValueError("ema_length must be specified when use_ema is True.")
        if self.use_ema:
            n_profiles = len(self.ema_lengths or (self.ema_length,))
            if not 0 <= self.val_ema_index < n_profiles:
                raise ValueError(
                    f"val_ema_index={self.val_ema_index} out of range for "
                    f"{n_profiles} tracked EMA profile(s)"
                )
        if not 0.0 <= self.label_dropout < 1.0:
            raise ValueError(f"label_dropout must be in [0, 1), got {self.label_dropout}")
        if self.label_dropout > 0.0 and not self.conditional:
            raise ValueError("label_dropout needs a conditional model (num_classes set)")
        if self.sigma_data is not None and self.sigma_data != self.denoiser.sigma_data:
            # keep one source of truth, like the reference's
            # `sigma_data or denoiser.sigma_data` (edm.py:147)
            object.__setattr__(
                self, "denoiser", self.denoiser.clone(sigma_data=self.sigma_data)
            )

    @property
    def conditional(self) -> bool:
        # -1 is the Embedding's explicit unconditional sentinel
        # (models/layers.py:287 raises if labels arrive with it) — treating
        # it as conditional here would feed labels into that guard at trace
        # time instead of training unconditionally
        n = self.embedding.num_classes
        return n is not None and n != -1

    def build_model(self, inference_fast: bool = False) -> EDM:
        """``inference_fast`` swaps in the fused Pallas attention kernel for
        sampling/eval paths on TPU — measured 1.6-1.9x faster than the XLA
        attention at 256-4096 tokens, parameter-compatible (the flag changes
        no parameters). The kernel has a Pallas backward too; training enables
        it via ``denoiser.use_pallas_attention`` in configs whose resolutions
        reach the >=1024-token dispatch threshold (e.g. imagenet512)."""
        denoiser = self.denoiser
        if inference_fast:
            import jax

            if jax.default_backend() == "tpu":
                denoiser = denoiser.clone(use_pallas_attention=True)
        return EDM(
            embedding=self.embedding,
            denoiser=denoiser,
            use_uncertainty=self.use_uncertainty,
        )

    def build_optimizer_config(self) -> OptimizerConfig:
        return OptimizerConfig(
            lr=self.lr,
            betas=tuple(self.betas),
            rampup_steps=self.rampup_steps,
            steady_steps=self.steady_steps,
            scheduler_interval=self.scheduler_interval,
            accum_steps=self.accum_steps,
            log_norms=self.log_norms,
            log_norms_per_layer=self.log_norms_per_layer,
            grad_clip_norm=self.grad_clip_norm,
            label_dropout=self.label_dropout,
        )

    def build_ema_config(self) -> Optional[EMAConfig]:
        if not self.use_ema:
            return None
        sigma_rels = self.ema_lengths or (self.ema_length,)
        return EMAConfig(
            sigma_rels=tuple(sigma_rels), every_n_steps=self.every_n_steps
        )
