"""Training callbacks: periodic sample previews + PNG prediction writing.

Functional re-design of the reference callbacks (src/tinyedm/callbacks.py):
each callback is driven by the Trainer (process-0 only — the
``jax.process_index() == 0`` analog of lightning's rank_zero_only) and pulls
what it needs from the trainer handle. Device->host transfer happens once per
batch as a uint8 array; PNG encoding runs on host.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class Callback:
    """Minimal callback protocol (subset of lightning Callback hooks)."""

    def on_train_start(self, trainer) -> None: ...

    def on_train_epoch_end(self, trainer) -> None: ...

    def on_validation_end(self, trainer) -> None: ...

    def on_fit_end(self, trainer) -> None: ...


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2) -> np.ndarray:
    """Tile a batch of HWC uint8 images into one grid image (torchvision
    make_grid equivalent used at callbacks.py:54)."""
    n, h, w, c = images.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    grid = np.zeros(
        (nrows * (h + padding) + padding, ncol * (w + padding) + padding, c),
        dtype=images.dtype,
    )
    for idx in range(n):
        r, cl = divmod(idx, ncol)
        y = r * (h + padding) + padding
        x = cl * (w + padding) + padding
        grid[y : y + h, x : x + w] = images[idx]
    return grid


class GenerateCallback(Callback):
    """Every N epochs: solve the ODE from a fixed noise batch drawn at train
    start, denormalize via the datamodule, and log an image grid
    (reference: callbacks.py:12-58)."""

    def __init__(
        self,
        solver,
        img_shape: tuple[int, int, int],  # (C, H, W) — reference order preserved
        num_samples: int = 8,
        every_n_epochs: int = 5,
        guidance_scale: Optional[float] = None,
    ):
        self.solver = solver
        self.img_shape = tuple(img_shape)
        self.num_samples = num_samples
        self.every_n_epochs = every_n_epochs
        # CFG previews for label-dropout runs (needs a conditional model)
        self.guidance_scale = guidance_scale
        self.x0: Optional[jnp.ndarray] = None
        self.class_labels: Optional[jnp.ndarray] = None

    def on_train_start(self, trainer) -> None:
        if jax.process_index() != 0:
            return
        c, h, w = self.img_shape
        key = jax.random.PRNGKey(trainer.seed ^ 0x5EED)
        self.x0 = jax.random.normal(key, (self.num_samples, h, w, c), jnp.float32)
        if trainer.model.conditional:
            n_cls = trainer.model.num_classes
            self.class_labels = jnp.arange(self.num_samples, dtype=jnp.int32) % n_cls
        else:
            self.class_labels = None

    def on_train_epoch_end(self, trainer) -> None:
        if jax.process_index() != 0 or self.x0 is None:
            return
        if trainer.epoch % self.every_n_epochs != 0:
            return
        xT = trainer.solve(
            self.solver, self.x0, self.class_labels, use_ema=trainer.use_ema,
            guidance_scale=self.guidance_scale,
        )
        images = trainer.datamodule.denormalize(np.asarray(xT))
        grid = make_grid(images)
        trainer.logger.log_image("Generated", grid, step=trainer.epoch)


class LatentsGenerateCallback(Callback):
    """Latent-space preview: solve in latent space, un-normalize with the
    dataset latent stats, VAE-decode, grid, log (reference: callbacks.py:61-123).
    The VAE decoder is a jitted JAX pass (tinyedm_tpu.data.vae)."""

    def __init__(
        self,
        solver,
        img_shape: tuple[int, int, int],
        mean: Sequence[float],
        std: Sequence[float],
        value_range: tuple[float, float] = (0.0, 1.0),
        num_samples_per_class: int = 8,
        num_classes: int = 10,
        every_n_epochs: int = 100,
        vae_name: str = "stabilityai/sd-vae-ft-ema",
        guidance_scale: Optional[float] = None,
    ):
        self.guidance_scale = guidance_scale
        self.solver = solver
        self.img_shape = tuple(img_shape)
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.value_range = value_range
        self.num_samples_per_class = num_samples_per_class
        self.num_classes = num_classes
        self.every_n_epochs = every_n_epochs
        self.vae_name = vae_name
        self.x0 = None
        self.class_labels = None
        self._vae = None

    def on_train_start(self, trainer) -> None:
        if jax.process_index() != 0:
            return
        c, h, w = self.img_shape
        n = self.num_samples_per_class * self.num_classes
        key = jax.random.PRNGKey(trainer.seed ^ 0x1A7E)
        k1, k2 = jax.random.split(key)
        self.x0 = jax.random.normal(k1, (n, h, w, c), jnp.float32)
        labels = jax.random.randint(
            k2, (self.num_classes,), 0, trainer.model.num_classes, dtype=jnp.int32
        )
        self.class_labels = jnp.tile(labels, self.num_samples_per_class)
        try:
            from tinyedm_tpu.data.vae import load_vae

            self._vae = load_vae(self.vae_name)
        except Exception as e:  # VAE weights unavailable (e.g. no network)
            trainer.logger.log_text(
                "warn", f"LatentsGenerateCallback: VAE unavailable ({e}); logging latents"
            )
            self._vae = None

    def on_validation_end(self, trainer) -> None:
        if jax.process_index() != 0 or self.x0 is None:
            return
        if trainer.epoch % self.every_n_epochs != 0:
            return
        xT = trainer.solve(
            self.solver, self.x0, self.class_labels, use_ema=trainer.use_ema,
            guidance_scale=self.guidance_scale,
        )
        lat = np.asarray(xT) * self.std.reshape(1, 1, 1, -1) * 2.0 + self.mean.reshape(
            1, 1, 1, -1
        )
        if self._vae is not None:
            images = np.asarray(self._vae.decode(jnp.asarray(lat)))
            images = np.clip(images, *self.value_range)
            images = (images * 255.0).astype(np.uint8)
        else:
            lo, hi = lat.min(), lat.max()
            vis = (lat[..., :3] - lo) / max(hi - lo, 1e-6)
            images = (vis * 255.0).astype(np.uint8)
        grid = make_grid(images, nrow=self.num_classes)
        trainer.logger.log_image("Generated", grid, step=trainer.epoch)


class PreditionWriter:
    """[typo preserved from the reference public API, callbacks.py:126]

    Writes generated batches as PNGs named by global sample index:
    pred * std * 2 + mean, clamp [0,1], uint8 HWC (callbacks.py:141-156).
    """

    def __init__(self, output_dir: str, write_interval: str, mean: Sequence[float], std: Sequence[float]):
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.write_interval = write_interval
        self.mean = np.asarray(mean, np.float32).reshape(1, 1, 1, -1)
        self.std = np.asarray(std, np.float32).reshape(1, 1, 1, -1)

    def write_batch(self, prediction: np.ndarray, batch_indices: Sequence[int]) -> None:
        from PIL import Image

        images = np.asarray(prediction, np.float32) * self.std * 2.0 + self.mean
        images = np.clip(images, 0.0, 1.0) * 255.0
        images = images.astype(np.uint8)  # NHWC already
        for index, image in zip(batch_indices, images):
            Image.fromarray(image.squeeze()).save(self.output_dir / f"{index}.png")
