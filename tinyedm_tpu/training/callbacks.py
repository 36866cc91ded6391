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
            # clamp to value_range then map it onto [0,1] for the uint8
            # grid. The reference default (0,1) clamps the decoder's
            # ~[-1,1] output the same way (callbacks.py:119-120 clamps and
            # logs without rescale) — identity here, so parity holds; but
            # a user-set range like (-1,1) must be rescaled or the uint8
            # cast wraps negatives into garbage pixels
            lo, hi = self.value_range
            images = np.clip(images, lo, hi)
            images = (images - lo) / max(hi - lo, 1e-12)
            images = (images * 255.0).astype(np.uint8)
        else:
            lo, hi = lat.min(), lat.max()
            vis = (lat[..., :3] - lo) / max(hi - lo, 1e-6)
            images = (vis * 255.0).astype(np.uint8)
        grid = make_grid(images, nrow=self.num_classes)
        trainer.logger.log_image("Generated", grid, step=trainer.epoch)


class FIDCallback(Callback):
    """Training-time sample-quality tracking: every N epochs, sample
    ``num_samples`` images with the (EMA) weights, featurize, and log
    FID — and optionally KID — against a precomputed stats file
    (``experiments/eval_fid.py stats``).

    Beyond the reference (it ships no FID code, SURVEY.md §7.3): checkpoint
    selection there is by val_loss only, while the EDM2 workflow selects by
    sample quality. The logged ``fid``/``kid`` series make that a config
    change: point the checkpoint monitor at ``fid`` with mode=min.

    Image-space models only (latent models would need a VAE decode per eval;
    use the post-training ``eval_fid.py`` protocol there). Samples are drawn
    from fresh noise each eval (deterministic per epoch) so the metric is an
    independent estimate, not a fixed-noise trajectory."""

    def __init__(
        self,
        solver,
        img_shape: tuple[int, int, int],  # (C, H, W) — reference order
        stats_path: str,
        num_samples: int = 1024,
        batch_size: int = 128,
        every_n_epochs: int = 100,
        features: Optional[str] = None,  # resolve_feature_fn spec
        kid: bool = False,
        kid_subset_size: int = 1000,
        kid_subsets: int = 100,
        ema_index: int = 0,
        guidance_scale: Optional[float] = None,
    ):
        self.solver = solver
        self.img_shape = tuple(img_shape)
        self.stats_path = stats_path
        self.num_samples = num_samples
        self.batch_size = batch_size
        self.every_n_epochs = every_n_epochs
        self.features = features
        self.kid = kid
        self.kid_subset_size = kid_subset_size
        self.kid_subsets = kid_subsets
        self.ema_index = ema_index
        self.guidance_scale = guidance_scale
        self._ref = None  # (mu2, sigma2, ref_feats) once loaded
        self._feature_fn = None
        self._kind = None

    def on_train_start(self, trainer) -> None:
        # fail loudly at fit start, not at the first (possibly hours-away)
        # eval — both for the stats file AND the feature extractor (a missing
        # Inception weight file raises here instead of silently degrading).
        # Deliberately NOT guarded on process_index: a rank-0-only raise
        # would leave the other hosts entering the train loop and hanging in
        # the first collective. All hosts validate (stats/weight files must
        # be readable on every host, the usual multi-controller contract) so
        # a bad config kills the whole job cleanly. Scoring itself stays
        # rank-0-only (on_train_epoch_end).
        from tinyedm_tpu.utils.fid import load_features, load_stats, resolve_feature_fn

        self._feature_fn, self._kind = resolve_feature_fn(self.features)
        mu2, s2 = load_stats(self.stats_path)
        ref_feats = load_features(self.stats_path)
        if self.kid and ref_feats is None:
            raise ValueError(
                f"{self.stats_path} has no stored feature rows - regenerate "
                "it with `eval_fid.py stats --kid-features N` to track KID"
            )
        self._ref = (mu2, s2, ref_feats)

    def _sample_batches(self, trainer):
        """Yield denormalized uint8 sample batches (device solve per batch)."""
        c, h, w = self.img_shape
        n_cls = trainer.model.num_classes if trainer.model.conditional else None
        key = jax.random.PRNGKey(trainer.seed ^ 0xF1D)
        key = jax.random.fold_in(key, trainer.epoch)
        done = 0
        while done < self.num_samples:
            n = min(self.batch_size, self.num_samples - done)
            key, sub = jax.random.split(key)
            # fixed batch shape for the jit cache; trim the tail after solve
            x0 = jax.random.normal(sub, (self.batch_size, h, w, c), jnp.float32)
            labels = (
                (jnp.arange(done, done + self.batch_size, dtype=jnp.int32) % n_cls)
                if n_cls
                else None
            )
            xT = trainer.solve(
                self.solver,
                x0,
                labels,
                use_ema=trainer.use_ema,
                ema_index=self.ema_index,
                guidance_scale=self.guidance_scale,
            )
            yield trainer.datamodule.denormalize(np.asarray(xT[:n]))
            done += n

    def on_train_epoch_end(self, trainer) -> None:
        if jax.process_index() != 0 or self._ref is None:
            return
        # (epoch+1) cadence — the same convention as check_val_every_n_epoch
        # and ckpt_every_n_epochs, so an every_n_epochs that divides the
        # checkpoint cadence deposits fid/kid into the SAME epoch's save
        # (epoch-0-based `epoch % N` never coincides with `(epoch+1) % M`
        # saves at equal cadences and the monitored key would always miss)
        if (trainer.epoch + 1) % self.every_n_epochs != 0:
            return
        from tinyedm_tpu.utils.fid import (
            compute_stats,
            compute_stats_and_features,
            frechet_distance,
            kid_score,
        )

        mu2, s2, ref_feats = self._ref
        if self.kid:
            mu1, s1, feats = compute_stats_and_features(
                self._sample_batches(trainer),
                self._feature_fn,
                max_features=max(self.kid_subset_size, len(ref_feats)),
            )
        else:
            mu1, s1 = compute_stats(self._sample_batches(trainer), self._feature_fn)
        metrics = {"fid": frechet_distance(mu1, s1, mu2, s2)}
        if self.kid:
            metrics["kid"] = kid_score(
                feats,
                ref_feats,
                subset_size=self.kid_subset_size,
                num_subsets=self.kid_subsets,
            )
        trainer.logger.log_metrics(metrics, step=trainer.global_step)
        # make fid/kid available to top-k checkpoint selection
        # (checkpoint_callback.monitor: fid)
        trainer.extra_ckpt_metrics.update(metrics)


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

        prediction = np.asarray(prediction)
        if prediction.dtype == np.uint8:
            # already denormalized on device (generate.py maps the solver
            # output through the same formula in the jitted tail so only
            # uint8 crosses the device->host boundary)
            images = prediction
        else:
            images = prediction.astype(np.float32) * self.std * 2.0 + self.mean
            images = np.clip(images, 0.0, 1.0) * 255.0
            images = images.astype(np.uint8)  # NHWC already
        for index, image in zip(batch_indices, images):
            Image.fromarray(image.squeeze()).save(self.output_dir / f"{index}.png")
