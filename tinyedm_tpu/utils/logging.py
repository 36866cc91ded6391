"""Metric/image logging: JSONL + PNG on disk, optional wandb passthrough.

Replaces the reference's WandbLogger wiring (experiments/train.py:21-28).
Process-0 only (the jax.process_index() guard lives in the Trainer /
callbacks). wandb is used when importable AND explicitly enabled — this
environment has no egress, so the default sink is local files that a later
wandb sync can upload.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Mapping, Optional


class MetricLogger:
    def __init__(self, out_dir: str | Path, use_wandb: bool = False, wandb_kwargs: Optional[dict] = None):
        import jax

        # rank-zero-only side effects (reference: lightning rank_zero_only,
        # callbacks.py:27) — non-zero processes get a silent no-op logger
        self.enabled = jax.process_index() == 0
        self.out_dir = Path(out_dir)
        self._t0 = time.time()
        self._wandb = None
        # WandbLogger(log_model=True) analog (reference conf/cifar10.yaml:86):
        # upload saved checkpoints as wandb artifacts. Popped from the kwargs
        # either way (it is not a wandb.init argument); armed only when wandb
        # itself is enabled.
        log_model = bool(wandb_kwargs.pop("log_model", False)) if wandb_kwargs else False
        self._log_model = False  # armed below only once wandb.init succeeds
        if not self.enabled:
            self._metrics_file = None
            return
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self._metrics_file = open(self.out_dir / "metrics.jsonl", "a", buffering=1)
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(dir=str(self.out_dir), **(wandb_kwargs or {}))
                # only now: a live run exists for artifact uploads. If init
                # failed, staying disarmed keeps checkpoint saves async —
                # the trainer's pre-upload ckpt.wait() would otherwise block
                # every save for a guaranteed no-op upload.
                self._log_model = log_model
            except Exception as e:  # no wandb / no network: local files only
                print(f"[logger] wandb unavailable ({e}); logging to {self.out_dir}")
                self._wandb = None

    def log_metrics(self, metrics: Mapping[str, Any], step: int) -> None:
        if not self.enabled:
            return
        row = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        row.update({k: float(v) for k, v in metrics.items()})
        self._metrics_file.write(json.dumps(row) + "\n")
        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=int(step))

    def log_image(self, key: str, image, step: int) -> None:
        if not self.enabled:
            return
        from PIL import Image
        import numpy as np

        arr = np.asarray(image)
        img_dir = self.out_dir / "images"
        img_dir.mkdir(exist_ok=True)
        Image.fromarray(arr.squeeze()).save(img_dir / f"{key}_{step:07d}.png")
        if self._wandb is not None:
            self._wandb.log({key: self._wandb.Image(arr)}, step=int(step))

    def log_checkpoint(self, path: str | Path, step: int) -> None:
        """Upload a saved checkpoint directory as a wandb artifact — the
        WandbLogger(log_model=True) analog (reference conf/cifar10.yaml:87,
        lightning uploads ModelCheckpoint files). No-op unless wandb is
        active AND wandb_logger.log_model is set."""
        if not self.enabled or self._wandb is None or not self._log_model:
            return
        try:
            art = self._wandb.Artifact(f"model-{self._wandb.run.id}", type="model")
            art.add_dir(str(path))
            self._wandb.log_artifact(art, aliases=[f"step-{int(step)}"])
        except Exception as e:  # artifact upload is best-effort
            print(f"[logger] checkpoint artifact upload failed ({e})")

    def log_text(self, key: str, text: str) -> None:
        if self.enabled:
            print(f"[{key}] {text}")

    def close(self) -> None:
        if self._metrics_file is not None:
            self._metrics_file.close()
        if self._wandb is not None:
            self._wandb.finish()
