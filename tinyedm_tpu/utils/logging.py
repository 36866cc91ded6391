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

    def log_text(self, key: str, text: str) -> None:
        if self.enabled:
            print(f"[{key}] {text}")

    def close(self) -> None:
        if self._metrics_file is not None:
            self._metrics_file.close()
        if self._wandb is not None:
            self._wandb.finish()
