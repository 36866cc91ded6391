"""Utility-layer tests: logging sinks, profiling helpers, solver dtype guard."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyedm_tpu.utils.logging import MetricLogger
from tinyedm_tpu.utils.profiling import StepTimer, device_memory_stats


class TestMetricLogger:
    def test_jsonl_and_images(self, tmp_path):
        logger = MetricLogger(tmp_path)
        logger.log_metrics({"loss": 1.5, "lr": jnp.asarray(0.1)}, step=3)
        logger.log_metrics({"loss": 1.2}, step=4)
        logger.log_image("preview", np.zeros((8, 8, 3), np.uint8), step=3)
        logger.close()
        rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
        assert rows[0]["step"] == 3 and rows[0]["loss"] == 1.5
        assert abs(rows[0]["lr"] - 0.1) < 1e-6
        assert (tmp_path / "images" / "preview_0000003.png").exists()

    def test_wandb_unavailable_falls_back(self, tmp_path, capsys):
        logger = MetricLogger(tmp_path, use_wandb=True, wandb_kwargs={"project": "x"})
        # wandb isn't installed here -> local files only, no crash
        logger.log_metrics({"a": 1.0}, step=0)
        logger.close()
        assert (tmp_path / "metrics.jsonl").exists()

    def test_log_model_flag_parsed_and_checkpoint_noop(self, tmp_path):
        # log_model rides in wandb_kwargs (reference WandbLogger log_model,
        # conf/cifar10.yaml:86) and must NOT reach wandb.init
        kw = {"project": "x", "log_model": True}
        logger = MetricLogger(tmp_path, use_wandb=True, wandb_kwargs=kw)
        # wandb.init fails here (no wandb) -> the flag must DISARM, or every
        # checkpoint save would block on ckpt.wait() for a no-op upload
        assert logger._log_model is False
        assert "log_model" not in kw  # popped before reaching wandb.init
        # without a live wandb run, uploading is a silent no-op
        logger.log_checkpoint(tmp_path, step=7)
        logger.close()
        plain = MetricLogger(tmp_path)
        assert plain._log_model is False
        plain.log_checkpoint(tmp_path, step=7)
        plain.close()


class TestStepTimer:
    def test_rolling_mean(self):
        t = StepTimer(window=3)
        for _ in range(5):
            t.mark()
        assert t.mean_step_time >= 0.0
        assert t.steps_per_sec() >= 0.0

    def test_sync_value(self):
        t = StepTimer()
        v = t.sync_value(jnp.asarray(2.5))
        assert v == 2.5


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert len(stats) == len(jax.devices())


def test_solver_float64_requires_x64():
    from tinyedm_tpu.diffusion.solver import DeterministicSolver

    s = DeterministicSolver(num_steps=4, dtype="float64")
    if not jax.config.jax_enable_x64:
        with pytest.raises(ValueError, match="jax_enable_x64"):
            _ = s.jnp_dtype
