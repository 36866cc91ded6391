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


class TestCheckpointMonitor:
    def _state(self, step):
        from tinyedm_tpu.training.state import TrainState

        return TrainState(
            step=jnp.asarray(step, jnp.int32),
            params={"w": np.ones(2, np.float32)},
            constants={"c": np.zeros(1, np.float32)},
            opt_state={"m": np.zeros(2, np.float32)},
            ema=({"w": np.ones(2, np.float32)},),
        )

    def test_missing_monitor_key_ranks_worst(self, tmp_path):
        """Top-k by a custom monitor (e.g. fid): a save whose metrics LACK
        the monitored key must rank worst, not best-at-0.0 — otherwise a
        fid-monitored run pins its top-k slots to metric-less checkpoints."""
        from tinyedm_tpu.training.checkpoint import CheckpointManager

        mngr = CheckpointManager(
            tmp_path / "ckpt", max_to_keep=1, monitor="fid", mode="min",
            save_last=False, async_save=False,
        )
        mngr.save(1, self._state(1), metrics={"fid": 5.0})
        mngr.save(2, self._state(2), metrics={"val_loss": 0.01})  # no fid
        mngr.wait()
        assert mngr.best_step == 1
        mngr.close()

    def test_mode_max_monitor(self, tmp_path):
        from tinyedm_tpu.training.checkpoint import CheckpointManager

        mngr = CheckpointManager(
            tmp_path / "ckpt", max_to_keep=2, monitor="score", mode="max",
            save_last=False, async_save=False,
        )
        mngr.save(1, self._state(1), metrics={"score": 1.0})
        mngr.save(2, self._state(2), metrics={"score": 3.0})
        mngr.save(3, self._state(3), metrics={})  # missing -> worst
        mngr.wait()
        assert mngr.best_step == 2
        mngr.close()
