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

    def test_missing_monitor_key_demoted_not_pruned_first(self, tmp_path):
        """A NEWEST save whose metrics lack the monitored key must survive:
        it is demoted to the protected metric-less class instead of entering
        the ranking at worst (where top-k would prune it immediately —
        deleting the most recent resume point)."""
        from tinyedm_tpu.training.checkpoint import CheckpointManager

        mngr = CheckpointManager(
            tmp_path / "ckpt", max_to_keep=2, monitor="fid", mode="min",
            save_last=True, async_save=False,
        )
        for s, fid in ((1, 1.0), (2, 2.0), (3, 3.0)):
            mngr.save(s, self._state(s), metrics={"fid": fid})
        mngr.save(4, self._state(4), metrics={"val_loss": 0.1})  # no fid
        mngr.wait()
        kept = {int(p.name) for p in (tmp_path / "ckpt").iterdir() if p.name.isdigit()}
        assert 4 in kept, "newest (metric-less for this monitor) save was pruned"
        assert mngr.latest_step == 4
        assert mngr.best_step == 1
        mngr.close()

    def test_metricless_class_is_bounded_not_immortal(self, tmp_path):
        """orbax exempts metric-less saves from max_to_keep entirely
        (keep-ALL); the manager bounds that class to keep_last so cadence
        saves between validations cannot fill the disk, while top-k
        metric-bearing checkpoints are untouched."""
        from tinyedm_tpu.training.checkpoint import CheckpointManager

        mngr = CheckpointManager(
            tmp_path / "ckpt", max_to_keep=2, monitor="val_loss", mode="min",
            save_last=True, async_save=False, keep_last=2,
        )
        mngr.save(1, self._state(1), metrics={"val_loss": 1.0})
        mngr.save(2, self._state(2), metrics={"val_loss": 0.5})
        for s in (3, 4, 5, 6):  # metric-less cadence saves
            mngr.save(s, self._state(s), metrics=None)
        mngr.wait()
        kept = {int(p.name) for p in (tmp_path / "ckpt").iterdir() if p.name.isdigit()}
        assert {1, 2} <= kept  # top-k by val_loss
        assert {5, 6} <= kept  # newest keep_last metric-less
        assert 3 not in kept and 4 not in kept
        mngr.close()

    def test_monitorless_manager_keeps_all(self, tmp_path):
        """monitor=None managers (e.g. the soak's keep-all checkpointing for
        eval_fid sweep) must never prune: every save is metric-less by
        design there."""
        from tinyedm_tpu.training.checkpoint import CheckpointManager

        mngr = CheckpointManager(
            tmp_path / "ckpt", max_to_keep=None, monitor=None,
            save_last=True, async_save=False,
        )
        for s in range(1, 6):
            mngr.save(s, self._state(s))
        mngr.wait()
        kept = {int(p.name) for p in (tmp_path / "ckpt").iterdir() if p.name.isdigit()}
        assert kept == {1, 2, 3, 4, 5}
        mngr.close()


def test_sigma_rel_zero_rejected_with_value_error():
    """0.0 passes the reference's advertised bound but is outside the cubic's
    domain (sigma_rel**-2) — must raise ValueError, not ZeroDivisionError."""
    from tinyedm_tpu.training.ema import sigma_rel_to_gamma

    with pytest.raises(ValueError, match="sigma_rel"):
        sigma_rel_to_gamma(0.0)
    with pytest.raises(ValueError):
        sigma_rel_to_gamma(-0.1)
