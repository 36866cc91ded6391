"""FID math tests + post-hoc EMA end-to-end reconstruction test."""

import numpy as np
import pytest

from tinyedm_tpu.utils.fid import (
    compute_stats,
    fid_between_dirs,
    frechet_distance,
    load_stats,
    png_dir_batches,
    save_stats,
)


class TestFID:
    def test_identical_distributions_zero(self):
        rng = np.random.default_rng(0)
        f = rng.standard_normal((500, 16))
        mu, s = compute_stats(f)
        assert frechet_distance(mu, s, mu, s) == pytest.approx(0.0, abs=1e-8)

    def test_mean_shift_closed_form(self):
        # same covariance, means differ by d: FID = |d|^2
        rng = np.random.default_rng(1)
        f1 = rng.standard_normal((20000, 8))
        f2 = f1 + np.asarray([2.0] + [0.0] * 7)
        mu1, s1 = compute_stats(f1)
        mu2, s2 = compute_stats(f2)
        assert frechet_distance(mu1, s1, mu2, s2) == pytest.approx(4.0, rel=1e-3)

    def test_scale_closed_form(self):
        # 1-D gaussians N(0, a^2), N(0, b^2): FID = (a-b)^2
        rng = np.random.default_rng(2)
        f1 = rng.standard_normal((200000, 1)) * 1.0
        f2 = rng.standard_normal((200000, 1)) * 3.0
        mu1, s1 = compute_stats(f1)
        mu2, s2 = compute_stats(f2)
        assert frechet_distance(mu1, s1, mu2, s2) == pytest.approx(4.0, rel=2e-2)

    def test_streaming_matches_full(self):
        rng = np.random.default_rng(3)
        f = rng.standard_normal((1000, 4))
        mu_a, s_a = compute_stats(f)
        mu_b, s_b = compute_stats([f[:300], f[300:650], f[650:]])
        np.testing.assert_allclose(mu_a, mu_b, rtol=1e-10)
        np.testing.assert_allclose(s_a, s_b, rtol=1e-10)

    def test_stats_io(self, tmp_path):
        mu, s = np.ones(3), np.eye(3)
        save_stats(tmp_path / "s.npz", mu, s)
        mu2, s2 = load_stats(tmp_path / "s.npz")
        np.testing.assert_array_equal(mu, mu2)

    def test_dir_pipeline_with_fake_features(self, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(4)
        for name, offset in (("a", 0), ("b", 64)):
            d = tmp_path / name
            d.mkdir()
            for i in range(8):
                arr = (rng.integers(0, 128, (8, 8, 3)) + offset).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")

        fake = lambda imgs: imgs.reshape(len(imgs), -1).astype(np.float64)
        same = fid_between_dirs(tmp_path / "a", tmp_path / "a", fake, batch_size=4)
        diff = fid_between_dirs(tmp_path / "a", tmp_path / "b", fake, batch_size=4)
        assert same == pytest.approx(0.0, abs=0.2)  # 8 samples: rank noise
        assert diff > 100  # offset by 64 per pixel


class TestPosthocEMAEndToEnd:
    def test_reconstruct_cli(self, tmp_path):
        """Train briefly with two EMA profiles, reconstruct a third sigma_rel,
        and load the result for generation."""
        import jax
        import jax.numpy as jnp

        from tests.test_e2e import make_trainer, tiny_spec
        from tinyedm_tpu.posthoc_ema import reconstruct
        from tinyedm_tpu.training.checkpoint import load_edm_from_checkpoint

        spec = tiny_spec()
        spec = type(spec)(
            **{
                **{f.name: getattr(spec, f.name) for f in spec.__dataclass_fields__.values()},
                "ema_lengths": (0.05, 0.13),
            }
        )
        trainer = make_trainer(tmp_path, spec, max_epochs=1)
        trainer.fit()
        trainer.ckpt.wait()
        assert len(trainer.state.ema) == 2

        out = tmp_path / "posthoc"
        reconstruct(
            str(tmp_path / "run" / "checkpoints"),
            target_sigma_rel=0.10,
            out_dir=str(out),
        )
        spec2, model, variables, state = load_edm_from_checkpoint(out, load_ema=True)
        x = jnp.zeros((2, 8, 8, 1))
        y = model.apply(variables, x, jnp.ones((2,)), jnp.asarray([0, 1]))
        assert np.isfinite(np.asarray(y)).all()


class TestPosthocMultiCheckpoint:
    def test_combine_across_steps(self, tmp_path):
        """--steps with several checkpoints: snapshots from every (step,
        gamma) pair are combined."""
        import jax.numpy as jnp

        from tests.test_e2e import make_trainer, tiny_spec
        from tinyedm_tpu.posthoc_ema import reconstruct
        from tinyedm_tpu.training.checkpoint import load_edm_from_checkpoint

        spec = tiny_spec()  # single EMA profile, ckpt every epoch
        trainer = make_trainer(tmp_path, spec, max_epochs=2)
        trainer.fit()
        trainer.ckpt.wait()
        steps = sorted(
            int(p.name) for p in (tmp_path / "run" / "checkpoints").iterdir()
            if p.name.isdigit()
        )
        assert len(steps) >= 2
        reconstruct(
            str(tmp_path / "run" / "checkpoints"),
            target_sigma_rel=0.10,
            out_dir=str(tmp_path / "posthoc_multi"),
            steps=steps[:2],
        )
        _, model, variables, state = load_edm_from_checkpoint(
            tmp_path / "posthoc_multi", load_ema=True
        )
        x = jnp.zeros((2, 8, 8, 1))
        y = model.apply(variables, x, jnp.ones((2,)), jnp.asarray([0, 1]))
        assert np.isfinite(np.asarray(y)).all()


class TestEvalFidCLI:
    def test_stats_and_score(self, tmp_path):
        """Drive the eval_fid CLI: dataset stats from synthetic CIFAR files,
        then score an existing sample directory with --skip_generate."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "experiments"))
        import eval_fid

        from tests.test_datamodules import cifar_dir  # fixture fn, reuse writer
        # build synthetic cifar files inline (fixture needs pytest wiring)
        import pickle
        rng = np.random.default_rng(0)
        base = tmp_path / "cifar10" / "cifar-10-batches-py"
        base.mkdir(parents=True)
        for i in range(1, 6):
            data = rng.integers(0, 256, (20, 3 * 32 * 32), dtype=np.uint8)
            with open(base / f"data_batch_{i}", "wb") as f:
                pickle.dump({b"data": data, b"labels": list(rng.integers(0, 10, 20))}, f)
        with open(base / "test_batch", "wb") as f:
            pickle.dump({b"data": data, b"labels": list(rng.integers(0, 10, 20))}, f)

        stats = tmp_path / "stats.npz"
        eval_fid.main([
            "stats", "--data-dir", str(tmp_path / "cifar10"),
            "--out", str(stats), "--features", "tests.fake_features",
            "--batch-size", "32",
        ])
        assert stats.exists()

        # sample dir = the same distribution -> small FID
        from PIL import Image
        sdir = tmp_path / "samples"
        sdir.mkdir()
        imgs = rng.integers(0, 256, (40, 32, 32, 3), dtype=np.uint8)
        for i, im in enumerate(imgs):
            Image.fromarray(im).save(sdir / f"{i}.png")
        import io
        from contextlib import redirect_stdout
        buf = io.StringIO()
        with redirect_stdout(buf):
            eval_fid.main([
                "score", "--ckpt_path", "unused", "--stats", str(stats),
                "--sample_dir", str(sdir), "--skip_generate",
                "--features", "tests.fake_features", "--batch_size", "32",
            ])
        out = buf.getvalue()
        assert "FID:" in out
        fid_same = float(out.strip().split("FID:")[1])

        # a shifted distribution must score much worse than the matched one
        # (absolute values are noisy at 40 samples; the ordering is the test)
        sdir2 = tmp_path / "samples_shifted"
        sdir2.mkdir()
        for i, im in enumerate(imgs):
            Image.fromarray(np.clip(im.astype(int) + 100, 0, 255).astype(np.uint8)).save(
                sdir2 / f"{i}.png"
            )
        buf2 = io.StringIO()
        with redirect_stdout(buf2):
            eval_fid.main([
                "score", "--ckpt_path", "unused", "--stats", str(stats),
                "--sample_dir", str(sdir2), "--skip_generate",
                "--features", "tests.fake_features", "--batch_size", "32",
            ])
        fid_shifted = float(buf2.getvalue().strip().split("FID:")[1])
        assert fid_same < fid_shifted / 5, (fid_same, fid_shifted)
