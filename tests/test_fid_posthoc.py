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


class TestKID:
    """Kernel Inception Distance (utils/fid.py::kid_score) — unbiased MMD^2
    with the polynomial kernel, the standard small-sample complement to FID."""

    def test_matches_naive_double_loop(self):
        """One full-set subset (m = n, permutation-invariant kernel sums)
        must equal the textbook O(n^2) unbiased estimator computed directly."""
        rng = np.random.default_rng(0)
        x = rng.standard_normal((40, 6))
        y = rng.standard_normal((40, 6)) + 0.5
        from tinyedm_tpu.utils.fid import kid_score

        got = kid_score(x, y, subset_size=40, num_subsets=1)
        d = x.shape[1]
        k = lambda a, b: (a @ b / d + 1.0) ** 3
        m = len(x)
        sxx = sum(k(x[i], x[j]) for i in range(m) for j in range(m) if i != j)
        syy = sum(k(y[i], y[j]) for i in range(m) for j in range(m) if i != j)
        sxy = sum(k(x[i], y[j]) for i in range(m) for j in range(m))
        want = sxx / (m * (m - 1)) + syy / (m * (m - 1)) - 2.0 * sxy / m**2
        assert got == pytest.approx(want, rel=1e-12)

    def test_same_distribution_near_zero_and_ordering(self):
        rng = np.random.default_rng(1)
        a1 = rng.standard_normal((800, 8))
        a2 = rng.standard_normal((800, 8))
        b = rng.standard_normal((800, 8)) + 1.0
        from tinyedm_tpu.utils.fid import kid_score

        same = kid_score(a1, a2, subset_size=200, num_subsets=20)
        diff = kid_score(a1, b, subset_size=200, num_subsets=20)
        # unbiased: same-distribution estimate straddles 0
        assert abs(same) < 0.05
        assert diff > 10 * max(same, 0.0) and diff > 0.5

    def test_stats_and_features_single_pass(self):
        """compute_stats_and_features must reproduce compute_stats' moments
        exactly and cap the reservoir at max_features rows drawn from the
        input."""
        rng = np.random.default_rng(2)
        f = rng.standard_normal((500, 5)).astype(np.float32)
        from tinyedm_tpu.utils.fid import compute_stats_and_features

        mu_a, s_a = compute_stats([f[:200], f[200:]])
        mu_b, s_b, feats = compute_stats_and_features(
            [f[:200], f[200:]], max_features=64
        )
        np.testing.assert_allclose(mu_a, mu_b, rtol=1e-12)
        np.testing.assert_allclose(s_a, s_b, rtol=1e-12)
        assert feats.shape == (64, 5)
        # every reservoir row is a row of the input
        matches = (feats[:, None, :] == f[None, :, :]).all(-1).any(-1)
        assert matches.all()

    def test_features_io_roundtrip_and_absent(self, tmp_path):
        from tinyedm_tpu.utils.fid import load_features

        mu, s = np.ones(3), np.eye(3)
        feats = np.arange(12, dtype=np.float32).reshape(4, 3)
        save_stats(tmp_path / "with.npz", mu, s, features=feats)
        save_stats(tmp_path / "without.npz", mu, s)
        np.testing.assert_array_equal(load_features(tmp_path / "with.npz"), feats)
        assert load_features(tmp_path / "without.npz") is None

    def test_cli_score_kid(self, tmp_path):
        """eval_fid score --kid: stats stores feature rows, score prints a KID
        line, and the shifted sample dir orders worse than the matched one."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "experiments"))
        import io
        import pickle
        from contextlib import redirect_stdout

        import eval_fid
        from PIL import Image

        rng = np.random.default_rng(3)
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
            "stats", "--data-dir", str(tmp_path / "cifar10"), "--out", str(stats),
            "--features", "tests.fake_features", "--batch-size", "32",
            "--kid-features", "80",
        ])
        from tinyedm_tpu.utils.fid import load_features

        assert load_features(stats) is not None

        imgs = rng.integers(0, 256, (40, 32, 32, 3), dtype=np.uint8)
        kids = {}
        for name, off in (("same", 0), ("shifted", 100)):
            sdir = tmp_path / name
            sdir.mkdir()
            for i, im in enumerate(imgs):
                arr = np.clip(im.astype(int) + off, 0, 255).astype(np.uint8)
                Image.fromarray(arr).save(sdir / f"{i}.png")
            buf = io.StringIO()
            with redirect_stdout(buf):
                eval_fid.main([
                    "score", "--ckpt_path", "unused", "--stats", str(stats),
                    "--sample_dir", str(sdir), "--skip_generate",
                    "--features", "tests.fake_features", "--batch_size", "32",
                    "--kid", "--kid_subset_size", "40", "--kid_subsets", "10",
                ])
            out = buf.getvalue()
            assert "KID[tests.fake_features]:" in out
            kid_line = [l for l in out.splitlines() if l.startswith("KID")][0]
            kids[name] = float(kid_line.split(":")[1].split("(")[0])
        assert kids["same"] < kids["shifted"] / 5, kids

    def test_cli_score_kid_requires_features(self, tmp_path):
        """A stats file written without feature rows must fail loudly."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "experiments"))
        import eval_fid

        save_stats(tmp_path / "s.npz", np.ones(3), np.eye(3))
        with pytest.raises(SystemExit, match="kid-features"):
            eval_fid.main([
                "score", "--ckpt_path", "unused", "--stats", str(tmp_path / "s.npz"),
                "--sample_dir", str(tmp_path), "--skip_generate", "--kid",
                "--features", "tests.fake_features",
            ])


class TestPosthocEMAEndToEnd:
    @pytest.mark.slow
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
    @pytest.mark.slow
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
        assert "FID[tests.fake_features]:" in out
        fid_same = float(out.strip().split("]:")[-1])

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
        fid_shifted = float(buf2.getvalue().strip().split("]:")[-1])
        assert fid_same < fid_shifted / 5, (fid_same, fid_shifted)


class TestInceptionPort:
    @pytest.mark.slow
    def test_flax_inception_matches_converted_random_torch_weights(self):
        """Build a random torchvision-format state dict, convert it, and
        check the flax InceptionV3Pool3 runs and produces (B, 2048) features
        that respond to the weights (not just shapes)."""
        import jax
        import jax.numpy as jnp

        from tinyedm_tpu.utils.inception import (
            InceptionV3Pool3,
            convert_torch_inception,
            preprocess_uint8,
        )

        rng = np.random.default_rng(0)
        sd = {}

        def add(prefix, cin, cout, kh, kw):
            sd[f"{prefix}.conv.weight"] = rng.standard_normal((cout, cin, kh, kw)).astype(np.float32) * 0.05
            sd[f"{prefix}.bn.weight"] = np.ones(cout, np.float32)
            sd[f"{prefix}.bn.bias"] = np.zeros(cout, np.float32)
            sd[f"{prefix}.bn.running_mean"] = np.zeros(cout, np.float32)
            sd[f"{prefix}.bn.running_var"] = np.ones(cout, np.float32)

        # stem
        add("Conv2d_1a_3x3", 3, 32, 3, 3); add("Conv2d_2a_3x3", 32, 32, 3, 3)
        add("Conv2d_2b_3x3", 32, 64, 3, 3); add("Conv2d_3b_1x1", 64, 80, 1, 1)
        add("Conv2d_4a_3x3", 80, 192, 3, 3)

        def inception_a(name, cin, pool):
            add(f"{name}.branch1x1", cin, 64, 1, 1)
            add(f"{name}.branch5x5_1", cin, 48, 1, 1); add(f"{name}.branch5x5_2", 48, 64, 5, 5)
            add(f"{name}.branch3x3dbl_1", cin, 64, 1, 1)
            add(f"{name}.branch3x3dbl_2", 64, 96, 3, 3); add(f"{name}.branch3x3dbl_3", 96, 96, 3, 3)
            add(f"{name}.branch_pool", cin, pool, 1, 1)

        def inception_b(name, cin):
            add(f"{name}.branch3x3", cin, 384, 3, 3)
            add(f"{name}.branch3x3dbl_1", cin, 64, 1, 1)
            add(f"{name}.branch3x3dbl_2", 64, 96, 3, 3); add(f"{name}.branch3x3dbl_3", 96, 96, 3, 3)

        def inception_c(name, cin, c7):
            add(f"{name}.branch1x1", cin, 192, 1, 1)
            add(f"{name}.branch7x7_1", cin, c7, 1, 1)
            add(f"{name}.branch7x7_2", c7, c7, 1, 7); add(f"{name}.branch7x7_3", c7, 192, 7, 1)
            add(f"{name}.branch7x7dbl_1", cin, c7, 1, 1)
            add(f"{name}.branch7x7dbl_2", c7, c7, 7, 1); add(f"{name}.branch7x7dbl_3", c7, c7, 1, 7)
            add(f"{name}.branch7x7dbl_4", c7, c7, 7, 1); add(f"{name}.branch7x7dbl_5", c7, 192, 1, 7)
            add(f"{name}.branch_pool", cin, 192, 1, 1)

        def inception_d(name, cin):
            add(f"{name}.branch3x3_1", cin, 192, 1, 1); add(f"{name}.branch3x3_2", 192, 320, 3, 3)
            add(f"{name}.branch7x7x3_1", cin, 192, 1, 1)
            add(f"{name}.branch7x7x3_2", 192, 192, 1, 7); add(f"{name}.branch7x7x3_3", 192, 192, 7, 1)
            add(f"{name}.branch7x7x3_4", 192, 192, 3, 3)

        def inception_e(name, cin):
            add(f"{name}.branch1x1", cin, 320, 1, 1)
            add(f"{name}.branch3x3_1", cin, 384, 1, 1)
            add(f"{name}.branch3x3_2a", 384, 384, 1, 3); add(f"{name}.branch3x3_2b", 384, 384, 3, 1)
            add(f"{name}.branch3x3dbl_1", cin, 448, 1, 1); add(f"{name}.branch3x3dbl_2", 448, 384, 3, 3)
            add(f"{name}.branch3x3dbl_3a", 384, 384, 1, 3); add(f"{name}.branch3x3dbl_3b", 384, 384, 3, 1)
            add(f"{name}.branch_pool", cin, 192, 1, 1)

        inception_a("Mixed_5b", 192, 32); inception_a("Mixed_5c", 256, 64); inception_a("Mixed_5d", 288, 64)
        inception_b("Mixed_6a", 288)
        for n, c7 in [("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160), ("Mixed_6e", 192)]:
            inception_c(n, 768, c7)
        inception_d("Mixed_7a", 768)
        inception_e("Mixed_7b", 1280); inception_e("Mixed_7c", 2048)

        params = convert_torch_inception(sd)
        model = InceptionV3Pool3()
        imgs = rng.integers(0, 256, size=(2, 32, 32, 3), dtype=np.uint8)
        feats = model.apply({"params": params}, preprocess_uint8(imgs))
        assert feats.shape == (2, 2048)
        assert np.all(np.isfinite(np.asarray(feats)))
        # params sensitivity: zeroing the last block changes features
        params2 = jax.tree_util.tree_map(lambda x: x, params)
        params2["Mixed_7c"] = jax.tree_util.tree_map(np.zeros_like, params["Mixed_7c"])
        feats2 = model.apply({"params": params2}, preprocess_uint8(imgs))
        assert np.any(np.asarray(feats) != np.asarray(feats2))

    def test_geometry_matches_torchvision_golden(self):
        """Pin per-stage spatial/channel geometry against torchvision's
        inception_v3 graph (golden shapes at the canonical 299x299 input).
        The conversion test above checks weights flow through; THIS test
        pins stride/padding/pool geometry per stage — a silent topology
        deviation would skew every future real-FID number while conversion
        tests stay green. Shapes via jax.eval_shape (no FLOPs). The
        one-command torchvision cross-check for an environment with weights
        is documented in utils/inception.py."""
        import jax
        import jax.numpy as jnp

        from tinyedm_tpu.utils.inception import InceptionV3Pool3

        model = InceptionV3Pool3()

        def run(x):
            variables = model.init(jax.random.PRNGKey(0), x)
            return model.apply(variables, x, capture_intermediates=True)

        out, mods = jax.eval_shape(
            run, jax.ShapeDtypeStruct((1, 299, 299, 3), jnp.float32)
        )
        inter = mods["intermediates"]
        # torchvision inception_v3 stage-output shapes (NHWC), 299x299 input
        golden = {
            "Conv2d_1a_3x3": (1, 149, 149, 32),   # 3x3 s2 valid
            "Conv2d_2a_3x3": (1, 147, 147, 32),   # 3x3 s1 valid
            "Conv2d_2b_3x3": (1, 147, 147, 64),   # 3x3 s1 pad 1
            "Conv2d_3b_1x1": (1, 73, 73, 80),     # after maxpool 3/2
            "Conv2d_4a_3x3": (1, 71, 71, 192),    # 3x3 s1 valid
            "Mixed_5b": (1, 35, 35, 256),         # after maxpool 3/2; 64+64+96+32
            "Mixed_5c": (1, 35, 35, 288),         # 64+64+96+64
            "Mixed_5d": (1, 35, 35, 288),
            "Mixed_6a": (1, 17, 17, 768),         # grid reduction; 384+96+288
            "Mixed_6b": (1, 17, 17, 768),
            "Mixed_6c": (1, 17, 17, 768),
            "Mixed_6d": (1, 17, 17, 768),
            "Mixed_6e": (1, 17, 17, 768),
            "Mixed_7a": (1, 8, 8, 1280),          # grid reduction; 320+192+768
            "Mixed_7b": (1, 8, 8, 2048),          # 320+768+768+192
            "Mixed_7c": (1, 8, 8, 2048),
        }
        for name, want in golden.items():
            got = tuple(inter[name]["__call__"][0].shape)
            assert got == want, f"{name}: {got} != golden {want}"
        assert tuple(out.shape) == (1, 2048)

    def test_converted_weights_roundtrip_io(self, tmp_path):
        from tinyedm_tpu.utils.inception import load_converted, save_converted

        params = {"Conv2d_1a_3x3": {"conv": {"kernel": np.ones((3, 3, 3, 32), np.float32),
                                             "bias": np.zeros(32, np.float32)}}}
        path = tmp_path / "w.npz"
        save_converted(params, path)
        back, tf_avgpool, pretrained = load_converted(path)
        assert tf_avgpool is False  # torchvision semantic by default
        assert pretrained is False  # unverified unless stamped explicitly
        np.testing.assert_array_equal(back["Conv2d_1a_3x3"]["conv"]["kernel"],
                                      params["Conv2d_1a_3x3"]["conv"]["kernel"])
        save_converted(params, path, tf_avgpool=True, pretrained=True)
        _, tf_avgpool, pretrained = load_converted(path)
        assert tf_avgpool is True  # variant flag rides inside the file
        assert pretrained is True

    def test_unverified_weights_hard_fail_and_explicit_opt_in(self, tmp_path, monkeypatch):
        """A rehearsal weight file (pretrained=False) sitting at the DEFAULT
        path must NOT resolve under the default or 'inception' specs — only
        under the explicit 'inception-unverified' spec. This is the on-disk
        analog of the proxy hard-fail: in a no-egress environment any file at
        DEFAULT_WEIGHTS is necessarily a randomized-model conversion."""
        import tinyedm_tpu.utils.inception as inception_mod
        from tinyedm_tpu.utils.fid import resolve_feature_fn
        from tinyedm_tpu.utils.inception import (
            UnverifiedInceptionWeights,
            inception_feature_fn,
            save_converted,
        )

        # The stamp check runs before any graph work, so stub params suffice.
        params = {"Conv2d_1a_3x3": {"conv": {"kernel": np.ones((3, 3, 3, 32), np.float32),
                                             "bias": np.zeros(32, np.float32)}}}
        path = tmp_path / "rehearsal.npz"
        save_converted(params, path, tf_avgpool=True)  # no pretrained stamp
        monkeypatch.setattr(inception_mod, "DEFAULT_WEIGHTS", path)

        with pytest.raises(UnverifiedInceptionWeights, match="inception-unverified"):
            inception_feature_fn(path)
        with pytest.raises(UnverifiedInceptionWeights):
            resolve_feature_fn("inception")
        with pytest.raises(UnverifiedInceptionWeights):
            resolve_feature_fn(None)
        _, kind = resolve_feature_fn("inception-unverified")
        assert kind == "inception-unverified"

        # the stamped file resolves under the default and explicit specs
        save_converted(params, path, tf_avgpool=True, pretrained=True)
        _, kind = resolve_feature_fn(None)
        assert kind == "inception"
        _, kind = resolve_feature_fn("inception")
        assert kind == "inception"


class TestProxyFeatures:
    def test_pinned_synthetic_distributions(self):
        """Validated proxy protocol (VERDICT r1 missing #2): FID between two
        samples of the SAME distribution is near zero; between images of
        different brightness/structure it is large. Deterministic in seed."""
        from tinyedm_tpu.utils.fid import compute_stats, frechet_distance, proxy_features

        fn = proxy_features(dim=128, seed=0)
        rng = np.random.default_rng(0)

        def imgs(mean, scale, n=2048):
            x = rng.normal(mean, scale, size=(n, 32, 32, 3))
            return np.clip(x, 0, 255).astype(np.uint8)

        a1, a2 = imgs(128, 40), imgs(128, 40)
        b = imgs(80, 10)
        mu_a1, s_a1 = compute_stats(a1, fn)
        mu_a2, s_a2 = compute_stats(a2, fn)
        mu_b, s_b = compute_stats(b, fn)
        same = frechet_distance(mu_a1, s_a1, mu_a2, s_a2)
        diff = frechet_distance(mu_a1, s_a1, mu_b, s_b)
        # finite-sample covariance noise keeps 'same' slightly above zero
        # (bias ~ dim/n); the protocol's signal is the separation
        assert same < 1.0, same
        assert diff > 20 * max(same, 1e-6), (same, diff)

    def test_deterministic_across_calls(self):
        from tinyedm_tpu.utils.fid import proxy_features

        imgs = np.random.default_rng(1).integers(0, 256, (16, 32, 32, 3), dtype=np.uint8)
        f1 = proxy_features(dim=64, seed=7)(imgs)
        f2 = proxy_features(dim=64, seed=7)(imgs)
        np.testing.assert_array_equal(f1, f2)

    def test_score_cli_requires_explicit_proxy_without_weights(
        self, tmp_path, capsys, monkeypatch
    ):
        """With NO inception weights, an un-flagged score run must HARD-FAIL
        (VERDICT r3: a silent proxy number reads downstream as Inception FID);
        the same run with an explicit --features proxy produces the number.
        Real converted weights may exist at DEFAULT_WEIGHTS in this checkout
        (datasets/inception_v3_pool3.npz), so the no-weights condition is
        forced by pointing the default at a path that cannot exist."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "experiments"))
        import eval_fid

        import tinyedm_tpu.utils.inception as inception_mod

        monkeypatch.setattr(
            inception_mod, "DEFAULT_WEIGHTS", tmp_path / "no_such_weights.npz"
        )

        from tinyedm_tpu.utils.fid import compute_stats, proxy_features, save_stats
        from PIL import Image

        rng = np.random.default_rng(0)
        sdir = tmp_path / "samples"; sdir.mkdir()
        for i in range(32):
            Image.fromarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)).save(sdir / f"{i}.png")
        ref = rng.integers(0, 256, (64, 32, 32, 3), dtype=np.uint8)
        mu, sigma = compute_stats(ref, proxy_features())
        stats = tmp_path / "stats.npz"
        save_stats(stats, mu, sigma)
        base_args = [
            "score", "--ckpt_path", "unused", "--stats", str(stats),
            "--sample_dir", str(sdir), "--skip_generate", "--batch_size", "16",
        ]
        with pytest.raises(FileNotFoundError, match="--features proxy"):
            eval_fid.main(base_args)
        eval_fid.main(base_args + ["--features", "proxy"])
        out = capsys.readouterr().out
        assert "FID[proxy]:" in out


class TestPRDC:
    """Precision/Recall/Density/Coverage (utils/fid.py::prdc) — the
    fidelity-vs-diversity decomposition of Naeem et al. 2020."""

    @staticmethod
    def _naive(real, fake, k):
        """Textbook O(n^2) reference: k-NN ball radii + membership counts."""
        def radii(x):
            d = np.sqrt(((x[:, None, :] - x[None, :, :]) ** 2).sum(-1))
            return np.sort(d, axis=1)[:, k]  # col 0 is the self-distance 0

        rr, fr = radii(real), radii(fake)
        d = np.sqrt(((fake[:, None, :] - real[None, :, :]) ** 2).sum(-1))
        precision = (d <= rr[None, :]).any(axis=1).mean()
        recall = (d.T <= fr[None, :]).any(axis=1).mean()
        density = (d <= rr[None, :]).sum() / (k * len(fake))
        coverage = (d.min(axis=0) <= rr).mean()
        return dict(precision=precision, recall=recall, density=density,
                    coverage=coverage)

    def test_matches_naive(self):
        from tinyedm_tpu.utils.fid import prdc

        rng = np.random.default_rng(0)
        real = rng.standard_normal((60, 4))
        fake = rng.standard_normal((50, 4)) * 1.3 + 0.2
        got = prdc(real, fake, k=3, chunk=16)  # chunk < n exercises blocking
        want = self._naive(real, fake, k=3)
        for key in want:
            assert got[key] == pytest.approx(want[key], rel=1e-9), key

    def test_same_distribution_near_one_and_mode_collapse(self):
        from tinyedm_tpu.utils.fid import prdc

        rng = np.random.default_rng(1)
        real = rng.standard_normal((400, 8))
        same = prdc(real, rng.standard_normal((400, 8)), k=5)
        assert same["precision"] > 0.85 and same["recall"] > 0.85
        assert same["coverage"] > 0.85
        # mode collapse: high-fidelity but concentrated fakes -> precision
        # stays high, recall/coverage collapse
        collapsed = rng.standard_normal((400, 8)) * 0.05
        mc = prdc(real, collapsed, k=5)
        assert mc["precision"] > 0.8
        assert mc["recall"] < 0.3 and mc["coverage"] < 0.3

    def test_k_validation_and_dim_mismatch(self):
        from tinyedm_tpu.utils.fid import prdc

        rng = np.random.default_rng(2)
        with pytest.raises(ValueError, match="k="):
            prdc(rng.standard_normal((4, 3)), rng.standard_normal((10, 3)), k=5)
        with pytest.raises(ValueError, match="dims differ"):
            prdc(rng.standard_normal((10, 3)), rng.standard_normal((10, 4)))

    def test_cli_score_prdc(self, tmp_path):
        """score --prdc prints the PRDC line from stored feature rows."""
        import io
        import sys
        from contextlib import redirect_stdout
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "experiments"))
        import eval_fid
        from PIL import Image

        import tests.fake_features as ff
        from tinyedm_tpu.utils.fid import compute_stats_and_features

        rng = np.random.default_rng(3)
        imgs = rng.integers(0, 256, (48, 32, 32, 3), dtype=np.uint8)
        mu, sigma, feats = compute_stats_and_features(
            [imgs], ff.feature_fn(), max_features=48
        )
        stats = tmp_path / "stats.npz"
        save_stats(stats, mu, sigma, features=feats)
        sdir = tmp_path / "samples"
        sdir.mkdir()
        for i, im in enumerate(imgs[:32]):
            Image.fromarray(im).save(sdir / f"{i}.png")
        buf = io.StringIO()
        with redirect_stdout(buf):
            eval_fid.main([
                "score", "--ckpt_path", "unused", "--stats", str(stats),
                "--sample_dir", str(sdir), "--skip_generate",
                "--features", "tests.fake_features", "--batch_size", "16",
                "--prdc", "--prdc_k", "3",
            ])
        out = buf.getvalue()
        assert "PRDC[tests.fake_features]: precision" in out
        # samples ARE a subset of the reference set -> high precision
        line = [l for l in out.splitlines() if l.startswith("PRDC")][0]
        precision = float(line.split("precision")[1].split()[0])
        assert precision > 0.9

    def test_cli_stats_png_dir_format(self, tmp_path):
        """stats --format png_dir builds reference stats from any image dir."""
        import io
        import sys
        from contextlib import redirect_stdout
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "experiments"))
        import eval_fid
        from PIL import Image

        rng = np.random.default_rng(4)
        ddir = tmp_path / "imgs"
        ddir.mkdir()
        for i in range(20):
            Image.fromarray(
                rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            ).save(ddir / f"{i}.png")
        out_npz = tmp_path / "s.npz"
        buf = io.StringIO()
        with redirect_stdout(buf):
            eval_fid.main([
                "stats", "--data-dir", str(ddir), "--out", str(out_npz),
                "--format", "png_dir", "--features", "tests.fake_features",
                "--kid-features", "16", "--batch-size", "8",
            ])
        assert "wrote stats" in buf.getvalue()
        from tinyedm_tpu.utils.fid import load_features, load_stats

        mu, sigma = load_stats(out_npz)
        assert mu.shape == (48,) and sigma.shape == (48, 48)
        assert load_features(out_npz).shape == (16, 48)


def test_stats_kid_features_zero_takes_moments_only_path(tmp_path):
    """`stats --kid-features 0` must stream moments only: routing 0 through
    `or None` once built an UNBOUNDED reservoir (every feature row resident)
    before discarding it."""
    import pickle
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).resolve().parents[1] / "experiments"))
    import eval_fid

    import tinyedm_tpu.utils.fid as fid_mod

    rng = np.random.default_rng(5)
    base = tmp_path / "cifar10" / "cifar-10-batches-py"
    base.mkdir(parents=True)
    for i in range(1, 6):
        data = rng.integers(0, 256, (20, 3 * 32 * 32), dtype=np.uint8)
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": list(rng.integers(0, 10, 20))}, f)
    with open(base / "test_batch", "wb") as f:
        pickle.dump({b"data": data, b"labels": list(rng.integers(0, 10, 20))}, f)

    stats = tmp_path / "stats.npz"
    orig = fid_mod.compute_stats_and_features
    def forbidden(*a, **k):
        raise AssertionError("kid-features 0 must not build a feature reservoir")
    fid_mod.compute_stats_and_features = forbidden
    try:
        eval_fid.main([
            "stats", "--data-dir", str(tmp_path / "cifar10"), "--out", str(stats),
            "--features", "tests.fake_features", "--batch-size", "32",
            "--kid-features", "0",
        ])
    finally:
        fid_mod.compute_stats_and_features = orig
    from tinyedm_tpu.utils.fid import load_features, load_stats

    mu, sigma = load_stats(stats)
    assert mu.ndim == 1 and sigma.shape == (len(mu), len(mu))
    assert load_features(stats) is None


def test_sweep_empty_value_list_errors(tmp_path):
    """`sweep --guidance_scales` (or --posthoc_sigma_rels) with zero values
    must error, not silently fall through to the full every-checkpoint
    sweep (hours of unintended generation)."""
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).resolve().parents[1] / "experiments"))
    import eval_fid

    for flag in ("--guidance_scales", "--posthoc_sigma_rels"):
        with pytest.raises(SystemExit, match="at least one value"):
            eval_fid.main([
                "sweep", "--ckpt_path", "unused", "--stats", "unused.npz",
                "--sample_dir", str(tmp_path), "--features", "tests.fake_features",
                flag,
            ])


def test_png_dir_batches_threaded_order_tail_and_early_close(tmp_path):
    """The threaded decode pipeline must yield batches byte-identical to the
    serial path (sorted paths, submit-order pops), keep the ragged tail
    batch, and not leave a parked producer thread when the consumer
    abandons the generator early."""
    from PIL import Image

    for i in range(10):
        Image.fromarray(np.full((4, 4, 3), i * 20, np.uint8)).save(
            tmp_path / f"{i:03d}.png"
        )
    batches = list(png_dir_batches(tmp_path, batch_size=4))
    assert [b.shape[0] for b in batches] == [4, 4, 2]
    flat = np.concatenate(batches)
    assert [int(im[0, 0, 0]) for im in flat] == [i * 20 for i in range(10)]

    # early abandonment: close after one batch; the stop event must unblock
    # the producer (a hang here fails the suite's timeout, not this assert)
    gen = png_dir_batches(tmp_path, batch_size=2, prefetch=1)
    first = next(gen)
    assert first.shape == (2, 4, 4, 3)
    gen.close()

    # empty dir yields nothing
    empty = tmp_path / "empty"
    empty.mkdir()
    assert list(png_dir_batches(empty)) == []


class TestPosthocMetadataConsistency:
    @pytest.mark.slow
    def test_output_config_declares_single_target_profile(self, tmp_path):
        """The reconstructed checkpoint carries ONE combined EMA tree at
        target_sigma_rel; its embedded config must say exactly that — a
        source-config copy (N profiles, source sigma_rels) would make a
        training resume expect N trees and an interop export label the tree
        with the wrong sigma_rel/gamma."""
        from tests.test_e2e import make_trainer, tiny_spec
        from tinyedm_tpu.config.registry import instantiate
        from tinyedm_tpu.posthoc_ema import reconstruct
        from tinyedm_tpu.training.checkpoint import load_checkpoint

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

        out = tmp_path / "posthoc"
        reconstruct(
            str(tmp_path / "run" / "checkpoints"),
            target_sigma_rel=0.10,
            out_dir=str(out),
        )
        state, config = load_checkpoint(out)
        assert len(state.ema) == 1
        out_spec = instantiate(config["model"])
        assert out_spec.use_ema
        assert out_spec.ema_length == pytest.approx(0.10)
        assert not out_spec.ema_lengths
        assert out_spec.val_ema_index == 0
        # and the rewritten config still round-trips through reconstruct:
        # pairing one tree with gamma(0.10) is now unambiguous
        reconstruct(str(out), target_sigma_rel=0.10, out_dir=str(tmp_path / "p2"))

    @pytest.mark.slow
    def test_tree_profile_count_mismatch_raises(self, tmp_path):
        """A checkpoint whose stored EMA tree count differs from its config's
        declared profile count (e.g. an interop import with --load_ema into a
        multi-profile config) must be rejected — silently zipping would pair
        trees with the wrong gammas."""
        import dataclasses

        from tests.test_e2e import make_trainer, tiny_spec
        from tinyedm_tpu.config.registry import deinstantiate
        from tinyedm_tpu.posthoc_ema import reconstruct
        from tinyedm_tpu.training.checkpoint import load_checkpoint, save_checkpoint

        spec = tiny_spec()
        trainer = make_trainer(tmp_path, spec, max_epochs=1)
        trainer.fit()
        trainer.ckpt.wait()
        state, config = load_checkpoint(tmp_path / "run" / "checkpoints")
        assert len(state.ema) == 1
        # rewrite the embedded config to claim two profiles
        two = dataclasses.replace(
            spec, ema_length=None, ema_lengths=(0.05, 0.13)
        )
        save_checkpoint(
            tmp_path / "mismatched", state, config={"model": deinstantiate(two)}
        )
        with pytest.raises(ValueError, match="cannot pair"):
            reconstruct(
                str(tmp_path / "mismatched"),
                target_sigma_rel=0.10,
                out_dir=str(tmp_path / "nope"),
            )
