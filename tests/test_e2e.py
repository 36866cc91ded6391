"""End-to-end smoke (SURVEY.md §4 plan item e): train a tiny model a few
steps on synthetic data, checkpoint, resume, and generate PNGs — the whole
L7->L1 stack on the virtual CPU mesh."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyedm_tpu.config.registry import deinstantiate, instantiate
from tinyedm_tpu.data.datamodules import SyntheticDataModule
from tinyedm_tpu.diffusion.diffuser import Diffuser
from tinyedm_tpu.diffusion.solver import DeterministicSolver
from tinyedm_tpu.models.layers import Embedding
from tinyedm_tpu.models.unet import Denoiser
from tinyedm_tpu.training.callbacks import GenerateCallback
from tinyedm_tpu.training.experiment import EDMSpec
from tinyedm_tpu.training.trainer import Trainer
from tinyedm_tpu.utils.logging import MetricLogger

# jit-heavy integration module: excluded from the fast profile (-m 'not slow')
pytestmark = pytest.mark.slow


def tiny_spec(use_ema=True):
    return EDMSpec(
        diffuser=Diffuser(P_mean=-1.2, P_std=1.2),
        embedding=Embedding(fourier_dim=8, embedding_dim=16, num_classes=10),
        denoiser=Denoiser(
            in_channels=1,
            out_channels=1,
            embedding_dim=16,
            num_heads=2,
            sigma_data=0.5,
            encoder_block_types=("Enc", "EncD"),
            decoder_block_types=("Dec", "DecU", "Dec", "Dec"),
            encoder_out_channels=(8, 16),
            decoder_out_channels=(16, 8, 8, 8),
            skip_connections=(True, False, True, True),
            dtype=jnp.bfloat16,
        ),
        use_ema=use_ema,
        ema_length=0.13,
        lr=1e-3,
        rampup_steps=2,
        steady_steps=4,
        scheduler_interval="epoch",
    )


def make_trainer(
    tmp_path, spec, max_epochs=2, callbacks=(), zero1=False, model_parallel=1,
    device_preprocess=False, dm=None, log_every_n_steps=2, **kw,
):
    dm = dm or SyntheticDataModule(
        batch_size=16, image_size=8, num_channels=1, num_samples=64
    )
    return Trainer(
        spec=spec,
        datamodule=dm,
        max_epochs=max_epochs,
        check_val_every_n_epoch=1,
        callbacks=list(callbacks),
        out_dir=tmp_path / "run",
        ckpt_every_n_epochs=1,
        log_every_n_steps=log_every_n_steps,
        seed=0,
        config={"model": deinstantiate(spec), "seed": 0},
        zero1=zero1,
        model_parallel=model_parallel,
        device_preprocess=device_preprocess,
        **kw,
    )


def test_fit_checkpoint_resume_generate(tmp_path):
    spec = tiny_spec()
    solver = DeterministicSolver(num_steps=4)
    gen_cb = GenerateCallback(
        solver, img_shape=(1, 8, 8), num_samples=4, every_n_epochs=1
    )
    trainer = make_trainer(tmp_path, spec, max_epochs=2, callbacks=[gen_cb])
    trainer.fit()
    assert trainer.global_step == 2 * 4  # 64/16 = 4 steps/epoch
    # metrics were logged
    assert (tmp_path / "run" / "metrics.jsonl").exists()
    # preview images were written
    images = list((tmp_path / "run" / "images").glob("*.png"))
    assert images, "GenerateCallback wrote no images"
    # checkpoints exist
    assert trainer.ckpt.latest_step is not None

    # ---- resume: continues from saved step
    trainer2 = make_trainer(tmp_path, tiny_spec(), max_epochs=3)
    trainer2.fit(resume=True)
    assert trainer2.global_step == 3 * 4

    # the resumed state carried EMA trees
    assert len(trainer2.state.ema) == 1


def test_resume_in_decay_keeps_schedule_continuous(tmp_path):
    """Checkpoint-resume landing mid-decay must keep the LR trace on the
    reference formula with no phase reset (VERDICT r4 next #3; reference:
    src/tinyedm/edm.py:305-320). rampup 2 / steady 3 with per-step
    scheduling: run 1 crosses rampup->steady->decay (8 steps), run 2
    resumes at step 8 — already in decay — and continues to 16."""
    import dataclasses
    import json
    import math

    spec = dataclasses.replace(
        tiny_spec(), scheduler_interval="step", rampup_steps=2, steady_steps=3
    )
    lr0, rampup, steady = spec.lr, 2, 3

    def ref_lr(count: int) -> float:
        # the reference's exact lr_lambda (edm.py:305-320)
        if count < rampup:
            return lr0 * (1e-8 + (1.0 - 1e-8) * count / rampup)
        if count < rampup + steady:
            return lr0
        return lr0 / math.sqrt(1.0 + (count - rampup - steady) / steady)

    trainer = make_trainer(tmp_path, spec, max_epochs=2, log_every_n_steps=1)
    trainer.fit()
    assert trainer.global_step == 8  # last sched counts 5..7: decay phase

    trainer2 = make_trainer(
        tmp_path,
        dataclasses.replace(
            tiny_spec(), scheduler_interval="step", rampup_steps=2, steady_steps=3
        ),
        max_epochs=4,
        log_every_n_steps=1,
    )
    trainer2.fit(resume=True)
    assert trainer2.global_step == 16

    rows = [
        json.loads(line)
        for line in (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
        if "learning_rate" in line
    ]
    # every per-step row (both runs; the file appends across resume) sits on
    # the formula: row at step N carries the lr used for sched count N-1
    assert len(rows) == 16
    for r in rows:
        expect = ref_lr(r["step"] - 1)
        assert math.isclose(r["learning_rate"], expect, rel_tol=5e-5), (
            r["step"], r["learning_rate"], expect,
        )
    # continuity: the resumed run's first row continues the decay curve
    # (no rampup reset), and decay is strictly decreasing across the seam
    post = [r["learning_rate"] for r in rows if r["step"] >= 7]
    assert all(b < a for a, b in zip(post, post[1:])), post


def test_zero1_fit_checkpoint_resume_matches_replicated(tmp_path):
    """ZeRO-1 through the whole trainer loop: fit -> checkpoint -> resume
    produces the same params as the fully-replicated run to float
    reduction-order tolerance (reduce-scatter + all-gather vs all-reduce
    rounding — see tests/test_parallel.py), and the orbax round-trip
    re-places the restored state with the sharded layout."""
    params = {}
    for name, zero1 in (("rep", False), ("zero1", True)):
        trainer = make_trainer(
            tmp_path / name, tiny_spec(), max_epochs=1, zero1=zero1
        )
        trainer.fit()
        trainer.ckpt.wait()
        # resume continues under the same placement
        trainer2 = make_trainer(
            tmp_path / name, tiny_spec(), max_epochs=2, zero1=zero1
        )
        trainer2.fit(resume=True)
        assert trainer2.global_step == 2 * 4
        params[name] = trainer2.state.params
    for a, b in zip(
        jax.tree_util.tree_leaves(params["rep"]),
        jax.tree_util.tree_leaves(params["zero1"]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )


def test_tp_fit_checkpoint_resume_matches_replicated(tmp_path):
    """Tensor parallelism through the whole trainer loop
    (trainer.model_parallel: 2 on the 8-device CPU mesh): fit -> checkpoint
    -> resume matches the pure-DP run to float reduction-order tolerance,
    and the orbax round-trip re-places the restored state with the
    TP-sharded layout (GenerateCallback previews run under TP too)."""
    from tinyedm_tpu.parallel.mesh import MODEL_AXIS

    params = {}
    for name, mp in (("dp", 1), ("tp", 2)):
        gen_cb = GenerateCallback(
            DeterministicSolver(num_steps=3),
            img_shape=(1, 8, 8), num_samples=4, every_n_epochs=1,
        )
        trainer = make_trainer(
            tmp_path / name, tiny_spec(), max_epochs=1, model_parallel=mp,
            callbacks=[gen_cb],
        )
        trainer.fit()
        trainer.ckpt.wait()
        trainer2 = make_trainer(
            tmp_path / name, tiny_spec(), max_epochs=2, model_parallel=mp
        )
        trainer2.fit(resume=True)
        assert trainer2.global_step == 2 * 4
        if mp > 1:
            # the restored-and-resumed state is genuinely TP-sharded
            assert any(
                MODEL_AXIS in leaf.sharding.spec
                for leaf in jax.tree_util.tree_leaves(trainer2.state.params)
                if not leaf.sharding.is_fully_replicated
            ), "no param leaf TP-sharded after resume"
        params[name] = trainer2.state.params
    for a, b in zip(
        jax.tree_util.tree_leaves(params["dp"]),
        jax.tree_util.tree_leaves(params["tp"]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )


def test_generate_cli_roundtrip(tmp_path):
    """Full generate path: checkpoint -> load (EMA or not) -> scanned Heun
    solve -> PNG files (reference generate.py flow, SURVEY.md §3.2)."""
    spec = tiny_spec()
    trainer = make_trainer(tmp_path, spec, max_epochs=1)
    trainer.fit()
    trainer.ckpt.wait()

    from tinyedm_tpu.generate import generate

    out_dir = tmp_path / "samples"
    generate(
        ckpt_path=str(tmp_path / "run" / "checkpoints"),
        load_ema=True,
        output_dir=str(out_dir),
        num_samples=6,
        image_size=8,
        num_classes=10,
        batch_size=4,
        num_steps=3,
        num_channels=1,
        mean=(0.5,),
        std=(0.25,),
    )
    pngs = sorted(out_dir.glob("*.png"))
    assert len(pngs) == 6
    assert {p.stem for p in pngs} == {str(i) for i in range(6)}
    from PIL import Image

    img = Image.open(pngs[0])
    assert img.size == (8, 8)

    # classifier-free guidance through the same CLI path (stacked 2B forward
    # inside the scanned solver; conditional checkpoint required)
    cfg_dir = tmp_path / "samples_cfg"
    generate(
        ckpt_path=str(tmp_path / "run" / "checkpoints"),
        load_ema=True,
        output_dir=str(cfg_dir),
        num_samples=4,
        image_size=8,
        num_classes=10,
        batch_size=4,
        num_steps=3,
        num_channels=1,
        mean=(0.5,),
        std=(0.25,),
        guidance_scale=2.0,
    )
    assert len(sorted(cfg_dir.glob("*.png"))) == 4

    # autoguidance with the checkpoint as its OWN guide at scale 1 equals
    # the unguided run up to float addition rounding (D_g + (D_m - D_g)
    # is not bitwise D_m), i.e. within one uint8 quantization level
    auto_dir = tmp_path / "samples_auto"
    generate(
        ckpt_path=str(tmp_path / "run" / "checkpoints"),
        load_ema=True,
        output_dir=str(auto_dir),
        num_samples=6,
        image_size=8,
        num_classes=10,
        batch_size=4,
        num_steps=3,
        num_channels=1,
        mean=(0.5,),
        std=(0.25,),
        guidance_scale=1.0,
        guide_ckpt_path=str(tmp_path / "run" / "checkpoints"),
    )
    auto_pngs = sorted(auto_dir.glob("*.png"))
    assert len(auto_pngs) == 6
    for a, b in zip(auto_pngs, pngs):
        diff = np.abs(
            np.asarray(Image.open(a), np.int16) - np.asarray(Image.open(b), np.int16)
        )
        assert diff.max() <= 1, f"{a} vs {b}: max pixel diff {diff.max()}"

    # DPM-Solver++(2M) through the same CLI path (n forwards vs 2n-1)
    ms_dir = tmp_path / "samples_dpmpp"
    generate(
        ckpt_path=str(tmp_path / "run" / "checkpoints"),
        load_ema=True,
        output_dir=str(ms_dir),
        num_samples=4,
        image_size=8,
        num_classes=10,
        batch_size=4,
        num_steps=4,
        num_channels=1,
        mean=(0.5,),
        std=(0.25,),
        solver_name="dpmpp2m",
    )
    assert len(sorted(ms_dir.glob("*.png"))) == 4


def test_device_denormalize_matches_host_writer(tmp_path):
    """The jitted uint8 tail (generate.py device_denormalize_uint8) must
    produce the same PNGs as PreditionWriter's host float path — same
    formula, all-f32, so any divergence is at most the 1-level rounding
    XLA's fma contraction can introduce."""
    from PIL import Image

    from tinyedm_tpu.generate import CIFAR10_MEAN, CIFAR10_STD, device_denormalize_uint8
    from tinyedm_tpu.training.callbacks import PreditionWriter

    rng = np.random.default_rng(7)
    # span the clip boundaries: solver outputs live roughly in [-2, 2]
    batch = rng.uniform(-2.5, 2.5, size=(8, 16, 16, 3)).astype(np.float32)

    host_dir, dev_dir = tmp_path / "host", tmp_path / "dev"
    PreditionWriter(host_dir, "batch", CIFAR10_MEAN, CIFAR10_STD).write_batch(
        batch, list(range(8))
    )
    dev_u8 = np.asarray(
        jax.jit(device_denormalize_uint8, static_argnums=(1, 2))(
            jnp.asarray(batch), CIFAR10_MEAN, CIFAR10_STD
        )
    )
    assert dev_u8.dtype == np.uint8
    PreditionWriter(dev_dir, "batch", CIFAR10_MEAN, CIFAR10_STD).write_batch(
        dev_u8, list(range(8))
    )
    for i in range(8):
        a = np.asarray(Image.open(host_dir / f"{i}.png"), np.int16)
        b = np.asarray(Image.open(dev_dir / f"{i}.png"), np.int16)
        assert np.abs(a - b).max() <= 1


def test_generate_callback_with_guidance(tmp_path):
    """Training-time previews can sample with CFG (GenerateCallback
    guidance_scale) — the natural preview mode for label-dropout runs."""
    gen_cb = GenerateCallback(
        DeterministicSolver(num_steps=3),
        img_shape=(1, 8, 8), num_samples=4, every_n_epochs=1,
        guidance_scale=2.0,
    )
    trainer = make_trainer(tmp_path, tiny_spec(), max_epochs=1, callbacks=[gen_cb])
    trainer.fit()
    assert list((tmp_path / "run" / "images").glob("*.png")), (
        "guided GenerateCallback wrote no preview images"
    )


def test_autoguidance_with_smaller_guide_architecture(tmp_path):
    """Autoguidance's guide may be a DIFFERENT (smaller) architecture —
    the two models carry separate specs and weight trees (guidance.py
    docstring claim). Train a narrow guide and a wider main model, then
    autoguide the main with the guide through the full CLI path."""
    from tinyedm_tpu.generate import generate

    def narrow_spec():
        s = tiny_spec()
        import dataclasses as dc
        narrow = dc.replace(
            s.denoiser,
            encoder_out_channels=(8, 8),
            decoder_out_channels=(8, 8, 8, 8),
        )
        return dc.replace(s, denoiser=narrow)

    for name, sp in (("main", tiny_spec()), ("guide", narrow_spec())):
        trainer = make_trainer(tmp_path / name, sp, max_epochs=1)
        trainer.fit()
        trainer.ckpt.wait()

    out = tmp_path / "samples"
    generate(
        ckpt_path=str(tmp_path / "main" / "run" / "checkpoints"),
        load_ema=True,
        output_dir=str(out),
        num_samples=4,
        image_size=8,
        num_classes=10,
        batch_size=4,
        num_steps=3,
        num_channels=1,
        mean=(0.5,),
        std=(0.25,),
        guidance_scale=1.8,
        guide_ckpt_path=str(tmp_path / "guide" / "run" / "checkpoints"),
    )
    assert len(sorted(out.glob("*.png"))) == 4


def test_validation_and_best_checkpoint(tmp_path):
    spec = tiny_spec(use_ema=False)
    trainer = make_trainer(tmp_path, spec, max_epochs=2)
    trainer.fit()
    assert trainer.ckpt.best_step is not None


def test_preemption_interrupt_checkpoints_and_stops(tmp_path):
    """A SIGTERM-style interrupt stops training at the next step boundary and
    the final checkpoint allows resume (auto-resume on preemption)."""
    from tinyedm_tpu.training.callbacks import Callback

    class InterruptAfterFirstEpoch(Callback):
        def on_train_epoch_end(self, trainer) -> None:
            trainer._interrupted = True

    spec = tiny_spec(use_ema=False)
    trainer = make_trainer(
        tmp_path, spec, max_epochs=5, callbacks=[InterruptAfterFirstEpoch()]
    )
    trainer.fit()
    assert trainer.global_step == 4  # stopped after epoch 0 (4 steps), not 20
    assert trainer.ckpt.latest_step == 4

    trainer2 = make_trainer(tmp_path, tiny_spec(use_ema=False), max_epochs=2)
    trainer2.fit(resume=True)
    assert trainer2.global_step == 8


def test_midepoch_preemption_resume_is_bitwise_exact(tmp_path):
    """A preemption save mid-epoch must NOT replay the consumed batches on
    resume: the resumed run skips them (the epoch iterator still produces
    them, keeping the deterministic shuffle/augment stream aligned) and ends
    bitwise-identical to an uninterrupted run. The reference replays the
    partial epoch from its start (duplicate training, drifted step count)."""
    ref = make_trainer(tmp_path / "ref", tiny_spec(), max_epochs=2)
    ref.fit()
    assert ref.global_step == 8

    trainer = make_trainer(tmp_path / "pre", tiny_spec(), max_epochs=2)
    orig_batches = trainer.datamodule.train_batches

    def interrupting_batches(epoch, **kw):
        for i, b in enumerate(orig_batches(epoch, **kw)):
            if epoch == 0 and i == 2:  # step 3 lands, then the loop stops
                trainer._interrupted = True
            yield b

    trainer.datamodule.train_batches = interrupting_batches
    trainer.fit()
    assert trainer.global_step == 3  # stopped MID-epoch (4 steps/epoch)
    assert trainer.ckpt.latest_step == 3

    trainer2 = make_trainer(tmp_path / "pre", tiny_spec(), max_epochs=2)
    trainer2.fit(resume=True)
    assert trainer2.global_step == 8  # 3 saved + 1 remaining + epoch 1

    for a, b in zip(
        jax.tree_util.tree_leaves((ref.state.params, ref.state.ema)),
        jax.tree_util.tree_leaves((trainer2.state.params, trainer2.state.ema)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_preprocess_matches_host_pipeline(tmp_path):
    """trainer device_preprocess=True (uint8 + flip flags shipped, normalize
    and hflip inside the jitted step) trains to the same weights as the host
    pipeline up to input rounding: XLA canonicalizes /255 to a multiply by
    the rounded reciprocal, so device-normalized inputs sit 1 ulp from the
    host's IEEE divide (documented in trainer.py) — the trained params match
    at float-rounding tolerance, same class as the zero1/TP equivalences."""
    from tinyedm_tpu.data.datamodules import SyntheticDataModule

    class FlippySynthetic(SyntheticDataModule):
        # exercise the flip branch of the wrapper too (base Synthetic has no
        # augmentation); host _augment and the raw path share _flip_flags
        raw_flip = True

        def _flip_flags(self, n, rng):
            return rng.random(n) < 0.5

    params = {}
    for name, dev_pre in (("host", False), ("device", True)):
        dm = FlippySynthetic(batch_size=16, image_size=8, num_channels=1, num_samples=64)
        trainer = make_trainer(
            tmp_path / name, tiny_spec(), max_epochs=2,
            device_preprocess=dev_pre, dm=dm,
        )
        assert trainer.device_preprocess == dev_pre
        trainer.fit()
        params[name] = (trainer.state.params, trainer.state.ema)
    for a, b in zip(
        jax.tree_util.tree_leaves(params["host"]),
        jax.tree_util.tree_leaves(params["device"]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4
        )


def test_small_val_set_produces_real_val_loss(tmp_path):
    """Regression: a val set smaller than one batch must still produce a
    nonzero val_loss (it used to be silently dropped, logging 0.0 — which
    the best-checkpoint ranking then preferred)."""
    spec = tiny_spec(use_ema=False)
    dm = SyntheticDataModule(batch_size=16, image_size=8, num_channels=1, num_samples=64)
    dm.val_images = dm.val_images[:5]  # smaller than batch AND not % 8
    dm.val_labels = dm.val_labels[:5]
    trainer = Trainer(
        spec=spec, datamodule=dm, max_epochs=1, check_val_every_n_epoch=1,
        out_dir=tmp_path / "run", ckpt_every_n_epochs=1, seed=0,
    )
    trainer.datamodule.prepare_data(); trainer.datamodule.setup()
    trainer.state = trainer._init_state()
    val = trainer.validate()
    # pad-and-mask validation: even 5 samples on the 8-device CPU mesh are
    # padded to the divisor with zero-weight rows — every sample counts, on
    # any mesh (reference torchmetrics counts every sample, metric.py:34-36)
    assert val is not None and val > 0.01


def test_multi_profile_val_series(tmp_path):
    """A multi-profile EMA run logs one val_loss series per tracked profile
    (val_loss/ema_{sigma_rel}) in metrics.jsonl."""
    import json

    spec = tiny_spec()
    spec.ema_lengths = (0.05, 0.13)
    spec.val_ema_index = 1
    trainer = make_trainer(tmp_path, spec, max_epochs=1)
    trainer.fit()
    records = [
        json.loads(l)
        for l in (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
    ]
    val_recs = [r for r in records if "val_loss/ema_0.05" in r]
    assert val_recs, "expected per-profile val series in metrics.jsonl"
    rec = val_recs[-1]
    assert "val_loss/ema_0.13" in rec and "val_loss" in rec
    # the primary series tracks the selected profile exactly
    np.testing.assert_allclose(rec["val_loss"], rec["val_loss/ema_0.13"])


def test_latents_generate_callback_without_vae(tmp_path):
    """LatentsGenerateCallback: VAE unavailable in this environment -> it
    must fall back to logging normalized latents (not crash), after
    un-normalizing with the dataset stats (reference callbacks.py:117)."""
    from tinyedm_tpu.training.callbacks import LatentsGenerateCallback

    spec = tiny_spec()
    cb = LatentsGenerateCallback(
        solver=DeterministicSolver(num_steps=3),
        img_shape=(1, 8, 8),
        mean=(0.1,),
        std=(0.5,),
        num_samples_per_class=2,
        num_classes=2,
        every_n_epochs=1,
    )
    trainer = make_trainer(tmp_path, spec, max_epochs=1, callbacks=[cb])
    trainer.fit()
    images = list((tmp_path / "run" / "images").glob("Generated_*.png"))
    assert images, "LatentsGenerateCallback wrote no preview"


def test_generate_local_rows_multihost_split():
    """The multi-host write split: processes own disjoint, order-preserving
    row sets; pad rows past n_valid are dropped; union covers 0..n-1.
    local_rows returns offsets into the process's contiguous local block —
    global position = local offset + pi * (batch/pc)."""
    from tinyedm_tpu.generate import local_rows

    batch, n_valid, pc = 8, 5, 4  # padded tail batch split over 4 processes
    per = batch // pc
    indices = [100 + i for i in range(n_valid)]
    got = {}
    for pi in range(pc):
        local_pos, idx = local_rows(batch, n_valid, indices, pi, pc)
        assert list(local_pos) == sorted(local_pos)
        assert all(0 <= p < per for p in local_pos)
        for p, g in zip(local_pos, idx):
            gpos = p + pi * per
            assert g == 100 + gpos
            assert gpos not in got
            got[gpos] = g
    assert sorted(got.values()) == indices  # exact cover, no dupes, no pads


def test_assemble_local_batch_dedups_tp_replica_shards():
    """Under TP the P('data')-sharded output replicates every data chunk
    across the model axis, so addressable_shards contains model_parallel
    copies per chunk — assemble_local_batch must keep exactly one per row
    start, in row order (regression: duplicated shards used to displace the
    second chunk's rows on multi-host TP sampling)."""
    from tinyedm_tpu.generate import assemble_local_batch

    chunk0 = np.full((2, 1), 0.0)
    chunk8 = np.full((2, 1), 8.0)
    # model_parallel=2: each chunk appears twice, arbitrary order
    pairs = [(8, chunk8), (0, chunk0), (8, chunk8.copy()), (0, chunk0.copy())]
    out = assemble_local_batch(pairs)
    np.testing.assert_array_equal(out, np.concatenate([chunk0, chunk8]))
    # degenerate DP case: unique shards pass through in row order
    out = assemble_local_batch([(8, chunk8), (0, chunk0)])
    np.testing.assert_array_equal(out, np.concatenate([chunk0, chunk8]))


def test_generate_interval_without_scale_raises(tmp_path):
    """--guidance_sigma_min/max without --guidance_scale must fail loudly
    instead of silently sampling unguided (an hours-long FID run would
    otherwise report a misleading score)."""
    from tinyedm_tpu.generate import generate

    spec = tiny_spec()
    trainer = make_trainer(tmp_path, spec, max_epochs=1)
    trainer.fit()
    trainer.ckpt.wait()
    with pytest.raises(ValueError, match="guidance_sigma"):
        generate(
            ckpt_path=str(tmp_path / "run" / "checkpoints"),
            load_ema=True,
            output_dir=str(tmp_path / "out"),
            num_samples=2,
            image_size=8,
            num_classes=10,
            batch_size=2,
            num_steps=2,
            num_channels=1,
            guidance_sigma_min=0.19,
        )
    # scale 1 short-circuits to the unguided conditional path (no stacked
    # forward) — and an interval alongside an explicit scale must NOT raise
    out1 = tmp_path / "out_scale1"
    generate(
        ckpt_path=str(tmp_path / "run" / "checkpoints"),
        load_ema=True,
        output_dir=str(out1),
        num_samples=2,
        image_size=8,
        num_classes=10,
        batch_size=2,
        num_steps=2,
        num_channels=1,
        guidance_scale=1.0,
        guidance_sigma_min=0.19,
    )
    assert len(sorted(out1.glob("*.png"))) == 2
    # scale 0 samples the unconditional branch with ONE forward
    out0 = tmp_path / "out_scale0"
    generate(
        ckpt_path=str(tmp_path / "run" / "checkpoints"),
        load_ema=True,
        output_dir=str(out0),
        num_samples=2,
        image_size=8,
        num_classes=10,
        batch_size=2,
        num_steps=2,
        num_channels=1,
        guidance_scale=0.0,
    )
    assert len(sorted(out0.glob("*.png"))) == 2


def test_fid_callback_tracks_metrics_and_selects_checkpoints(tmp_path):
    """Training-time FID/KID tracking (FIDCallback): metrics.jsonl gains
    fid/kid series and top-k checkpoint selection can monitor them
    (checkpoint_callback.monitor: fid) — the EDM2 select-by-sample-quality
    workflow the reference's val_loss-only retention lacks."""
    import json

    from tinyedm_tpu.training.callbacks import FIDCallback
    from tinyedm_tpu.utils.fid import compute_stats_and_features, save_stats
    import tests.fake_features as ff

    dm = SyntheticDataModule(
        batch_size=16, image_size=8, num_channels=1, num_samples=64
    )
    fn = ff.feature_fn()
    mu, sigma, feats = compute_stats_and_features(
        [dm.train_images], fn, max_features=64
    )
    stats = tmp_path / "stats.npz"
    save_stats(stats, mu, sigma, features=feats)

    cb = FIDCallback(
        solver=DeterministicSolver(num_steps=2),
        img_shape=(1, 8, 8),
        stats_path=str(stats),
        num_samples=12,
        batch_size=8,
        every_n_epochs=1,
        features="tests.fake_features",
        kid=True,
        kid_subset_size=12,
        kid_subsets=5,
    )
    trainer = make_trainer(
        tmp_path, tiny_spec(), max_epochs=2, callbacks=[cb], dm=dm,
        ckpt_monitor="fid",
    )
    trainer.fit()
    trainer.ckpt.wait()

    rows = [
        json.loads(l)
        for l in (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
    ]
    fid_rows = [r for r in rows if "fid" in r]
    assert len(fid_rows) >= 2  # every epoch at every_n_epochs=1
    assert all(np.isfinite(r["fid"]) and r["fid"] >= 0 for r in fid_rows)
    assert all("kid" in r and np.isfinite(r["kid"]) for r in fid_rows)
    # the fid metric reached checkpoint selection
    assert trainer.ckpt.best_step is not None


def test_fid_callback_kid_without_features_fails_at_start(tmp_path):
    from tinyedm_tpu.training.callbacks import FIDCallback
    from tinyedm_tpu.utils.fid import save_stats

    stats = tmp_path / "stats.npz"
    save_stats(stats, np.ones(3), np.eye(3))  # no feature rows
    # features="proxy" is explicit so the (intentional) hard-fail on a
    # missing Inception weight file doesn't fire first — the point here is
    # the kid-needs-stored-feature-rows check
    cb = FIDCallback(
        solver=DeterministicSolver(num_steps=2),
        img_shape=(1, 8, 8),
        stats_path=str(stats),
        features="proxy",
        kid=True,
    )
    trainer = make_trainer(tmp_path, tiny_spec(), max_epochs=1, callbacks=[cb])
    with pytest.raises(ValueError, match="kid-features"):
        trainer.fit()


def test_eval_fid_sweep_cli(tmp_path, capsys):
    """eval_fid sweep: scores every checkpoint step in one run and reports
    the best — checkpoint selection by sample quality after training."""
    import sys as _sys

    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "experiments"))
    import eval_fid

    from tinyedm_tpu.utils.fid import compute_stats_and_features, save_stats
    import tests.fake_features as ff

    # 3-channel model so PNG round-trip (convert("RGB")) keeps feature dims
    spec = tiny_spec()
    spec = EDMSpec(
        diffuser=spec.diffuser,
        embedding=spec.embedding,
        denoiser=Denoiser(
            in_channels=3,
            out_channels=3,
            embedding_dim=16,
            num_heads=2,
            sigma_data=0.5,
            encoder_block_types=("Enc", "EncD"),
            decoder_block_types=("Dec", "DecU", "Dec", "Dec"),
            encoder_out_channels=(8, 16),
            decoder_out_channels=(16, 8, 8, 8),
            skip_connections=(True, False, True, True),
            dtype=jnp.bfloat16,
        ),
        use_ema=spec.use_ema,
        ema_length=0.13,
        lr=1e-3,
        rampup_steps=2,
        steady_steps=4,
        scheduler_interval="epoch",
    )
    dm = SyntheticDataModule(
        batch_size=16, image_size=8, num_channels=3, num_samples=32
    )
    trainer = make_trainer(tmp_path, spec, max_epochs=2, dm=dm)
    trainer.fit()
    trainer.ckpt.wait()
    steps = sorted(
        int(p.name)
        for p in (tmp_path / "run" / "checkpoints").iterdir()
        if p.is_dir() and p.name.isdigit()
    )
    assert len(steps) >= 2

    mu, sigma, feats = compute_stats_and_features(
        [dm.train_images], ff.feature_fn(), max_features=32
    )
    stats = tmp_path / "stats.npz"
    save_stats(stats, mu, sigma, features=feats)

    eval_fid.main([
        "sweep",
        "--ckpt_path", str(tmp_path / "run" / "checkpoints"),
        "--stats", str(stats),
        "--num_samples", "8", "--batch_size", "4", "--num_steps", "2",
        "--image_size", "8", "--num_classes", "10", "--load_ema",
        "--features", "tests.fake_features",
        "--sample_dir", str(tmp_path / "sweep_samples"),
    ])
    out = capsys.readouterr().out
    for step in steps:
        assert f"step {step:>8}" in out
    assert "BEST: step" in out


def test_eval_fid_sweep_posthoc_sigma_rels(tmp_path, capsys):
    """eval_fid sweep --posthoc_sigma_rels: reconstruct post-hoc EMA at each
    target sigma_rel (EDM2 Algorithm 3), generate, and score — the EDM2
    sigma_rel-selection workflow in one command."""
    import sys as _sys

    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "experiments"))
    import eval_fid

    from tinyedm_tpu.utils.fid import compute_stats_and_features, save_stats
    import tests.fake_features as ff

    spec = EDMSpec(
        diffuser=Diffuser(P_mean=-1.2, P_std=1.2),
        embedding=Embedding(fourier_dim=8, embedding_dim=16, num_classes=10),
        denoiser=Denoiser(
            in_channels=3,
            out_channels=3,
            embedding_dim=16,
            num_heads=2,
            sigma_data=0.5,
            encoder_block_types=("Enc", "EncD"),
            decoder_block_types=("Dec", "DecU", "Dec", "Dec"),
            encoder_out_channels=(8, 16),
            decoder_out_channels=(16, 8, 8, 8),
            skip_connections=(True, False, True, True),
            dtype=jnp.bfloat16,
        ),
        use_ema=True,
        ema_lengths=(0.05, 0.13),  # two tracked profiles to combine
        lr=1e-3,
        rampup_steps=2,
        steady_steps=4,
        scheduler_interval="epoch",
    )
    dm = SyntheticDataModule(
        batch_size=16, image_size=8, num_channels=3, num_samples=32
    )
    trainer = make_trainer(tmp_path, spec, max_epochs=1, dm=dm)
    trainer.fit()
    trainer.ckpt.wait()

    mu, sigma, feats = compute_stats_and_features(
        [dm.train_images], ff.feature_fn(), max_features=32
    )
    stats = tmp_path / "stats.npz"
    save_stats(stats, mu, sigma, features=feats)

    eval_fid.main([
        "sweep",
        "--ckpt_path", str(tmp_path / "run" / "checkpoints"),
        "--stats", str(stats),
        "--num_samples", "8", "--batch_size", "4", "--num_steps", "2",
        "--image_size", "8", "--num_classes", "10",
        "--features", "tests.fake_features",
        "--sample_dir", str(tmp_path / "sweep_samples"),
        "--posthoc_sigma_rels", "0.08", "0.13",
    ])
    out = capsys.readouterr().out
    assert "sigma_rel 0.08  FID" in out
    assert "sigma_rel 0.13  FID" in out
    assert "BEST: sigma_rel" in out


def test_eval_fid_sweep_guidance_scales(tmp_path, capsys):
    """eval_fid sweep --guidance_scales: FID-select the CFG strength at a
    fixed checkpoint (Karras et al. 2024 pick guidance scale by FID)."""
    import sys as _sys

    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "experiments"))
    import eval_fid

    from tinyedm_tpu.utils.fid import compute_stats_and_features, save_stats
    import tests.fake_features as ff

    spec = tiny_spec()
    spec = EDMSpec(
        diffuser=spec.diffuser,
        embedding=spec.embedding,
        denoiser=Denoiser(
            in_channels=3,
            out_channels=3,
            embedding_dim=16,
            num_heads=2,
            sigma_data=0.5,
            encoder_block_types=("Enc", "EncD"),
            decoder_block_types=("Dec", "DecU", "Dec", "Dec"),
            encoder_out_channels=(8, 16),
            decoder_out_channels=(16, 8, 8, 8),
            skip_connections=(True, False, True, True),
            dtype=jnp.bfloat16,
        ),
        use_ema=spec.use_ema,
        ema_length=0.13,
        lr=1e-3,
        rampup_steps=2,
        steady_steps=4,
        scheduler_interval="epoch",
        label_dropout=0.2,  # train the null-label branch CFG guides against
    )
    dm = SyntheticDataModule(
        batch_size=16, image_size=8, num_channels=3, num_samples=32
    )
    trainer = make_trainer(tmp_path, spec, max_epochs=1, dm=dm)
    trainer.fit()
    trainer.ckpt.wait()

    mu, sigma, feats = compute_stats_and_features(
        [dm.train_images], ff.feature_fn(), max_features=32
    )
    stats = tmp_path / "stats.npz"
    save_stats(stats, mu, sigma, features=feats)

    eval_fid.main([
        "sweep",
        "--ckpt_path", str(tmp_path / "run" / "checkpoints"),
        "--stats", str(stats),
        "--num_samples", "8", "--batch_size", "4", "--num_steps", "2",
        "--image_size", "8", "--num_classes", "10", "--load_ema",
        "--features", "tests.fake_features",
        "--sample_dir", str(tmp_path / "sweep_samples"),
        "--guidance_scales", "1", "2",
    ])
    out = capsys.readouterr().out
    assert "guidance_scale 1  FID" in out
    assert "guidance_scale 2  FID" in out
    assert "BEST: guidance_scale" in out


def test_fid_callback_cadence_aligns_with_checkpoint_saves(tmp_path):
    """FIDCallback fires on the same (epoch+1) % N convention as the
    checkpoint cadence, so a fid-monitored periodic save actually carries
    the metric (an epoch-0-based cadence never coincided with the saves —
    the monitor then scored EVERY checkpoint as missing)."""
    from tinyedm_tpu.training.callbacks import FIDCallback
    from tinyedm_tpu.utils.fid import compute_stats_and_features, save_stats
    import tests.fake_features as ff

    dm = SyntheticDataModule(
        batch_size=16, image_size=8, num_channels=1, num_samples=64
    )
    mu, sigma, feats = compute_stats_and_features(
        [dm.train_images], ff.feature_fn(), max_features=64
    )
    stats = tmp_path / "stats.npz"
    save_stats(stats, mu, sigma, features=feats)

    cb = FIDCallback(
        solver=DeterministicSolver(num_steps=2),
        img_shape=(1, 8, 8),
        stats_path=str(stats),
        num_samples=8,
        batch_size=8,
        every_n_epochs=2,  # must coincide with the (epoch+1)%2 epoch-1 save
        features="tests.fake_features",
    )
    trainer = make_trainer(
        tmp_path, tiny_spec(), max_epochs=2, callbacks=[cb], dm=dm,
        ckpt_monitor="fid",
    )
    saved = []
    orig_save = trainer.ckpt.save

    def recording_save(step, state, config=None, metrics=None):
        saved.append((step, dict(metrics or {})))
        return orig_save(step, state, config=config, metrics=metrics)

    trainer.ckpt.save = recording_save
    trainer.fit()
    trainer.ckpt.wait()
    by_step = dict(saved)
    assert "fid" not in by_step[4]  # epoch 0: cadence-2 callback silent
    assert "fid" in by_step[8]  # epoch 1: deposited into the SAME epoch's save


def test_midepoch_preemption_skips_epoch_end_work(tmp_path):
    """A mid-epoch interrupt checkpoints immediately: validation and
    epoch-end callbacks (potentially minutes of FID/preview sampling) are
    skipped so the save lands inside a short preemption grace window."""
    from tinyedm_tpu.training.callbacks import Callback

    epoch_end_calls = []

    class Recorder(Callback):
        def on_train_epoch_end(self, trainer) -> None:
            epoch_end_calls.append(trainer.epoch)

    trainer = make_trainer(
        tmp_path, tiny_spec(use_ema=False), max_epochs=2, callbacks=[Recorder()]
    )
    orig_batches = trainer.datamodule.train_batches

    def interrupting(epoch, **kw):
        for i, b in enumerate(orig_batches(epoch, **kw)):
            if epoch == 0 and i == 1:
                trainer._interrupted = True
            yield b

    trainer.datamodule.train_batches = interrupting
    validations = []
    trainer.validate = lambda: validations.append(1)
    trainer.fit()
    assert trainer.global_step == 2  # stopped mid-epoch
    assert trainer.ckpt.latest_step == 2  # ...but the save landed
    assert epoch_end_calls == [] and validations == []


def test_resume_skip_does_not_materialize_consumed_batches(tmp_path):
    """Mid-epoch resume fast-skips consumed batches inside the datamodule:
    they are never gathered/normalized (only the shuffle/augment rng streams
    advance), so resuming late in a huge epoch costs no data work."""
    trainer = make_trainer(tmp_path, tiny_spec(use_ema=False), max_epochs=1)
    orig_batches = trainer.datamodule.train_batches

    def interrupting(epoch, **kw):
        for i, b in enumerate(orig_batches(epoch, **kw)):
            if i == 2:
                trainer._interrupted = True
            yield b

    trainer.datamodule.train_batches = interrupting
    trainer.fit()
    assert trainer.global_step == 3

    trainer2 = make_trainer(tmp_path, tiny_spec(use_ema=False), max_epochs=1)
    gathered = []  # _augment is the train-path gather (val_batches skips it)
    orig_augment = trainer2.datamodule._augment

    def counting_augment(x, rng):
        gathered.append(len(x))
        return orig_augment(x, rng)

    trainer2.datamodule._augment = counting_augment
    trainer2.fit(resume=True)
    assert trainer2.global_step == 4
    # one batch for the abstract-state probe (restore's eval_shape) + the
    # single remaining batch — NOT the 3 consumed ones
    assert len(gathered) == 2, gathered


def test_fid_callback_start_validation_raises_on_all_ranks(tmp_path, monkeypatch):
    """Round-4 continuation fix: on_train_start's fail-loudly validation must
    run on EVERY process — a rank-0-only raise would leave the other hosts
    entering the train loop and hanging in the first collective. Simulated by
    making this process claim rank 1: the missing stats file must still
    raise."""
    import jax as _jax

    from tinyedm_tpu.training.callbacks import FIDCallback

    cb = FIDCallback(
        solver=DeterministicSolver(num_steps=2),
        img_shape=(1, 8, 8),
        stats_path=str(tmp_path / "does_not_exist.npz"),
        features="proxy",
    )
    monkeypatch.setattr(_jax, "process_index", lambda: 1)
    with pytest.raises(FileNotFoundError):
        cb.on_train_start(trainer=None)  # validation needs no trainer state


def test_final_save_carries_last_val_loss(tmp_path):
    """When the final epoch validated but no cadence save fired, the
    end-of-run save must attach that val_loss (the weights are unchanged
    since validation) — a metric-less final save would exclude the run's
    last checkpoint from best/top-k ranking despite its known quality."""
    spec = tiny_spec(use_ema=False)
    dm = SyntheticDataModule(
        batch_size=16, image_size=8, num_channels=1, num_samples=64
    )
    trainer = Trainer(
        spec=spec,
        datamodule=dm,
        max_epochs=1,
        check_val_every_n_epoch=1,
        out_dir=tmp_path / "run",
        ckpt_every_n_epochs=100,  # no cadence save: only the end-of-run save
        seed=0,
        config={"model": deinstantiate(spec), "seed": 0},
    )
    trainer.fit()
    trainer.ckpt.wait()
    # only the end-of-run save exists, and it ranks (best == latest)
    assert trainer.ckpt.latest_step == trainer.global_step
    assert trainer.ckpt.best_step == trainer.global_step


def test_solve_use_ema_without_ema_profiles_raises(tmp_path):
    """trainer.solve(use_ema=True) on a state with no EMA trees must raise
    (matching load_edm_from_checkpoint), not silently sample with raw
    training weights while claiming EMA quality."""
    spec = tiny_spec(use_ema=False)
    trainer = make_trainer(tmp_path, spec, max_epochs=1)
    trainer.fit()
    solver = DeterministicSolver(num_steps=2)
    x0 = jnp.zeros((2, 8, 8, 1))
    with pytest.raises(ValueError, match="no EMA"):
        trainer.solve(solver, x0, jnp.asarray([0, 1]), use_ema=True)
    # and the honest path still works
    y = trainer.solve(solver, x0, jnp.asarray([0, 1]), use_ema=False)
    assert np.isfinite(np.asarray(y)).all()


def test_eval_fid_cli_guards(tmp_path):
    """Three loud-failure guards on the eval_fid CLI: --skip_generate
    without --sample_dir (would score an empty temp dir), an empty --steps
    list (would silently sweep every checkpoint), and --ema_indices without
    --load_ema (would score raw weights labeled as EMA rows)."""
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).resolve().parents[1] / "experiments"))
    import eval_fid

    with pytest.raises(SystemExit, match="sample_dir"):
        eval_fid.main([
            "score", "--ckpt_path", "unused", "--stats", "unused.npz",
            "--skip_generate", "--features", "tests.fake_features",
        ])
    with pytest.raises(SystemExit, match="at least one value"):
        eval_fid.main([
            "sweep", "--ckpt_path", "unused", "--stats", "unused.npz",
            "--sample_dir", str(tmp_path), "--features", "tests.fake_features",
            "--steps",
        ])
    with pytest.raises(SystemExit, match="load_ema"):
        eval_fid.main([
            "sweep", "--ckpt_path", "unused", "--stats", "unused.npz",
            "--sample_dir", str(tmp_path), "--features", "tests.fake_features",
            "--ema_indices", "0", "1",
        ])
