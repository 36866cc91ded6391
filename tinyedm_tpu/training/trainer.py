"""The training driver: epochs, validation, checkpoints, previews.

Replaces lightning.Trainer + the EDM LightningModule's orchestration hooks
(experiments/train.py:26-36; SURVEY.md §3.1 call stack) with a compact loop
around ONE jitted train step. Design points:

  * The hot loop never synchronizes with the device except at the logging
    cadence — metrics stay as device arrays until flushed.
  * Batches are host numpy, sharded onto the mesh ``data`` axis
    (shard_batch); XLA's gradient all-reduce over ICI is the DDP equivalent.
  * Validation accumulates raw (sse, count) pairs — exact cross-batch and
    cross-device averaging (torchmetrics dist_reduce_fx="sum" parity,
    metric.py:34-36).
  * EMA "swap for validation" (ema.py:83-106) is just evaluating the EMA
    tree — no tensor swapping exists in a functional state.
  * Checkpoints: top-k on val_loss + save-last via orbax
    (conf/cifar10.yaml:59-67 parity), self-describing via the embedded config.
"""

from __future__ import annotations

import signal
import time
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tinyedm_tpu.parallel.mesh import ShardingPlan, make_mesh, place_state, shard_batch
from tinyedm_tpu.training.callbacks import Callback
from tinyedm_tpu.training.checkpoint import CheckpointManager
from tinyedm_tpu.training.experiment import EDMSpec
from tinyedm_tpu.training.state import TrainState
from tinyedm_tpu.training.train_step import (
    init_train_state,
    make_eval_step,
    make_train_step,
)
from tinyedm_tpu.utils.logging import MetricLogger


class Trainer:
    def __init__(
        self,
        spec: EDMSpec,
        datamodule,
        max_epochs: int = 1,
        check_val_every_n_epoch: int = 10,
        callbacks: Sequence[Callback] = (),
        logger: Optional[MetricLogger] = None,
        out_dir: str | Path = "runs/default",
        ckpt_every_n_epochs: int = 100,
        ckpt_top_k: int = 3,
        ckpt_save_last: bool = True,
        ckpt_monitor: str = "val_loss",
        ckpt_mode: str = "min",
        log_every_n_steps: int = 50,
        seed: int = 42,
        mesh=None,
        config: Optional[dict] = None,
        zero1: bool = False,
        model_parallel: int = 1,
        device_preprocess: bool = False,
    ):
        self.spec = spec
        self.model = spec.build_model()
        self.diffuser = spec.diffuser
        self.opt_cfg = spec.build_optimizer_config()
        self.ema_cfg = spec.build_ema_config()
        self.use_ema = self.ema_cfg is not None
        self.datamodule = datamodule
        self.max_epochs = max_epochs
        self.check_val_every_n_epoch = check_val_every_n_epoch
        self.callbacks = list(callbacks)
        self.out_dir = Path(out_dir)
        self.logger = logger or MetricLogger(self.out_dir)
        self.log_every_n_steps = log_every_n_steps
        self.seed = seed
        self.config = config  # self-describing checkpoint payload
        # model_parallel > 1 reshapes the mesh to (devices/N, N) and
        # state_shardings TP-shards every weight-normed kernel over the
        # ``model`` axis (tests/test_tensor_parallel.py); zero1 shards Adam
        # moments + EMA trees over ``data`` (ZeRO-1) — a memory knob for the
        # big latent configs on real meshes. Both are equivalent to DP up to
        # float reduction order.
        if mesh is not None and model_parallel > 1:
            raise ValueError(
                "pass either an explicit mesh or model_parallel, not both "
                "(an explicit mesh would silently drop the TP request); "
                "build the mesh with make_mesh(model_parallel=N) instead"
            )
        self.mesh = (
            mesh if mesh is not None else make_mesh(model_parallel=model_parallel)
        )
        self.zero1 = bool(zero1)
        # device_preprocess: ship uint8 + flip flags and normalize/flip
        # INSIDE the jitted step (raw-path datamodules only) — 4x less
        # host->device batch traffic and no host float pass. Off by default:
        # XLA canonicalizes the /255 into a multiply by the rounded
        # reciprocal (on every backend), so device-normalized inputs match
        # the host pipeline to 1 ulp rather than bitwise (measured max
        # 1.2e-7) — far below the bf16 compute rounding, but the default
        # stays byte-exact host-pipeline parity.
        self.device_preprocess = bool(device_preprocess) and bool(
            getattr(datamodule, "raw_uint8", False)
        )
        if device_preprocess and not self.device_preprocess:
            # loud, not silent: the user asked for the 4x-cheaper input path
            # but this datamodule has no raw-uint8 feed — benchmarking the
            # fallback as if the knob were on would mislead
            print(
                "[trainer] device_preprocess requested but the datamodule "
                f"({type(datamodule).__name__}) exposes no raw_uint8 path; "
                "falling back to host preprocessing",
                flush=True,
            )
        self.plan = ShardingPlan(self.mesh, zero1=self.zero1)
        self.ckpt = CheckpointManager(
            self.out_dir / "checkpoints",
            max_to_keep=ckpt_top_k,
            monitor=ckpt_monitor,
            mode=ckpt_mode,
            save_last=ckpt_save_last,
        )
        # callbacks may deposit per-epoch checkpoint-selection metrics here
        # (e.g. FIDCallback's fid/kid); merged into the next save, cleared
        # each epoch. Lets `checkpoint_callback.monitor: fid` select by
        # sample quality instead of val_loss (EDM2 workflow).
        self.extra_ckpt_metrics: dict = {}
        self.ckpt_every_n_epochs = ckpt_every_n_epochs

        self._train_step_fn = make_train_step(
            self.model, self.diffuser, self.opt_cfg, self.ema_cfg
        )
        if self.device_preprocess:
            base_step = self._train_step_fn

            def step_with_preprocess(state, batch, rng, sched_count):
                u8, flags, labels = batch
                x = (u8.astype(jnp.float32) / 255.0 - 0.5) / 0.5
                if flags is not None:  # static: raw_flip datamodules only
                    x = jnp.where(flags[:, None, None, None], x[:, :, ::-1, :], x)
                return base_step(state, (x, labels), rng, sched_count)

            self._train_step_fn = step_with_preprocess
        self._ema_sigma_rels = tuple(self.ema_cfg.sigma_rels) if self.use_ema else ()
        self._eval_step_fn = make_eval_step(
            self.model,
            self.diffuser,
            use_ema=self.use_ema and not spec.validate_original_weights,
            ema_index=spec.val_ema_index,
            # per-profile val series whenever more than one EMA profile is
            # tracked (one extra forward per profile, val cadence only)
            n_profiles=(
                len(self._ema_sigma_rels) if len(self._ema_sigma_rels) > 1 else 0
            ),
        )
        # jitted lazily (_jit_steps): the zero1 per-leaf sharding tree is
        # derived from the placed state, which doesn't exist yet
        self._train_step = None
        self._eval_step = None
        self._solve_cache: dict = {}

        self.state: Optional[TrainState] = None
        self.epoch = 0
        self.global_step = 0
        # batches of the CURRENT epoch already consumed before a mid-epoch
        # checkpoint (preemption save): set on resume, cleared after the
        # first resumed epoch realigns
        self._skip_batches = 0
        # preemption safety (TPU pools send SIGTERM): finish the current
        # epoch's step, checkpoint, exit cleanly; `--resume` continues.
        # The reference has no preemption handling (SURVEY.md §5) — recovery
        # there is manual resume only.
        self._interrupted = False

    def _install_signal_handlers(self) -> None:
        def handler(signum, frame):
            # flag ONLY — no logger IO here: the interrupted frame may be
            # inside the logger (or a wandb network call), and re-entering
            # it from the handler can raise into arbitrary trainer code
            # before the preemption checkpoint is written. The fit loop
            # logs when it observes the flag.
            self._interrupted = True

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, handler)
            except ValueError:  # not the main thread (tests)
                return

    # ------------------------------------------------------------------ setup
    def _init_state(self) -> TrainState:
        images, labels = next(self.datamodule.train_batches(epoch=0))
        state = init_train_state(
            jax.random.PRNGKey(self.seed),
            self.model,
            jnp.asarray(images),
            self.opt_cfg,
            self.ema_cfg,
            sample_labels=jnp.asarray(labels) if self.model.conditional else None,
        )
        return place_state(self.mesh, state, zero1=self.zero1)

    def restore(self, step: Optional[int] = None) -> None:
        abstract = jax.eval_shape(self._init_state)
        state, _ = self.ckpt.restore(step, abstract_state=abstract)
        self.state = place_state(self.mesh, state, zero1=self.zero1)
        self.global_step = int(state.step)

    def _jit_steps(self) -> None:
        """Jit the train/eval steps once the state exists (the zero1 sharding
        tree is derived from the placed state's leaves)."""
        if self._train_step is None:
            self._train_step = self.plan.jit_train_step(
                self._train_step_fn, state=self.state
            )
            self._eval_step = self.plan.jit_eval_step(
                self._eval_step_fn, state=self.state
            )

    # -------------------------------------------------------------------- fit
    def fit(self, resume: bool = False) -> None:
        self.datamodule.prepare_data()
        self.datamodule.setup("fit")
        steps_per_epoch = self.datamodule.steps_per_epoch()
        if resume and self.ckpt.latest_step is not None:
            self.restore()
            spe = max(steps_per_epoch, 1)
            self.epoch = self.global_step // spe
            # mid-epoch checkpoint (preemption save): skip the consumed
            # batches of the resumed epoch instead of replaying them — the
            # epoch iterator still PRODUCES them (keeping the deterministic
            # shuffle/augment rng stream aligned), so a resumed run is
            # bitwise-identical to an uninterrupted one (tests/test_e2e.py).
            # The reference replays the epoch from its start on such a resume.
            self._skip_batches = self.global_step % spe
            self.logger.log_text(
                "trainer",
                f"resumed at step {self.global_step} (epoch {self.epoch}"
                + (
                    f", skipping {self._skip_batches} consumed batches)"
                    if self._skip_batches
                    else ")"
                ),
            )
        if self.state is None:
            self.state = self._init_state()
        self._jit_steps()

        base_rng = jax.random.PRNGKey(self.seed)
        self._install_signal_handlers()
        for cb in self.callbacks:
            cb.on_train_start(self)

        while self.epoch < self.max_epochs and not self._interrupted:
            # clear at epoch START, not end: a metric a callback deposited at
            # epoch E's end (e.g. FID) describes epoch-E weights only. Clearing
            # here means a preemption save mid-E+1 attaches nothing stale; a
            # normal final save still sees the last epoch's deposit (weights
            # unchanged between the deposit and that save).
            self.extra_ckpt_metrics = {}
            t_epoch = time.time()
            n_samples = 0
            last_metrics = None
            skip, self._skip_batches = self._skip_batches, 0
            batches_fn = (
                self.datamodule.train_batches_raw
                if self.device_preprocess
                else self.datamodule.train_batches
            )
            try:
                # in-repo datamodules fast-skip consumed batches (rng streams
                # still advance; no gather/augment/normalize work is paid)
                batches = batches_fn(self.epoch, skip=skip)
                skip = 0
            except TypeError:  # user datamodule without skip support
                batches = batches_fn(self.epoch)
            # datamodules that gather only this process's rows (latpack)
            # advertise it; shard_batch then skips its global->local slicing
            # and multi-host input memory/IO scale as 1/N. Applies to
            # train_batches only (val_batches stay global: the padded-val
            # exactness logic needs the global row count).
            process_local = bool(
                getattr(self.datamodule, "yields_process_local", False)
            )
            for i, batch_np in enumerate(batches):
                if i < skip:  # consumed before the mid-epoch checkpoint
                    continue
                batch = shard_batch(self.mesh, batch_np, process_local=process_local)
                sched_count = (
                    self.epoch
                    if self.opt_cfg.scheduler_interval == "epoch"
                    else self.global_step
                )
                self.state, metrics = self._train_step(
                    self.state, batch, base_rng, jnp.asarray(sched_count, jnp.float32)
                )
                self.global_step += 1
                # samples_per_sec counts GLOBAL samples: a process-local
                # batch is 1/Nth of the global batch
                n_samples += len(batch_np[0]) * (
                    jax.process_count() if process_local else 1
                )
                last_metrics = metrics
                if self.global_step % self.log_every_n_steps == 0:
                    self._flush_metrics(metrics)
                if self._interrupted:
                    break
            if last_metrics is not None:
                # host-sync BEFORE taking the epoch time: the loop dispatches
                # steps asynchronously, so without draining the pipeline here
                # samples_per_sec would measure dispatch throughput, not
                # training throughput (wildly inflated whenever the host
                # outruns the device — e.g. under device_preprocess)
                train_loss = float(last_metrics["train_loss"])
                dt = time.time() - t_epoch
                self.logger.log_metrics(
                    {
                        "epoch": self.epoch,
                        "samples_per_sec": n_samples / dt,
                        "train_loss": train_loss,
                    },
                    step=self.global_step,
                )

            if self._interrupted:
                # preemption: the grace window is short — skip validation and
                # epoch-end callbacks (a FID eval can take minutes) and go
                # straight to the final save below
                break
            val_loss = None
            if (self.epoch + 1) % self.check_val_every_n_epoch == 0:
                val_loss = self.validate()
                if val_loss is not None:
                    self._last_val = (self.global_step, val_loss)
            for cb in self.callbacks:
                cb.on_train_epoch_end(self)
            if (self.epoch + 1) % self.ckpt_every_n_epochs == 0:
                self.save_checkpoint(val_loss)
            self.epoch += 1

        if self._interrupted:
            self.logger.log_text(
                "trainer", "preemption signal received - checkpointing and exiting"
            )
        if self.ckpt.latest_step != self.global_step:  # avoid same-step double save
            # if validation ran at this exact step (final epoch validated
            # but the cadence save didn't fire), attach its val_loss — the
            # weights haven't changed since, and a metric-less final save
            # would exclude the run's last checkpoint from best/top-k
            # ranking even though its quality is known
            last = getattr(self, "_last_val", None)
            self.save_checkpoint(last[1] if last and last[0] == self.global_step else None)
        self.ckpt.wait()
        for cb in self.callbacks:
            cb.on_fit_end(self)

    def _flush_metrics(self, metrics) -> None:
        host = {k: float(v) for k, v in metrics.items() if k not in ("sse", "count")}
        host["train_loss_running"] = float(metrics["sse"]) / max(
            float(metrics["count"]), 1.0
        )
        self.logger.log_metrics(host, step=self.global_step)

    # ------------------------------------------------------------- validation
    def validate(self) -> Optional[float]:
        assert self.state is not None
        self._jit_steps()
        sse, count = 0.0, 0.0
        profile_sse: dict[int, float] = {}
        data_size = self.mesh.shape.get("data", 1)
        rng = jax.random.PRNGKey(self.seed + 777)
        for i, (images, labels) in enumerate(self.datamodule.val_batches()):
            # batch must split evenly over the mesh data axis; pad the tail
            # with zero-weight rows so every real sample counts — val_loss is
            # exact on any mesh (reference torchmetrics parity, metric.py:34-36)
            n = len(images)
            pad = (-n) % data_size
            mask = np.ones((n + pad,), np.float32)
            if pad:
                mask[n:] = 0.0
                images = np.concatenate(
                    [images, np.zeros((pad,) + images.shape[1:], images.dtype)]
                )
                if labels is not None:
                    labels = np.concatenate(
                        [labels, np.zeros((pad,) + np.shape(labels)[1:], np.asarray(labels).dtype)]
                    )
            batch = shard_batch(self.mesh, (images, labels, mask))
            out = self._eval_step(self.state, batch, jax.random.fold_in(rng, i))
            sse += float(out["sse"])
            count += float(out["count"])
            for j in range(len(self._ema_sigma_rels)):
                key = f"sse_ema{j}"
                if key in out:
                    profile_sse[j] = profile_sse.get(j, 0.0) + float(out[key])
        if count == 0:  # empty val set: no metric (never a fake 0.0)
            self.logger.log_text("trainer", "validation skipped: empty val set")
            return None
        val_loss = sse / count
        metrics = {"val_loss": val_loss}
        for j, s in profile_sse.items():
            # one val series per tracked EMA profile, named by sigma_rel
            metrics[f"val_loss/ema_{self._ema_sigma_rels[j]}"] = s / count
        self.logger.log_metrics(metrics, step=self.global_step)
        for cb in self.callbacks:
            cb.on_validation_end(self)
        return val_loss

    # ------------------------------------------------------------- generation
    def solve(
        self,
        solver,
        x0,
        class_labels=None,
        use_ema: bool = False,
        ema_index: int = 0,
        guidance_scale: Optional[float] = None,
        guidance_interval: Optional[tuple] = None,
    ):
        """Run the ODE sampler with current (or EMA) weights; jitted per
        (solver config, conditional, use_ema, guidance) and cached.
        ``guidance_scale`` applies classifier-free guidance (needs labels and
        a label-dropout-trained model for a meaningful null branch);
        ``guidance_interval`` restricts it to a sigma band."""
        assert self.state is not None
        guided = guidance_scale is not None and guidance_scale != 1.0
        if guided and class_labels is None:
            raise ValueError("guidance_scale needs class labels")
        # DeterministicSolver is a frozen dataclass -> hashable value key
        # (id() keys can be recycled for short-lived solver objects)
        key = (
            solver, class_labels is not None, use_ema, ema_index,
            guidance_scale if guided else None, guidance_interval,
        )
        if key not in self._solve_cache:
            # gradient-free path: Pallas attention kernel on TPU
            model = self.spec.build_model(inference_fast=True)

            def sample(params, constants, x0, labels):
                def denoise_fn(x, sigma, lab):
                    return model.apply(
                        {"params": params, "constants": constants}, x, sigma, lab
                    )

                fn = denoise_fn
                if guided:
                    from tinyedm_tpu.diffusion.guidance import cfg_denoise_fn

                    fn = cfg_denoise_fn(
                        denoise_fn, guidance_scale, interval=guidance_interval
                    )
                return solver.solve(fn, x0, labels)

            self._solve_cache[key] = jax.jit(sample)
        if use_ema and not self.state.ema:
            # match the load path (checkpoint.py load_edm_from_checkpoint):
            # silently sampling with raw training weights would let previews
            # and FID series claim EMA quality they don't have
            raise ValueError(
                "solve(use_ema=True) but the train state tracks no EMA "
                "profiles (EMAConfig absent or sigma_rels empty)"
            )
        params = self.state.ema[ema_index] if use_ema else self.state.params
        return self._solve_cache[key](params, self.state.constants, x0, class_labels)

    # ------------------------------------------------------------ checkpoints
    def save_checkpoint(self, val_loss: Optional[float]) -> None:
        assert self.state is not None
        metrics = dict(self.extra_ckpt_metrics)
        if val_loss is not None:
            metrics["val_loss"] = val_loss
        self.ckpt.save(
            self.global_step, self.state, config=self.config, metrics=metrics or None
        )
        if getattr(self.logger, "_log_model", False):
            # wandb log_model analog: wait for the async save to land, then
            # upload the step directory as an artifact (no-op without wandb)
            self.ckpt.wait()
            self.logger.log_checkpoint(
                self.ckpt.directory / str(self.global_step), self.global_step
            )
