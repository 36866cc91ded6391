"""The single jitted EDM train step.

Everything the reference spreads across LightningModule.training_step, the
precision plugin, DDP gradient sync, the LR scheduler, fused Adam, and the
EMAOptimizer (src/tinyedm/edm.py:205-236,250-266; ema.py:229-291) fuses here
into one XLA program: diffuse -> bf16 U-Net fwd/bwd -> fp32 loss -> Adam ->
forced weight renorm -> power-EMA update(s). Under pjit with the batch
sharded on the mesh 'data' axis and state replicated, XLA emits the gradient
all-reduce over ICI automatically — that is the entire DDP story.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from tinyedm_tpu.diffusion.diffuser import Diffuser
from tinyedm_tpu.diffusion.loss import edm_training_loss, weighted_sum_squared_error
from tinyedm_tpu.models.edm import EDM
from tinyedm_tpu.ops.precond import edm_loss_weight
from tinyedm_tpu.training.ema import EMAConfig, maybe_ema_update
from tinyedm_tpu.training.lr_schedule import edm_lr_multiplier
from tinyedm_tpu.training.state import TrainState, force_weight_norm


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 1e-4
    betas: tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8  # torch.optim.Adam default
    rampup_steps: int = 0
    steady_steps: int = 1
    # "epoch": the schedule tick is the epoch counter fed into the step;
    # "step": the tick is the optimizer step count (reference scheduler_interval)
    scheduler_interval: str = "epoch"
    accum_steps: int = 1  # gradient accumulation microbatches (imagenet.yaml: 3)
    # wandb.watch(log="all") analog (reference train.py:28): emit global
    # gradient/parameter L2 norms as step metrics (costs two tree reductions)
    log_norms: bool = False
    # Optional global-norm gradient clipping (beyond the reference, which
    # ships none): guards the rare small-sigma/large-lambda(sigma) gradient
    # spikes observed when training at full lr without the recipe's rampup
    # (BENCH.md round-2 soak). None = off (reference parity).
    grad_clip_norm: Optional[float] = None


def make_adam(betas: tuple[float, float], eps: float) -> optax.GradientTransformation:
    """Bias-corrected Adam moments; the lr scale is applied inside the step so
    the schedule tick (step or epoch) can be a runtime input."""
    return optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps)


def init_train_state(
    rng: jax.Array,
    model: EDM,
    sample_batch: jnp.ndarray,
    opt_cfg: OptimizerConfig,
    ema_cfg: Optional[EMAConfig] = None,
    sample_labels: Optional[jnp.ndarray] = None,
) -> TrainState:
    """Initialize params/constants (then force-normalize weights exactly as the
    reference does on the first training forward), Adam moments and EMA trees.

    The whole init runs under one jit — eager init would dispatch thousands of
    tiny ops (slow over any device transport; pathological over a TPU tunnel).
    """
    tx = make_adam(opt_cfg.betas, opt_cfg.eps)
    n_ema = len(ema_cfg.sigma_rels) if ema_cfg is not None else 0

    def _init(rng, sample_batch, sample_labels):
        sigma = jnp.ones((sample_batch.shape[0],), jnp.float32)
        # init through denoise_with_aux so the uncertainty head's params
        # (if any) are created too
        variables = model.init(
            {"params": rng},
            sample_batch,
            sigma,
            sample_labels,
            train=False,
            method=model.denoise_with_aux,
        )
        params = force_weight_norm(variables["params"])
        constants = variables.get("constants", {})
        opt_state = tx.init(params)
        ema = tuple(
            jax.tree_util.tree_map(lambda x: x + 0.0, params) for _ in range(n_ema)
        )
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            constants=constants,
            opt_state=opt_state,
            ema=ema,
        )

    if sample_labels is None:
        return jax.jit(lambda r, b: _init(r, b, None))(rng, sample_batch)
    return jax.jit(_init)(rng, sample_batch, sample_labels)


def make_train_step(
    model: EDM,
    diffuser: Diffuser,
    opt_cfg: OptimizerConfig,
    ema_cfg: Optional[EMAConfig] = None,
) -> Callable:
    """Build train_step(state, batch, rng, sched_count) -> (state, metrics).

    batch = (images NHWC fp32-normalized, labels int32 or None-placeholder).
    ``sched_count``: epoch or step count per opt_cfg.scheduler_interval —
    a traced scalar so epoch-interval schedules don't retrigger compilation.
    """
    sigma_data = model.sigma_data
    tx = make_adam(opt_cfg.betas, opt_cfg.eps)
    gammas = ema_cfg.gammas if ema_cfg is not None else ()
    every_n = ema_cfg.every_n_steps if ema_cfg is not None else 1
    conditional = model.conditional

    def loss_fn(params, constants, images, labels, rng):
        k_diff, k_drop = jax.random.split(rng)
        noisy, sigma = diffuser(k_diff, images)
        denoised, uncertainty = model.apply(
            {"params": params, "constants": constants},
            noisy,
            sigma,
            labels if conditional else None,
            train=True,
            method=EDM.denoise_with_aux,
            rngs={"dropout": k_drop},
        )
        weight = edm_loss_weight(sigma, sigma_data)
        loss, metrics = edm_training_loss(weight, denoised, images, uncertainty)
        return loss, metrics

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, batch, rng: jax.Array, sched_count):
        images, labels = batch
        rng = jax.random.fold_in(rng, state.step)

        if opt_cfg.accum_steps > 1:
            # microbatch lax.scan: images (A, B/A, H, W, C); grads averaged over
            # microbatches, matching Lightning accumulate_grad_batches semantics
            # (conf/imagenet.yaml:7).
            a = opt_cfg.accum_steps
            mb_images = images.reshape((a, images.shape[0] // a) + images.shape[1:])
            mb_labels = (
                labels.reshape((a, labels.shape[0] // a) + labels.shape[1:])
                if labels is not None
                else jnp.zeros((a, mb_images.shape[1]), jnp.int32)
            )

            def micro(carry, inp):
                i, mimg, mlab = inp
                (loss, metrics), grads = grad_fn(
                    state.params,
                    state.constants,
                    mimg,
                    mlab if conditional else None,
                    jax.random.fold_in(rng, i),
                )
                acc_grads, acc_loss, acc_metrics = carry
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                acc_metrics = jax.tree_util.tree_map(jnp.add, acc_metrics, metrics)
                return (acc_grads, acc_loss + loss, acc_metrics), ()

            zero_metrics = {"sse": jnp.zeros((), jnp.float32), "count": jnp.zeros((), jnp.float32)}
            if model.use_uncertainty:
                zero_metrics["uncertainty"] = jnp.zeros((), jnp.float32)
            carry = (
                jax.tree_util.tree_map(jnp.zeros_like, state.params),
                jnp.zeros((), jnp.float32),
                zero_metrics,
            )
            (grads, loss, metrics), _ = jax.lax.scan(
                micro, carry, (jnp.arange(a), mb_images, mb_labels)
            )
            inv_a = 1.0 / a
            grads = jax.tree_util.tree_map(lambda g: g * inv_a, grads)
            loss = loss * inv_a
            if "uncertainty" in metrics:
                metrics["uncertainty"] = metrics["uncertainty"] * inv_a
        else:
            (loss, metrics), grads = grad_fn(
                state.params, state.constants, images, labels, rng
            )

        if opt_cfg.grad_clip_norm is not None:
            gsq_c = sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree_util.tree_leaves(grads)
            )
            gnorm = jnp.sqrt(gsq_c)
            clip_scale = jnp.minimum(
                1.0, opt_cfg.grad_clip_norm / (gnorm + 1e-12)
            )
            grads = jax.tree_util.tree_map(
                lambda g: (g.astype(jnp.float32) * clip_scale).astype(g.dtype),
                grads,
            )

        lr = opt_cfg.lr * edm_lr_multiplier(
            sched_count, opt_cfg.rampup_steps, opt_cfg.steady_steps
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: (-lr) * u, updates)
        params = optax.apply_updates(state.params, updates)
        # forced weight normalization — once per step (see force_weight_norm)
        params = force_weight_norm(params)

        # power-function EMA(s); decay/check use the pre-increment step counter
        ema = tuple(
            maybe_ema_update(e, params, state.step, g, every_n)
            for e, g in zip(state.ema, gammas)
        )

        new_state = TrainState(
            step=state.step + 1,
            params=params,
            constants=state.constants,
            opt_state=opt_state,
            ema=ema,
        )
        out_metrics = {
            "train_loss": loss,
            "learning_rate": lr,
            "sse": metrics["sse"],
            "count": metrics["count"],
        }
        if "uncertainty" in metrics:
            out_metrics["uncertainty"] = metrics["uncertainty"]
        if opt_cfg.log_norms:
            gsq = sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree_util.tree_leaves(grads)
            )
            psq = sum(
                jnp.sum(jnp.square(p.astype(jnp.float32)))
                for p in jax.tree_util.tree_leaves(params)
            )
            out_metrics["grad_norm"] = jnp.sqrt(gsq)
            out_metrics["param_norm"] = jnp.sqrt(psq)
        return new_state, out_metrics

    return train_step


def make_eval_step(model: EDM, diffuser: Diffuser, use_ema: bool = False, ema_index: int = 0):
    """Validation step (reference: edm.py:238-248): diffuse with the same
    log-normal sigma law, denoise without dropout, return (sse, count) for
    exact cross-batch/cross-device averaging. With use_ema the EMA weights are
    evaluated — the functional analog of the swap-for-validation dance
    (ema.py:83-106): no swap needed, just pass the other tree.
    """
    sigma_data = model.sigma_data
    conditional = model.conditional

    def eval_step(state: TrainState, batch, rng: jax.Array):
        images, labels = batch
        params = state.ema[ema_index] if use_ema else state.params
        noisy, sigma = diffuser(rng, images)
        denoised = model.apply(
            {"params": params, "constants": state.constants},
            noisy,
            sigma,
            labels if conditional else None,
            train=False,
        )
        weight = edm_loss_weight(sigma, sigma_data)
        sse, n = weighted_sum_squared_error(weight, denoised, images)
        return {"sse": sse, "count": n}

    return eval_step
