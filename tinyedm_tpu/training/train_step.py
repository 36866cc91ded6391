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
    # per-layer watch fidelity (wandb_watch.per_layer): additionally emit
    # grad_norm/<module.child> + param_norm/<module.child> for every depth-2
    # param group (per-block for the denoiser) — the reference's log="all"
    # per-parameter histograms, reduced to norms. Grad norms are PRE-clip.
    log_norms_per_layer: bool = False
    # Optional global-norm gradient clipping (beyond the reference, which
    # ships none): guards the rare small-sigma/large-lambda(sigma) gradient
    # spikes observed when training at full lr without the recipe's rampup
    # (BENCH.md round-2 soak). None = off (reference parity).
    grad_clip_norm: Optional[float] = None
    # CFG training (beyond the reference): per-sample probability of
    # replacing the class label with the null label (-1 -> zero one-hot
    # through the embedding — EDM2's unconditional form). 0 = off, graph
    # byte-identical to reference parity. Enables classifier-free guidance
    # at sampling (diffusion/guidance.py, generate --guidance_scale).
    label_dropout: float = 0.0


def _param_groups(tree):
    """Depth-2 param groups for per-layer watch: ``<top>.<child>`` per
    denoiser block / embedding table / uncertainty layer (the reference's
    wandb.watch(log="all") logs per-parameter histograms, train.py:28; we
    reduce each registered submodule to an L2 norm — per-layer-debugging
    granularity without histogram device pulls)."""
    for top in sorted(tree):
        sub = tree[top]
        if hasattr(sub, "items"):  # mapping node (dict / FrozenDict)
            for child in sorted(sub):
                yield f"{top}.{child}", sub[child]
        else:
            yield top, sub


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

    label_dropout = float(opt_cfg.label_dropout) if conditional else 0.0

    def loss_fn(params, constants, images, labels, rng):
        k_diff, k_drop = jax.random.split(rng)
        if label_dropout > 0.0 and labels is not None:
            from tinyedm_tpu.diffusion.guidance import drop_labels

            k_drop, k_lab = jax.random.split(k_drop)
            labels = drop_labels(k_lab, labels, label_dropout)
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

        # pre-clip global norm: reused by the clip branch AND by log_norms,
        # so logged grad_norm shows raw spike magnitude even when clipping
        # saturates (the spikes are what motivated the knob)
        raw_gnorm = None
        if opt_cfg.grad_clip_norm is not None or opt_cfg.log_norms:
            gsq_c = sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree_util.tree_leaves(grads)
            )
            raw_gnorm = jnp.sqrt(gsq_c)
        per_layer_norms = {}
        if opt_cfg.log_norms_per_layer:
            # grads here are still PRE-clip (clip rescales below); params are
            # the step-input weights — together one extra pass over each tree,
            # fused by XLA into small grouped reductions
            for prefix, tree in (("grad_norm", grads), ("param_norm", state.params)):
                for name, group in _param_groups(tree):
                    per_layer_norms[f"{prefix}/{name}"] = jnp.sqrt(
                        sum(
                            jnp.sum(jnp.square(l.astype(jnp.float32)))
                            for l in jax.tree_util.tree_leaves(group)
                        )
                    )
        clip_scale = None
        if opt_cfg.grad_clip_norm is not None:
            clip_scale = jnp.minimum(
                1.0, opt_cfg.grad_clip_norm / (raw_gnorm + 1e-12)
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
            psq = sum(
                jnp.sum(jnp.square(p.astype(jnp.float32)))
                for p in jax.tree_util.tree_leaves(params)
            )
            out_metrics["grad_norm"] = raw_gnorm  # pre-clip (see above)
            out_metrics["param_norm"] = jnp.sqrt(psq)
            if clip_scale is not None:
                # < 1.0 exactly when clipping engaged this step
                out_metrics["clip_scale"] = clip_scale
        out_metrics.update(per_layer_norms)
        return new_state, out_metrics

    return train_step


def make_eval_step(
    model: EDM,
    diffuser: Diffuser,
    use_ema: bool = False,
    ema_index: int = 0,
    n_profiles: int = 0,
):
    """Validation step (reference: edm.py:238-248): diffuse with the same
    log-normal sigma law, denoise without dropout, return (sse, count) for
    exact cross-batch/cross-device averaging. With use_ema the EMA weights are
    evaluated — the functional analog of the swap-for-validation dance
    (ema.py:83-106): no swap needed, just pass the other tree.

    ``batch`` is (images, labels) or (images, labels, mask): the optional
    per-sample 0/1 mask lets callers pad batches up to the mesh data-axis
    divisor while keeping the metric exact — pad rows get loss weight 0 and
    are excluded from the count, so val_loss matches the reference's
    every-sample torchmetrics accumulation (metric.py:34-36) on any mesh.

    Noise draws are per-sample (key folded by sample index), so a sample's
    (sigma, noise) draw is independent of the batch shape — padded and
    unpadded batches give every real sample identical draws, making val_loss
    mesh-size-invariant, not just statistically equivalent.

    With ``n_profiles > 0`` the step additionally evaluates EVERY tracked
    EMA profile on the same diffuse draws and returns ``sse_ema{i}`` sums —
    one val series per profile (generalizes the reference's single-profile
    swap, ema.py:83-106, to multi-profile checkpoint selection). Costs one
    extra forward per extra profile, only at validation cadence.
    """
    sigma_data = model.sigma_data
    conditional = model.conditional

    def eval_step(state: TrainState, batch, rng: jax.Array):
        images, labels, *rest = batch
        mask = rest[0] if rest else None
        keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
            jnp.arange(images.shape[0])
        )
        noisy, sigma = jax.vmap(
            lambda k, x: jax.tree_util.tree_map(
                lambda y: y[0], diffuser(k, x[None])
            )
        )(keys, images)
        weight = edm_loss_weight(sigma, sigma_data)
        if mask is not None:
            m = mask.astype(jnp.float32)
            weight = weight * m
            count = jnp.sum(m)
        else:
            count = jnp.asarray(images.shape[0], jnp.float32)

        def sse_with(params):
            denoised = model.apply(
                {"params": params, "constants": state.constants},
                noisy,
                sigma,
                labels if conditional else None,
                train=False,
            )
            sse, _ = weighted_sum_squared_error(weight, denoised, images)
            return sse

        profile_sse = {i: sse_with(state.ema[i]) for i in range(n_profiles)}
        if use_ema:
            primary = (
                profile_sse[ema_index]
                if ema_index in profile_sse
                else sse_with(state.ema[ema_index])
            )
        else:
            primary = sse_with(state.params)
        out = {"sse": primary, "count": count}
        for i, s in profile_sse.items():
            out[f"sse_ema{i}"] = s
        return out

    return eval_step
