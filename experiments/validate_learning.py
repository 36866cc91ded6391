"""Generative-learning validation without external datasets.

Trains a small conditional EDM on a synthetic dataset with known structure —
each class c has a fixed smooth template T_c plus small pixel noise — then
samples with the Heun solver and checks that per-class sample means recover
the right template (high cosine similarity to own class, low to others).
This closes the full loop (diffuse -> train -> EMA -> sample) with a
falsifiable statistical criterion, which unit tests can't.

Run: python experiments/validate_learning.py  (TPU, ~2-4 min)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def make_dataset(num_classes=4, size=16, n_per_class=512, seed=0):
    rng = np.random.default_rng(seed)
    # smooth per-class templates: low-frequency random fields, std 0.5
    freqs = rng.normal(size=(num_classes, 3, 3, 1))
    xs = np.linspace(0, 2 * np.pi, size)
    templates = []
    for c in range(num_classes):
        field = sum(
            freqs[c, i, j, 0]
            * np.outer(np.sin((i + 1) * xs + c), np.cos((j + 1) * xs - c))
            for i in range(3)
            for j in range(3)
        )
        field = field / (np.std(field) + 1e-8) * 0.5
        templates.append(field[..., None].astype(np.float32))
    templates = np.stack(templates)  # (C, H, W, 1)

    images, labels = [], []
    for c in range(num_classes):
        noise = rng.normal(scale=0.1, size=(n_per_class, size, size, 1)).astype(
            np.float32
        )
        images.append(templates[c][None] + noise)
        labels.append(np.full((n_per_class,), c, np.int32))
    return np.concatenate(images), np.concatenate(labels), templates


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--mod_fp32", choices=["true", "false"], default="true",
        help="fp32 (reference-parity) vs bf16 modulation islands — the A/B "
        "evidence behind the docs/PERFORMANCE.md mod_fp32 knob",
    )
    parser.add_argument(
        "--guided", action="store_true",
        help="learning-level CFG validation: train with label_dropout=0.15, "
        "then require guided sampling (scale 2, plain AND limited-interval) "
        "to sharpen per-class identity vs the unguided baseline",
    )
    parser.add_argument(
        "--solver", default="heun", choices=["heun", "dpmpp2m"],
        help="sampler for the criterion: Heun (2n-1 forwards) or "
        "DPM-Solver++(2M) (n forwards) — dpmpp2m must pass the same "
        "class-identity bar, the learning-level evidence for the cheaper "
        "sampler",
    )
    parser.add_argument(
        "--autoguided", action="store_true",
        help="learning-level autoguidance validation (Karras et al. 2024's "
        "exact recipe: guide the trained model with a LESS-TRAINED snapshot "
        "of the same run): capture the EMA at step 300, autoguide the final "
        "model with it at scale 2, and require the class-identity margins "
        "to hold vs the unguided baseline",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from tinyedm_tpu.diffusion.diffuser import Diffuser
    from tinyedm_tpu.diffusion.solver import DeterministicSolver
    from tinyedm_tpu.models.edm import EDM
    from tinyedm_tpu.models.layers import Embedding
    from tinyedm_tpu.models.unet import Denoiser
    from tinyedm_tpu.training.ema import EMAConfig
    from tinyedm_tpu.training.train_step import (
        OptimizerConfig,
        init_train_state,
        make_train_step,
    )
    from tinyedm_tpu.utils.tpu import tune_for_tpu

    tune_for_tpu()
    num_classes, size = 4, 16
    images, labels, templates = make_dataset(num_classes, size)
    print(f"dataset: {images.shape}, {num_classes} classes")

    model = EDM(
        embedding=Embedding(fourier_dim=32, embedding_dim=64, num_classes=num_classes),
        denoiser=Denoiser(
            in_channels=1,
            out_channels=1,
            embedding_dim=64,
            num_heads=2,
            sigma_data=0.5,
            encoder_block_types=("Enc", "Enc", "EncD", "EncA"),
            decoder_block_types=("DecA", "Dec", "DecU", "Dec", "Dec", "Dec"),
            encoder_out_channels=(64, 64, 96, 96),
            decoder_out_channels=(96, 96, 64, 64, 64, 64),
            skip_connections=(True, True, False, True, True, True),
            dropout_rate=0.05,
            dtype=jnp.bfloat16,
            mod_fp32=args.mod_fp32 == "true",
        ),
    )
    diffuser = Diffuser(P_mean=-1.2, P_std=1.2)
    opt = OptimizerConfig(lr=0.006, rampup_steps=100, steady_steps=2000,
                          scheduler_interval="step",
                          label_dropout=0.15 if args.guided else 0.0)
    ema_cfg = EMAConfig(sigma_rels=(0.13,))

    batch_size = 256
    state = init_train_state(
        jax.random.PRNGKey(0), model,
        jnp.zeros((batch_size, size, size, 1)), opt, ema_cfg,
        sample_labels=jnp.zeros((batch_size,), jnp.int32),
    )
    step = jax.jit(make_train_step(model, diffuser, opt, ema_cfg), donate_argnums=0)

    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(2)
    n_steps = 1500
    t0 = time.time()
    guide_snapshot = None
    for i in range(n_steps):
        idx = rng.integers(0, len(images), batch_size)
        batch = (jnp.asarray(images[idx]), jnp.asarray(labels[idx]))
        state, m = step(state, batch, key, jnp.asarray(float(i)))
        if args.autoguided and i == 300:
            # the "bad version of itself": the same run's EMA, 1/5 trained.
            # jnp.copy materializes fresh buffers — the step donates its
            # input state, so a bare reference would be invalidated
            guide_snapshot = jax.tree_util.tree_map(jnp.copy, state.ema[0])
            jax.block_until_ready(guide_snapshot)
        if i % 300 == 0:
            print(f"step {i}: loss {float(m['train_loss']):.4f}", flush=True)
    print(f"trained {n_steps} steps in {time.time()-t0:.1f}s, "
          f"final loss {float(m['train_loss']):.4f}")

    # sample 64 per class with EMA weights
    if args.solver == "dpmpp2m":
        from tinyedm_tpu.diffusion.solver import MultistepSolver

        solver = MultistepSolver(num_steps=18)
    else:
        solver = DeterministicSolver(num_steps=18)
    variables = {"params": state.ema[0], "constants": state.constants}

    @jax.jit
    def sample(x0, labs):
        return solver.solve(
            lambda x, s, l: model.apply(variables, x, s, l), x0, labs
        )

    n_per = 64
    x0 = jax.random.normal(jax.random.PRNGKey(3), (n_per * num_classes, size, size, 1))
    labs = jnp.repeat(jnp.arange(num_classes, dtype=jnp.int32), n_per)
    samples = np.asarray(sample(x0, labs))

    def class_sims(samples):
        """(own-sim, best-other-sim) per class: per-class sample mean vs the
        generating templates, cosine similarity."""
        out = []
        for c in range(num_classes):
            mean_c = samples[np.asarray(labs) == c].mean(axis=0).reshape(-1)
            sims = []
            for c2 in range(num_classes):
                t = templates[c2].reshape(-1)
                sims.append(
                    float(mean_c @ t / (np.linalg.norm(mean_c) * np.linalg.norm(t) + 1e-8))
                )
            out.append((sims[c], max(s for i, s in enumerate(sims) if i != c)))
        return out

    # criterion: per-class sample mean recovers the right template
    ok = True
    base = class_sims(samples)
    for c, (own, best_other) in enumerate(base):
        status = "OK" if own > 0.9 and own > best_other + 0.1 else "FAIL"
        ok &= status == "OK"
        print(f"class {c}: own-sim {own:.3f}, best-other {best_other:.3f}  [{status}]")

    if args.guided:
        # learning-level CFG evidence: with a label-dropout-trained model,
        # guided sampling (cond + null-label branches combined on-device)
        # must sharpen class identity relative to the unguided solve, and
        # the limited-interval form must stay in PASS territory
        from tinyedm_tpu.diffusion.guidance import cfg_denoise_fn

        def guided_samples(scale, interval=None):
            fn = cfg_denoise_fn(
                lambda x, s, l: model.apply(variables, x, s, l), scale,
                interval=interval,
            )
            g = jax.jit(lambda x0, labs: solver.solve(fn, x0, labs))
            return np.asarray(g(x0, labs))

        for tag, interval in (("cfg2", None), ("cfg2-interval", (0.1, 2.0))):
            sims = class_sims(guided_samples(2.0, interval))
            for c, (own, best_other) in enumerate(sims):
                margin_base = base[c][0] - base[c][1]
                margin = own - best_other
                # guidance must preserve the identity criterion and not
                # shrink the class margin by more than noise
                good = own > 0.9 and margin > margin_base - 0.02
                ok &= good
                print(
                    f"[{tag}] class {c}: own-sim {own:.3f} "
                    f"(margin {margin:.3f} vs base {margin_base:.3f})  "
                    f"[{'OK' if good else 'FAIL'}]"
                )

    if args.autoguided:
        # learning-level autoguidance evidence: guide the final EMA model
        # with its own 1/5-trained snapshot (two forwards per step, distinct
        # weight trees — the CFG stacked-batch trick doesn't apply)
        from tinyedm_tpu.diffusion.guidance import autoguidance_denoise_fn

        guide_variables = {"params": guide_snapshot, "constants": state.constants}

        def auto_samples(scale):
            fn = autoguidance_denoise_fn(
                lambda x, s, l: model.apply(variables, x, s, l),
                lambda x, s, l: model.apply(guide_variables, x, s, l),
                scale,
            )
            g = jax.jit(lambda x0, labs: solver.solve(fn, x0, labs))
            return np.asarray(g(x0, labs))

        for scale in (1.5, 2.0):
            sims = class_sims(auto_samples(scale))
            for c, (own, best_other) in enumerate(sims):
                margin_base = base[c][0] - base[c][1]
                margin = own - best_other
                good = own > 0.9 and margin > margin_base - 0.02
                ok &= good
                print(
                    f"[auto{scale}] class {c}: own-sim {own:.3f} "
                    f"(margin {margin:.3f} vs base {margin_base:.3f})  "
                    f"[{'OK' if good else 'FAIL'}]"
                )

    print("RESULT:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
