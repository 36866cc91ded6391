"""Long-horizon training soak at the full CIFAR-10 recipe (BENCH.md protocol).

Runs the real 35.6M-param CIFAR-10 train step (bf16 U-Net, forced weight
norm, EMA sigma_rel 0.13, lr 0.02) for thousands of steps on structured
synthetic data — 10 smooth class templates + pixel noise, std matched to
sigma_data=0.5 — and checks the loss descends with no NaN/divergence.

This is the validation harness behind BENCH.md's "long-horizon stability"
rows; `--mod_fp32 false` runs the identical trajectory with bf16 modulation
islands (the docs/PERFORMANCE.md leverage knob), giving the A/B evidence the
knob needs beyond the 900-step validate_learning match.

Run: python experiments/soak.py --steps 8000 --mod_fp32 true --tag parity
     python experiments/soak.py --steps 8000 --mod_fp32 false --tag bf16mod
(~25 min each on one v5e chip; writes runs/soak_<tag>/metrics.jsonl)
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def make_templates(num_classes=10, size=32, channels=3, seed=7):
    """Smooth per-class templates: low-frequency random fields, std 0.5 —
    the same data law as experiments/validate_learning.py scaled to CIFAR
    shape, so the loss trajectory reflects real structure learning."""
    rng = np.random.default_rng(seed)
    coeffs = rng.normal(size=(num_classes, channels, 4, 4))
    xs = np.linspace(0, 2 * np.pi, size)
    templates = np.zeros((num_classes, size, size, channels), np.float32)
    for c in range(num_classes):
        for ch in range(channels):
            field = sum(
                coeffs[c, ch, i, j]
                * np.outer(np.sin((i + 1) * xs + c), np.cos((j + 1) * xs - ch))
                for i in range(4)
                for j in range(4)
            )
            templates[c, :, :, ch] = field / (np.std(field) + 1e-8) * 0.5
    return templates


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=8000)
    parser.add_argument("--mod_fp32", choices=["true", "false"], default="true")
    parser.add_argument("--rampup", type=int, default=500,
                        help="LR rampup steps (the reference recipe always ramps)")
    parser.add_argument("--lr", type=float, default=0.02)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tag", default="soak")
    parser.add_argument("--save_ckpt", action="store_true",
                        help="save an orbax checkpoint (with embedded config) "
                        "at the end — feeds experiments/interop_crosscheck.py")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from tinyedm_tpu.config.registry import apply_overrides, instantiate, load_config
    from tinyedm_tpu.training.train_step import init_train_state, make_train_step
    from tinyedm_tpu.utils.tpu import tune_for_tpu

    tune_for_tpu()

    conf = Path(__file__).parent / "conf" / "cifar10.yaml"
    cfg = load_config(conf, resolve=False)
    cfg = apply_overrides(
        cfg,
        [
            f"model.denoiser.mod_fp32={args.mod_fp32}",
            f"model.lr={args.lr}",
            f"model.rampup_steps={args.rampup}",
            # hold lr steady for the whole run (no decay inside the window)
            f"model.steady_steps={args.steps}",
            "model.scheduler_interval=step",
        ],
    )
    spec = instantiate(cfg["model"])
    model = spec.build_model()
    diffuser = spec.diffuser
    opt_cfg = spec.build_optimizer_config()
    ema_cfg = spec.build_ema_config()

    out_dir = Path("runs") / f"soak_{args.tag}"
    out_dir.mkdir(parents=True, exist_ok=True)
    log_path = out_dir / "metrics.jsonl"
    log_f = open(log_path, "w")

    templates = make_templates()
    num_classes = templates.shape[0]
    rng_np = np.random.default_rng(args.seed)

    def draw_batch():
        cls = rng_np.integers(0, num_classes, args.batch)
        noise = rng_np.normal(scale=0.1, size=(args.batch, 32, 32, 3)).astype(np.float32)
        return templates[cls] + noise, cls.astype(np.int32)

    # condition on the class labels iff the spec is conditional (cifar10 is:
    # num_classes=10) — an earlier soak fed labels=None, silently training
    # the unconditional graph and excluding the class-embedding/modulation
    # path from the stability evidence
    conditional = model.conditional

    state = init_train_state(
        jax.random.PRNGKey(args.seed),
        model,
        jnp.zeros((args.batch, 32, 32, 3)),
        opt_cfg,
        ema_cfg,
        sample_labels=jnp.zeros((args.batch,), jnp.int32) if conditional else None,
    )
    step = jax.jit(make_train_step(model, diffuser, opt_cfg, ema_cfg), donate_argnums=0)
    key = jax.random.PRNGKey(args.seed + 1)

    print(f"soak: {args.steps} steps, mod_fp32={args.mod_fp32}, lr {args.lr} "
          f"(rampup {args.rampup}), batch {args.batch} -> {log_path}", flush=True)
    first_loss = None
    t_start = time.time()
    t_warm = None
    for i in range(args.steps):
        images, cls = draw_batch()
        batch = (jnp.asarray(images), jnp.asarray(cls) if conditional else None)
        state, m = step(state, batch, key, jnp.asarray(float(i)))
        if i == 0:
            # host sync so warmup excludes compile time
            _ = float(m["train_loss"])
            t_warm = time.time()
        if i % 100 == 0 or i == args.steps - 1:
            loss = float(m["train_loss"])
            if first_loss is None:
                first_loss = loss
            rec = {"step": i, "train_loss": loss,
                   "lr": float(m["learning_rate"]),
                   "elapsed_s": round(time.time() - t_start, 1)}
            log_f.write(json.dumps(rec) + "\n")
            log_f.flush()
            print(f"step {i}: loss {loss:.4f}", flush=True)
            if not math.isfinite(loss):
                print("RESULT: FAIL (non-finite loss)", flush=True)
                sys.exit(1)
    final_loss = float(m["train_loss"])
    elapsed = time.time() - t_warm
    sps = (args.steps - 1) * args.batch / elapsed
    summary = {
        "mod_fp32": args.mod_fp32, "steps": args.steps,
        "first_loss": first_loss, "final_loss": final_loss,
        "samples_per_s": round(sps, 1),
    }
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=1))
    print("SUMMARY:", json.dumps(summary), flush=True)
    if args.save_ckpt:
        from tinyedm_tpu.config.registry import deinstantiate
        from tinyedm_tpu.training.checkpoint import save_checkpoint

        save_checkpoint(
            out_dir / "ckpt", state,
            config={"model": deinstantiate(spec), "seed": args.seed},
        )
        print(f"checkpoint: {out_dir / 'ckpt'}", flush=True)
    ok = math.isfinite(final_loss) and final_loss < first_loss
    print("RESULT:", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
