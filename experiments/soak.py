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
    parser.add_argument("--steady", type=int, default=None,
                        help="steady-phase steps; with --decay this makes the "
                        "soak cross the steady->decay boundary (the regime the "
                        "1700-epoch recipe spends most of its life in). "
                        "Default: the whole run is steady (legacy behavior)")
    parser.add_argument("--decay", type=int, default=0,
                        help="inverse-sqrt decay steps to run PAST the steady "
                        "phase; total steps = rampup + steady + decay")
    parser.add_argument("--lr", type=float, default=0.02)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tag", default="soak")
    parser.add_argument("--ckpt_every", type=int, default=0,
                        help="save an orbax checkpoint (trainer layout: "
                        "checkpoints/<step>/, embedded config) every N steps — "
                        "feeds eval_fid sweep and --resume")
    parser.add_argument("--stop_at", type=int, default=None,
                        help="stop cleanly after this step (checkpoint saved "
                        "if --ckpt_every); rerun with --resume to continue")
    parser.add_argument("--resume", action="store_true",
                        help="restore the latest checkpoints/<step>/ and "
                        "continue the same schedule (the resume-in-decay "
                        "rehearsal: the LR trace must stay on the formula)")
    parser.add_argument("--save_ckpt", action="store_true",
                        help="save an orbax checkpoint (with embedded config) "
                        "at the end — feeds experiments/interop_crosscheck.py")
    args = parser.parse_args()

    if args.decay and args.steady is None:
        parser.error("--decay needs --steady (total = rampup + steady + decay)")
    steady_steps = args.steady if args.steady is not None else args.steps
    total_steps = (
        args.rampup + args.steady + args.decay if args.decay else args.steps
    )

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
            # without --decay: hold lr steady for the whole run; with it:
            # the run crosses rampup->steady AND steady->decay boundaries
            f"model.steady_steps={steady_steps}",
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
    log_f = open(log_path, "a" if args.resume else "w")

    # the reference scheduler's exact lr_lambda (edm.py:305-320), in numpy:
    # the emitted learning_rate trace is checked point-for-point against it
    def ref_lr(step: int) -> float:
        if step < args.rampup:
            return args.lr * (1e-8 + (1.0 - 1e-8) * step / max(args.rampup, 1))
        if step < args.rampup + steady_steps:
            return args.lr
        decay_step = step - args.rampup - steady_steps
        return args.lr / math.sqrt(1.0 + decay_step / steady_steps)

    templates = make_templates()
    num_classes = templates.shape[0]

    # position-indexed data stream: batch i comes from a generator seeded
    # (seed, i), so a --resume at step k draws the same batches k, k+1, ...
    # an unbroken run would have — a sequential default_rng(seed) would
    # restart the stream on resume and re-train on already-consumed batches,
    # silently changing the data law vs a non-stopped run
    def draw_batch(i: int):
        rng_np = np.random.default_rng((args.seed, i))
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

    ckpt_mngr = None
    if args.ckpt_every or args.resume:
        from tinyedm_tpu.config.registry import deinstantiate
        from tinyedm_tpu.training.checkpoint import CheckpointManager

        ckpt_mngr = CheckpointManager(
            out_dir / "checkpoints", max_to_keep=None, monitor=None
        )
        ckpt_config = {"model": deinstantiate(spec), "seed": args.seed}

    start_step = 0
    if args.resume:
        restored, _ = ckpt_mngr.restore(abstract_state=state)
        state = restored
        start_step = int(state.step)
        print(f"soak: resumed at step {start_step} "
              f"({'decay' if start_step >= args.rampup + steady_steps else 'pre-decay'} phase)",
              flush=True)

    step = jax.jit(make_train_step(model, diffuser, opt_cfg, ema_cfg), donate_argnums=0)
    key = jax.random.PRNGKey(args.seed + 1)

    stop_step = min(args.stop_at, total_steps) if args.stop_at else total_steps
    if start_step >= stop_step:
        # resumed checkpoint already at/past the stop point: nothing to
        # train — exit cleanly instead of falling through to the summary
        # with no step ever run (unbound metrics / None warm timer)
        if ckpt_mngr:
            ckpt_mngr.close()
        log_f.close()
        print(f"soak: resumed step {start_step} >= stop step {stop_step}; "
              f"nothing to do", flush=True)
        print("RESULT: PASS", flush=True)
        sys.exit(0)
    # dense logging around both phase boundaries: the LR trace at the
    # rampup->steady and steady->decay transitions is the evidence VERDICT
    # r4 next #3 asks for
    boundaries = {args.rampup, args.rampup + steady_steps}
    def logged(i):
        return (i % 100 == 0 or i == stop_step - 1
                or any(abs(i - b) <= 2 for b in boundaries))

    print(f"soak: steps {start_step}..{stop_step} of {total_steps} "
          f"(rampup {args.rampup} / steady {steady_steps} / decay "
          f"{total_steps - args.rampup - steady_steps}), "
          f"mod_fp32={args.mod_fp32}, lr {args.lr}, batch {args.batch} "
          f"-> {log_path}", flush=True)
    first_loss = None
    lr_checked = 0
    t_start = time.time()
    t_warm = None
    for i in range(start_step, stop_step):
        images, cls = draw_batch(i)
        batch = (jnp.asarray(images), jnp.asarray(cls) if conditional else None)
        state, m = step(state, batch, key, jnp.asarray(float(i)))
        if i == start_step:
            # host sync so warmup excludes compile time
            _ = float(m["train_loss"])
            t_warm = time.time()
        if logged(i):
            loss = float(m["train_loss"])
            lr = float(m["learning_rate"])
            if first_loss is None:
                first_loss = loss
            expect = ref_lr(i)
            if not math.isclose(lr, expect, rel_tol=5e-5, abs_tol=1e-12):
                print(f"RESULT: FAIL (lr off formula at step {i}: "
                      f"emitted {lr!r} vs reference {expect!r})", flush=True)
                sys.exit(1)
            lr_checked += 1
            rec = {"step": i, "train_loss": loss, "lr": lr,
                   "elapsed_s": round(time.time() - t_start, 1)}
            log_f.write(json.dumps(rec) + "\n")
            log_f.flush()
            print(f"step {i}: loss {loss:.4f} lr {lr:.6f}", flush=True)
            if not math.isfinite(loss):
                print("RESULT: FAIL (non-finite loss)", flush=True)
                sys.exit(1)
        if ckpt_mngr and args.ckpt_every and (
            (i + 1) % args.ckpt_every == 0 or i == stop_step - 1
        ):
            ckpt_mngr.save(i + 1, state, config=ckpt_config)
    if ckpt_mngr:
        ckpt_mngr.wait()
        ckpt_mngr.close()
    final_loss = float(m["train_loss"])
    elapsed = time.time() - t_warm
    steps_run = stop_step - start_step
    sps = max(steps_run - 1, 1) * args.batch / elapsed
    summary = {
        "mod_fp32": args.mod_fp32, "steps": stop_step,
        "rampup": args.rampup, "steady": steady_steps,
        "decay": total_steps - args.rampup - steady_steps,
        "resumed_at": start_step if args.resume else None,
        "first_loss": first_loss, "final_loss": final_loss,
        "lr_points_on_formula": lr_checked,
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
    # a short resumed tail sits on the loss plateau; descent is asserted for
    # fresh runs, finiteness + the point-for-point LR formula for all runs
    ok = math.isfinite(final_loss) and (args.resume or final_loss < first_loss)
    print("RESULT:", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
