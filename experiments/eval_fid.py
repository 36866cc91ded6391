"""End-to-end FID evaluation: generate 50k samples from a checkpoint and
score them against dataset statistics (the protocol behind the reference's
headline CIFAR-10 FID 4.0 — 50k samples, 32-step Heun, batch 128;
reference README.md:52-62; the reference ships no FID code, SURVEY.md §7.3).

Usage:
  # one-time: reference statistics from the real dataset
  python experiments/eval_fid.py stats --data-dir datasets/cifar10 --out cifar_stats.npz
  # evaluate a checkpoint
  python experiments/eval_fid.py score --ckpt_path runs/cifar10/checkpoints \
      --stats cifar_stats.npz --num_samples 50000 --load_ema
  # --kid additionally reports Kernel Inception Distance (Binkowski et al.
  # 2018) from feature rows stored in the stats file — unbiased at small
  # sample counts, where FID's covariance estimate misleads; --prdc adds
  # precision/recall/density/coverage (Naeem et al. 2020)
  # score every retained checkpoint (x EMA profile) and print the best
  python experiments/eval_fid.py sweep --ckpt_path runs/cifar10/checkpoints \
      --stats cifar_stats.npz --load_ema --ema_indices 0 1

Needs an Inception feature extractor (torchvision weights) or any
``--features`` plugin module exposing ``feature_fn()``; neither network
downloads nor torchvision are available in this build environment, so this
CLI is exercised by tests with a stand-in feature function.
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _feature_fn(spec: str | None):
    """Resolve --features (see tinyedm_tpu.utils.fid.resolve_feature_fn)."""
    from tinyedm_tpu.utils.fid import resolve_feature_fn

    return resolve_feature_fn(spec)


def cmd_stats(args) -> None:
    from tinyedm_tpu.utils.fid import (
        compute_stats,
        compute_stats_and_features,
        png_dir_batches,
        save_stats,
    )

    feature_fn, kind = _feature_fn(args.features)

    if args.format == "png_dir":
        # any directory of images (e.g. an extracted dataset or another
        # model's samples) — no dataset-specific parser needed
        batches = lambda: png_dir_batches(args.data_dir, args.batch_size)
    else:
        from tinyedm_tpu.data.datamodules import CIFAR10DataModule, MNISTDataModule

        cls = {"cifar10": CIFAR10DataModule, "mnist": MNISTDataModule}[args.format]
        dm = cls(batch_size=args.batch_size, data_dir=args.data_dir)
        dm.setup()

        def batches():
            for start in range(0, len(dm.train_images), args.batch_size):
                yield dm.train_images[start : start + args.batch_size]

    # keep a raw feature subsample so `score --kid` works against this file
    # (kid_features 0 disables, for minimal stats files — and must take the
    # moments-only path: max_features=None means an UNBOUNDED reservoir)
    if args.kid_features:
        mu, sigma, feats = compute_stats_and_features(
            batches(), feature_fn, max_features=args.kid_features
        )
    else:
        mu, sigma = compute_stats(batches(), feature_fn)
        feats = None
    save_stats(args.out, mu, sigma, features=feats)
    kid_note = f" + {len(feats)} KID rows" if feats is not None else ""
    print(f"wrote stats ({len(mu)}-d {kind} features{kid_note}) to {args.out}")


def _generate_samples(args, sample_dir, ckpt_step=None, ema_index=None) -> None:
    from tinyedm_tpu.generate import generate

    generate(
        ckpt_path=args.ckpt_path,
        load_ema=args.load_ema,
        output_dir=sample_dir,
        seed=args.seed,
        num_samples=args.num_samples,
        image_size=args.image_size,
        num_classes=args.num_classes if args.num_classes > 0 else None,
        batch_size=args.batch_size,
        num_steps=args.num_steps,
        num_channels=args.num_channels,
        mean=tuple(args.mean),
        std=tuple(args.std),
        ckpt_step=ckpt_step,
        ema_index=ema_index if ema_index is not None else 0,
        guidance_scale=args.guidance_scale,
        guide_ckpt_path=args.guide_ckpt_path,
        guide_ckpt_step=args.guide_ckpt_step,
        guide_ema_index=args.guide_ema_index,
        guidance_sigma_min=args.guidance_sigma_min,
        guidance_sigma_max=args.guidance_sigma_max,
        solver_name=args.solver,
    )


def _score_sample_dir(args, sample_dir, feature_fn) -> dict:
    """FID (and optionally KID) of a PNG directory against args.stats."""
    from tinyedm_tpu.utils.fid import (
        compute_stats,
        compute_stats_and_features,
        frechet_distance,
        kid_score,
        load_features,
        load_stats,
        png_dir_batches,
    )

    need_feats = args.kid or args.prdc
    if need_feats:
        ref_feats = load_features(args.stats)
        if ref_feats is None:
            raise SystemExit(
                f"{args.stats} has no stored feature rows - regenerate it "
                "with `stats --kid-features N` to enable KID/PRDC"
            )
        mu1, s1, sample_feats = compute_stats_and_features(
            png_dir_batches(sample_dir, args.batch_size),
            feature_fn,
            max_features=max(args.kid_subset_size, len(ref_feats)),
        )
    else:
        mu1, s1 = compute_stats(png_dir_batches(sample_dir, args.batch_size), feature_fn)
    mu2, s2 = load_stats(args.stats)
    out = {"fid": frechet_distance(mu1, s1, mu2, s2)}
    if args.kid:
        out["kid"] = kid_score(
            sample_feats,
            ref_feats,
            subset_size=args.kid_subset_size,
            num_subsets=args.kid_subsets,
        )
    if args.prdc:
        from tinyedm_tpu.utils.fid import prdc

        out.update(prdc(ref_feats, sample_feats, k=args.prdc_k))
    return out


def cmd_score(args) -> None:
    if args.skip_generate and not args.sample_dir:
        # scoring a freshly created EMPTY temp dir would die much later
        # with an unrelated "need at least 2 samples for covariance"
        raise SystemExit("--skip_generate requires --sample_dir")
    sample_dir = args.sample_dir or tempfile.mkdtemp(prefix="fid_samples_")
    if not args.skip_generate:
        _generate_samples(args, sample_dir)
    feature_fn, kind = _feature_fn(args.features)
    tag = "" if kind == "inception" else f"[{kind}]"
    res = _score_sample_dir(args, sample_dir, feature_fn)
    print(f"FID{tag}: {res['fid']:.3f}")
    if args.kid:
        # reported x 10^3 by convention (Binkowski et al. 2018)
        print(f"KID{tag}: {res['kid'] * 1e3:.4f} (x1e-3)")
    if args.prdc:
        print(
            f"PRDC{tag}: precision {res['precision']:.3f}  recall "
            f"{res['recall']:.3f}  density {res['density']:.3f}  coverage "
            f"{res['coverage']:.3f}"
        )


def _result_note(args, res, tag) -> str:
    note = f"  KID{tag}: {res['kid'] * 1e3:.4f} (x1e-3)" if args.kid else ""
    if args.prdc:
        note += (
            f"  P {res['precision']:.3f} R {res['recall']:.3f}"
            f" D {res['density']:.3f} C {res['coverage']:.3f}"
        )
    return note


def _sweep_progress(n_configs: int, args):
    """Upfront cost summary + per-config ETA for the sweep (the 50k protocol
    is minutes per configuration on one chip; make the bill visible before
    the meter starts). Returns a tick(label) callback."""
    import time

    fwd = (2 * args.num_steps - 1) if args.solver == "heun" else args.num_steps
    # guided solves run the stacked 2B (cond, guide) forward per step;
    # CFG at scale 1.0 short-circuits to the plain model (generate.py) so
    # it must not be billed x2 — autoguidance keeps its 2 forwards at any
    # scale (a second model supplies the guide branch)
    if args.guidance_scales:
        n_guided = sum(
            1
            for s in args.guidance_scales
            if args.guide_ckpt_path is not None or s != 1.0
        )
    else:
        guided = args.guide_ckpt_path is not None or args.guidance_scale not in (
            None,
            1.0,
        )
        n_guided = n_configs if guided else 0
    total = args.num_samples * fwd * (n_configs + n_guided)
    guided = n_guided > 0
    print(
        f"sweep: {n_configs} configs x {args.num_samples} samples x "
        f"{fwd} solver forwards ({args.solver}, num_steps={args.num_steps})"
        + (f" (+{n_guided} guided configs x2)" if guided else "")
        + f" = {total / 1e6:.1f}M model forwards total; "
        f"shared noise bank (seed {args.seed}) - rows differ by "
        "model/EMA/guidance only, not sampling noise"
    )
    t0 = time.time()
    done = 0

    def tick(label: str) -> None:
        nonlocal done
        done += 1
        dt = time.time() - t0
        eta = dt / done * (n_configs - done)
        print(
            f"[{done}/{n_configs}] {label}: {dt / done:.0f}s/config avg"
            + (f", ETA {eta / 60:.1f} min" if done < n_configs else "")
        )

    return tick


def cmd_sweep(args) -> None:
    """Score every checkpoint step (x EMA profile) in one run — checkpoint
    selection by sample quality, the missing half of the reference's
    top-k-by-val_loss retention (EDM2 selects snapshots by FID).

    With --posthoc_sigma_rels, sweeps reconstructed post-hoc EMA profiles
    instead: for each target sigma_rel, combine the checkpoint's tracked EMA
    snapshots (EDM2 Algorithm 3) into the EMA a run with that sigma_rel would
    have produced, then generate-and-score it — the EDM2 paper's actual
    sigma_rel-selection workflow, one command.

    With --guidance_scales, sweeps the guidance strength at a fixed
    checkpoint: CFG scale without --guide_ckpt_path, autoguidance scale with
    it (Karras et al. 2024 select the scale by FID — Table 2 sweeps it per
    model). Composes with --guidance_sigma_min/max (limited-interval) and
    --prdc, whose precision-vs-recall decomposition is what the scale
    trades off."""
    feature_fn, kind = _feature_fn(args.features)
    tag = "" if kind == "inception" else f"[{kind}]"
    base = Path(args.sample_dir or tempfile.mkdtemp(prefix="fid_sweep_"))
    rows = []

    if args.guidance_scales and args.posthoc_sigma_rels:
        raise SystemExit("--guidance_scales and --posthoc_sigma_rels are "
                         "separate sweep axes - pass one")
    for flag, vals in (("--guidance_scales", args.guidance_scales),
                       ("--posthoc_sigma_rels", args.posthoc_sigma_rels),
                       ("--steps", args.steps),
                       ("--ema_indices", args.ema_indices if args.load_ema else None)):
        # nargs="*" permits an empty list; falling through to the full
        # every-checkpoint sweep on a swallowed value would silently start
        # hours of unintended generation — error instead
        if vals is not None and not vals:
            raise SystemExit(f"{flag} needs at least one value")
    if not args.load_ema and args.ema_indices != [0]:
        # an explicit --ema_indices without --load_ema would silently score
        # the RAW weights once per step while the user expected EMA rows
        raise SystemExit("--ema_indices needs --load_ema")
    if args.guidance_scales:
        tick = _sweep_progress(len(args.guidance_scales), args)
        for scale in args.guidance_scales:
            sdir = base / f"gs{scale:g}"
            sub = argparse.Namespace(**vars(args))
            sub.guidance_scale = scale
            _generate_samples(
                sub,
                str(sdir),
                ckpt_step=args.ckpt_step,
                ema_index=args.ema_indices[0] if args.load_ema else None,
            )
            res = _score_sample_dir(args, sdir, feature_fn)
            rows.append((f"guidance_scale {scale:g}", res))
            print(f"guidance_scale {scale:g}  FID{tag}: {res['fid']:.3f}"
                  f"{_result_note(args, res, tag)}")
            tick(f"guidance_scale {scale:g}")
    elif args.posthoc_sigma_rels:
        from tinyedm_tpu.posthoc_ema import reconstruct

        tick = _sweep_progress(len(args.posthoc_sigma_rels), args)
        for sr in args.posthoc_sigma_rels:
            ckpt_dir = base / f"posthoc_{sr:g}" / "ckpt"
            reconstruct(args.ckpt_path, sr, str(ckpt_dir), steps=args.steps)
            sdir = base / f"posthoc_{sr:g}" / "samples"
            sub = argparse.Namespace(**vars(args))
            sub.ckpt_path = str(ckpt_dir)
            sub.load_ema = True  # reconstructed EMA is profile 0
            _generate_samples(sub, str(sdir), ema_index=0)
            res = _score_sample_dir(args, sdir, feature_fn)
            rows.append((f"sigma_rel {sr:g}", res))
            print(f"sigma_rel {sr:g}  FID{tag}: {res['fid']:.3f}{_result_note(args, res, tag)}")
            tick(f"sigma_rel {sr:g}")
    else:
        ckpt_root = Path(args.ckpt_path)
        steps = args.steps or sorted(
            int(p.name) for p in ckpt_root.iterdir() if p.is_dir() and p.name.isdigit()
        )
        if not steps:
            raise SystemExit(f"no checkpoint step directories under {ckpt_root}")
        ema_indices = args.ema_indices if args.load_ema else [None]
        tick = _sweep_progress(len(steps) * len(ema_indices), args)
        for step in steps:
            for ema_index in ema_indices:
                name = f"step{step}" + (
                    f"_ema{ema_index}" if ema_index is not None else ""
                )
                sdir = base / name
                _generate_samples(args, str(sdir), ckpt_step=step, ema_index=ema_index)
                res = _score_sample_dir(args, sdir, feature_fn)
                rows.append((f"step {step:>8}  ema {ema_index}", res))
                print(f"step {step:>8}  ema {ema_index}  FID{tag}: {res['fid']:.3f}{_result_note(args, res, tag)}")
                tick(f"step {step} ema {ema_index}")
    best = min(rows, key=lambda r: r[1]["fid"])
    print(f"BEST: {best[0]} FID{tag}: {best[1]['fid']:.3f}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="FID evaluation")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("stats", help="compute dataset reference statistics")
    ps.add_argument("--data-dir", required=True)
    ps.add_argument("--out", required=True)
    ps.add_argument("--batch-size", type=int, default=256)
    ps.add_argument("--features", default=None, help="module exposing feature_fn()")
    ps.add_argument("--format", default="cifar10",
                    choices=["cifar10", "mnist", "png_dir"],
                    help="dataset layout: cifar10 pickle batches, raw MNIST "
                    "idx files, or any directory of images")
    ps.add_argument("--kid-features", type=int, default=10000,
                    help="store a raw feature subsample of this many rows so "
                    "`score --kid/--prdc` works against this stats file "
                    "(0 disables)")
    ps.set_defaults(fn=cmd_stats)

    def add_common(pc):
        pc.add_argument("--ckpt_path", required=True)
        pc.add_argument("--stats", required=True)
        pc.add_argument("--num_samples", type=int, default=50000)
        pc.add_argument("--image_size", type=int, default=32)
        pc.add_argument("--num_classes", type=int, default=0)
        pc.add_argument("--batch_size", type=int, default=128)
        pc.add_argument("--num_steps", type=int, default=32)
        pc.add_argument(
            "--num_channels", type=int, default=3,
            help="sample channels (1 for MNIST checkpoints, 4 for latent-space models)",
        )
        pc.add_argument("--load_ema", action="store_true")
        pc.add_argument("--mean", type=float, nargs="+", default=[0.49139968, 0.48215841, 0.44653091])
        pc.add_argument("--std", type=float, nargs="+", default=[0.24703223, 0.24348513, 0.26158784])
        pc.add_argument("--sample_dir", default=None)
        pc.add_argument("--features", default=None)
        pc.add_argument("--seed", type=int, default=0,
                        help="noise-bank seed. Every sweep configuration "
                        "solves from the SAME per-index initial noise "
                        "(common random numbers) — differences between rows "
                        "are then model/EMA/guidance differences, not "
                        "sampling noise")
        pc.add_argument("--guidance_scale", type=float, default=None,
                        help="classifier-free guidance scale (conditional models)")
        pc.add_argument("--guide_ckpt_path", default=None,
                        help="autoguidance: weaker-model checkpoint for the guide branch")
        pc.add_argument("--guide_ckpt_step", type=int, default=None)
        pc.add_argument("--guide_ema_index", type=int, default=0)
        pc.add_argument("--guidance_sigma_min", type=float, default=0.0,
                        help="limited-interval guidance: guide only in (min, max]")
        pc.add_argument("--guidance_sigma_max", type=float, default=float("inf"))
        pc.add_argument("--solver", default="heun", choices=["heun", "dpmpp2m"],
                        help="heun (reference, 2n-1 forwards) | dpmpp2m (n forwards)")
        pc.add_argument("--kid", action="store_true",
                        help="also report Kernel Inception Distance (unbiased at "
                        "small sample counts; needs stats saved with --kid-features)")
        pc.add_argument("--kid_subset_size", type=int, default=1000)
        pc.add_argument("--kid_subsets", type=int, default=100)
        pc.add_argument("--prdc", action="store_true",
                        help="also report precision/recall/density/coverage "
                        "(Naeem et al. 2020) — the fidelity-vs-diversity "
                        "decomposition; needs stats saved with --kid-features")
        pc.add_argument("--prdc_k", type=int, default=5,
                        help="k for the k-NN manifold balls")

    pc = sub.add_parser("score", help="generate + score a checkpoint")
    add_common(pc)
    pc.add_argument("--skip_generate", action="store_true", help="score an existing --sample_dir")
    pc.set_defaults(fn=cmd_score)

    pw = sub.add_parser(
        "sweep", help="score every checkpoint step (x EMA profile); prints the best"
    )
    add_common(pw)
    pw.add_argument("--steps", type=int, nargs="*", default=None,
                    help="checkpoint steps to score (default: all found); "
                    "with --posthoc_sigma_rels: the snapshot steps to combine")
    pw.add_argument("--ema_indices", type=int, nargs="*", default=[0],
                    help="EMA profiles to score per step (with --load_ema)")
    pw.add_argument("--posthoc_sigma_rels", type=float, nargs="*", default=None,
                    help="sweep RECONSTRUCTED post-hoc EMA profiles at these "
                    "target sigma_rels instead of checkpoint steps (EDM2 "
                    "Algorithm 3 + generate + score per value)")
    pw.add_argument("--guidance_scales", type=float, nargs="*", default=None,
                    help="sweep the guidance strength at a fixed checkpoint "
                    "(CFG, or autoguidance with --guide_ckpt_path) — select "
                    "the scale by FID, the Karras et al. 2024 workflow")
    pw.add_argument("--ckpt_step", type=int, default=None,
                    help="fix the checkpoint step for --guidance_scales "
                    "(default: latest)")
    pw.set_defaults(fn=cmd_sweep)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
