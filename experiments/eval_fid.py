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
  # sample counts, where FID's covariance estimate misleads

Needs an Inception feature extractor (torchvision weights) or any
``--features`` plugin module exposing ``feature_fn()``; neither network
downloads nor torchvision are available in this build environment, so this
CLI is exercised by tests with a stand-in feature function.
"""

from __future__ import annotations

import argparse
import importlib
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _feature_fn(spec: str | None):
    """Resolve --features: 'inception' (flax port / torchvision, requires
    local weights), 'proxy' (always available, validated random features),
    a module path exposing feature_fn(), or None = inception with proxy
    fallback. Returns (fn, kind) so scores are labeled."""
    from tinyedm_tpu.utils.fid import inception_features, proxy_features

    if spec == "inception":
        return inception_features(), "inception"
    if spec == "proxy":
        return proxy_features(), "proxy"
    if spec is not None:
        mod = importlib.import_module(spec)
        return mod.feature_fn(), spec
    try:
        return inception_features(), "inception"
    except FileNotFoundError:
        print(
            "WARNING: no InceptionV3 weights found - falling back to PROXY "
            "features. Proxy-FID tracks relative quality but is NOT "
            "comparable to published Inception-FID numbers."
        )
        return proxy_features(), "proxy"


def cmd_stats(args) -> None:
    from tinyedm_tpu.data.datamodules import CIFAR10DataModule
    from tinyedm_tpu.utils.fid import compute_stats_and_features, save_stats

    dm = CIFAR10DataModule(batch_size=args.batch_size, data_dir=args.data_dir)
    dm.setup()
    feature_fn, kind = _feature_fn(args.features)

    def batches():
        for start in range(0, len(dm.train_images), args.batch_size):
            yield dm.train_images[start : start + args.batch_size]

    # keep a raw feature subsample so `score --kid` works against this file
    # (kid_features 0 disables, for minimal stats files)
    mu, sigma, feats = compute_stats_and_features(
        batches(), feature_fn, max_features=args.kid_features or None
    )
    save_stats(args.out, mu, sigma, features=feats if args.kid_features else None)
    kid_note = f" + {len(feats)} KID rows" if args.kid_features else ""
    print(f"wrote stats ({len(mu)}-d {kind} features{kid_note}) to {args.out}")


def cmd_score(args) -> None:
    from tinyedm_tpu.generate import generate
    from tinyedm_tpu.utils.fid import (
        compute_stats,
        frechet_distance,
        load_stats,
        png_dir_batches,
    )

    sample_dir = args.sample_dir or tempfile.mkdtemp(prefix="fid_samples_")
    if not args.skip_generate:
        generate(
            ckpt_path=args.ckpt_path,
            load_ema=args.load_ema,
            output_dir=sample_dir,
            num_samples=args.num_samples,
            image_size=args.image_size,
            num_classes=args.num_classes if args.num_classes > 0 else None,
            batch_size=args.batch_size,
            num_steps=args.num_steps,
            mean=tuple(args.mean),
            std=tuple(args.std),
            guidance_scale=args.guidance_scale,
            guide_ckpt_path=args.guide_ckpt_path,
            guide_ckpt_step=args.guide_ckpt_step,
            guide_ema_index=args.guide_ema_index,
            guidance_sigma_min=args.guidance_sigma_min,
            guidance_sigma_max=args.guidance_sigma_max,
            solver_name=args.solver,
        )
    feature_fn, kind = _feature_fn(args.features)
    tag = "" if kind == "inception" else f"[{kind}]"
    if args.kid:
        from tinyedm_tpu.utils.fid import (
            compute_stats_and_features,
            kid_score,
            load_features,
        )

        ref_feats = load_features(args.stats)
        if ref_feats is None:
            raise SystemExit(
                f"{args.stats} has no stored feature rows - regenerate it "
                "with `stats --kid-features N` to enable KID"
            )
        mu1, s1, sample_feats = compute_stats_and_features(
            png_dir_batches(sample_dir, args.batch_size),
            feature_fn,
            max_features=max(args.kid_subset_size, len(ref_feats)),
        )
    else:
        mu1, s1 = compute_stats(png_dir_batches(sample_dir, args.batch_size), feature_fn)
    mu2, s2 = load_stats(args.stats)
    fid = frechet_distance(mu1, s1, mu2, s2)
    print(f"FID{tag}: {fid:.3f}")
    if args.kid:
        kid = kid_score(
            sample_feats,
            ref_feats,
            subset_size=args.kid_subset_size,
            num_subsets=args.kid_subsets,
        )
        # reported x 10^3 by convention (Binkowski et al. 2018)
        print(f"KID{tag}: {kid * 1e3:.4f} (x1e-3)")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="FID evaluation")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("stats", help="compute dataset reference statistics")
    ps.add_argument("--data-dir", required=True)
    ps.add_argument("--out", required=True)
    ps.add_argument("--batch-size", type=int, default=256)
    ps.add_argument("--features", default=None, help="module exposing feature_fn()")
    ps.add_argument("--kid-features", type=int, default=10000,
                    help="store a raw feature subsample of this many rows so "
                    "`score --kid` works against this stats file (0 disables)")
    ps.set_defaults(fn=cmd_stats)

    pc = sub.add_parser("score", help="generate + score a checkpoint")
    pc.add_argument("--ckpt_path", required=True)
    pc.add_argument("--stats", required=True)
    pc.add_argument("--num_samples", type=int, default=50000)
    pc.add_argument("--image_size", type=int, default=32)
    pc.add_argument("--num_classes", type=int, default=0)
    pc.add_argument("--batch_size", type=int, default=128)
    pc.add_argument("--num_steps", type=int, default=32)
    pc.add_argument("--load_ema", action="store_true")
    pc.add_argument("--mean", type=float, nargs="+", default=[0.49139968, 0.48215841, 0.44653091])
    pc.add_argument("--std", type=float, nargs="+", default=[0.24703223, 0.24348513, 0.26158784])
    pc.add_argument("--sample_dir", default=None)
    pc.add_argument("--skip_generate", action="store_true", help="score an existing --sample_dir")
    pc.add_argument("--features", default=None)
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
    pc.set_defaults(fn=cmd_score)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
