"""Training CLI — `python experiments/train.py --config-name=cifar10`.

Same surface as the reference Hydra entry (experiments/train.py:8-36):
--config-name selects a YAML under experiments/conf/, trailing key=value
arguments are dotted overrides, --resume continues from the latest
checkpoint in out_dir (the ckpt_path resume of train.py:30-36).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tinyedm_tpu.config.registry import apply_overrides, deinstantiate, instantiate, load_config  # noqa: E402


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Train an EDM diffusion model on TPU")
    parser.add_argument("--config-name", required=True, help="conf/<name>.yaml")
    parser.add_argument("--config-path", default=str(Path(__file__).parent / "conf"))
    parser.add_argument("--resume", action="store_true", help="resume from latest checkpoint")
    parser.add_argument("--max-epochs", type=int, default=None)
    parser.add_argument(
        "--multihost",
        action="store_true",
        help="call jax.distributed.initialize() for multi-host meshes "
        "(ICI within a slice, DCN across slices)",
    )
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = parser.parse_args(argv)

    cfg = load_config(
        Path(args.config_path) / f"{args.config_name}.yaml",
        resolve=not args.overrides,
    )
    if args.overrides:
        # overrides land on the raw tree; interpolations resolve afterwards,
        # so overriding e.g. model.embedding.embedding_dim propagates into
        # ${model.embedding.embedding_dim} references (hydra semantics)
        cfg = apply_overrides(cfg, args.overrides)
    if args.max_epochs is not None:
        cfg["trainer"]["max_epochs"] = args.max_epochs

    import jax

    if args.multihost:
        jax.distributed.initialize()

    from tinyedm_tpu.training.trainer import Trainer
    from tinyedm_tpu.utils.logging import MetricLogger
    from tinyedm_tpu.utils.tpu import tune_for_tpu

    tune_for_tpu()

    seed = cfg.get("seed", 42)
    tcfg = cfg.get("trainer", {})
    # reference: logger.watch(model, log="all", log_freq=500) (train.py:28,
    # conf/cifar10.yaml wandb_watch) -> grad/param norms from the jitted step
    watch_cfg = cfg.get("wandb_watch") or {}
    spec = instantiate(
        cfg["model"],
        accum_steps=tcfg.get("accumulate_grad_batches", 1),
        log_norms=bool(watch_cfg.get("enabled", bool(watch_cfg))),
        # per-layer fidelity (reference log="all" logs per-parameter
        # histograms; this emits per-module-group norms — opt-in, see
        # docs/CONFIG.md for the measured cost)
        log_norms_per_layer=bool(watch_cfg.get("per_layer", False)),
    )
    datamodule = instantiate(cfg["datamodule"])
    if hasattr(datamodule, "seed"):
        datamodule.seed = seed

    callbacks = []
    ckpt_cfg = {}
    for name, cb_cfg in (cfg.get("callbacks") or {}).items():
        if name == "checkpoint_callback":
            ckpt_cfg = cb_cfg or {}
        elif cb_cfg and "_target_" in cb_cfg:
            callbacks.append(instantiate(cb_cfg))

    wandb_cfg = cfg.get("wandb_logger") or {}
    out_dir = tcfg.get("out_dir", f"runs/{args.config_name}")
    logger = MetricLogger(
        out_dir,
        use_wandb=bool(wandb_cfg.get("enabled", False)),
        wandb_kwargs={k: v for k, v in wandb_cfg.items() if k != "enabled"},
    )

    trainer = Trainer(
        spec=spec,
        datamodule=datamodule,
        max_epochs=tcfg.get("max_epochs", 1),
        check_val_every_n_epoch=tcfg.get("check_val_every_n_epoch", 10),
        callbacks=callbacks,
        logger=logger,
        out_dir=out_dir,
        ckpt_every_n_epochs=ckpt_cfg.get("every_n_epochs", 100),
        ckpt_top_k=ckpt_cfg.get("save_top_k", 3),
        ckpt_save_last=ckpt_cfg.get("save_last", True),
        # lightning ModelCheckpoint monitor/mode parity; monitor: fid selects
        # by the FIDCallback's sample-quality series instead of val_loss
        ckpt_monitor=ckpt_cfg.get("monitor", "val_loss"),
        ckpt_mode=ckpt_cfg.get("mode", "min"),
        log_every_n_steps=tcfg.get("log_every_n_steps", 50),
        seed=seed,
        config={"model": deinstantiate(spec), "seed": seed},
        # ZeRO-1: shard Adam moments + EMA trees over the mesh data axis
        # (memory knob for the 272.9M latent configs on real meshes;
        # equivalent up to float reduction order — see docs/CONFIG.md)
        zero1=bool(tcfg.get("zero1", False)),
        # tensor parallelism: reshape the mesh to (devices/N, N) and shard
        # every weight-normed kernel's output channels over ``model``
        model_parallel=int(tcfg.get("model_parallel", 1)),
        # ship uint8 + flip flags and normalize/flip inside the jitted step
        # (uint8 datamodules only; inputs match the host pipeline to 1 ulp —
        # see trainer.py and docs/PERFORMANCE.md for the measured gain)
        device_preprocess=bool(tcfg.get("device_preprocess", False)),
    )
    print(f"devices: {jax.devices()}")
    trainer.fit(resume=args.resume)


if __name__ == "__main__":
    main()
