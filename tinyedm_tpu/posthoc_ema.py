"""Post-hoc EMA reconstruction CLI (EDM2, Karras et al. 2023, Algorithm 3).

The reference's README lists post-hoc EMA as unimplemented; this framework
tracks multiple power-EMA profiles during training (EDMSpec.ema_lengths) and
this tool combines EMA snapshots from one or more checkpoints into the EMA a
run with any target sigma_rel would have produced, writing a new checkpoint
usable by generate.py.

    python -m tinyedm_tpu.posthoc_ema --ckpt_path runs/x/checkpoints \
        --target_sigma_rel 0.10 --out_dir runs/x/posthoc_010
"""

from __future__ import annotations

import argparse



def reconstruct(
    ckpt_path: str,
    target_sigma_rel: float,
    out_dir: str,
    steps: list[int] | None = None,
) -> None:
    from tinyedm_tpu.config.registry import instantiate
    from tinyedm_tpu.training.checkpoint import (
        CheckpointManager,
        load_checkpoint,
        save_checkpoint,
    )
    from tinyedm_tpu.training.ema import reconstruct_posthoc_ema, sigma_rel_to_gamma
    from tinyedm_tpu.training.state import TrainState

    mngr = CheckpointManager(ckpt_path, max_to_keep=None, monitor=None, async_save=False)
    all_steps = steps
    if not all_steps:  # None OR an explicitly empty --steps list
        all_steps = [mngr.latest_step]
    snapshots, snap_steps, snap_gammas = [], [], []
    config = None
    state = None
    spec = None
    for s in all_steps:
        state, config = mngr.restore(s)
        spec_cfg = config["model"] if config and "model" in config else None
        if spec_cfg is None:
            raise ValueError("checkpoint lacks embedded config")
        spec = instantiate(spec_cfg)
        ema_cfg = spec.build_ema_config()
        if ema_cfg is None or not state.ema:
            raise ValueError(f"checkpoint step {s} has no EMA profiles")
        if len(state.ema) != len(ema_cfg.gammas):
            # e.g. interop-imported checkpoints store exactly one EMA tree
            # regardless of what the config declares — zipping would pair
            # trees with the wrong gammas and produce a plausible-looking
            # but WRONG reconstruction
            raise ValueError(
                f"checkpoint step {s} stores {len(state.ema)} EMA tree(s) "
                f"but its config declares {len(ema_cfg.gammas)} profile(s) "
                f"(sigma_rels {tuple(ema_cfg.sigma_rels)}); cannot pair "
                "trees with gammas unambiguously"
            )
        for tree, gamma in zip(state.ema, ema_cfg.gammas):
            snapshots.append(tree)
            snap_steps.append(int(state.step))
            snap_gammas.append(gamma)
    mngr.close()

    print(
        f"combining {len(snapshots)} EMA snapshots "
        f"(gammas {[round(g,2) for g in snap_gammas]}, steps {snap_steps}) "
        f"-> sigma_rel={target_sigma_rel} (gamma={sigma_rel_to_gamma(target_sigma_rel):.3f})"
    )
    combined = reconstruct_posthoc_ema(
        snapshots, snap_steps, snap_gammas, target_sigma_rel
    )
    new_state = TrainState(
        step=state.step,
        params=combined,  # reconstructed EMA becomes the live params
        constants=state.constants,
        opt_state=state.opt_state,
        ema=(combined,),
    )
    # the written checkpoint carries ONE combined EMA tree at
    # target_sigma_rel — rewrite the embedded config to say so, or its
    # metadata would still describe the source run's profile list (a
    # training resume would expect N trees and find 1; an interop export
    # would label the tree with the source profile's sigma_rel/gamma)
    import dataclasses

    from tinyedm_tpu.config.registry import deinstantiate

    out_spec = dataclasses.replace(
        spec,
        use_ema=True,
        ema_length=target_sigma_rel,
        ema_lengths=None,
        val_ema_index=0,
    )
    out_config = dict(config)
    out_config["model"] = deinstantiate(out_spec)
    save_checkpoint(out_dir, new_state, out_config)
    print(f"wrote reconstructed checkpoint to {out_dir}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Post-hoc EMA reconstruction")
    p.add_argument("--ckpt_path", required=True)
    p.add_argument("--target_sigma_rel", type=float, required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument(
        "--steps",
        type=int,
        nargs="*",
        default=None,
        help="checkpoint steps to combine (default: latest only)",
    )
    args = p.parse_args(argv)
    reconstruct(args.ckpt_path, args.target_sigma_rel, args.out_dir, args.steps)


if __name__ == "__main__":
    main()
