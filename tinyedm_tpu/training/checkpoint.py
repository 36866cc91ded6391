"""Self-describing checkpoints via Orbax.

Mirrors the reference's three cooperating mechanisms (SURVEY.md §5):
  1. top-k-by-val_loss + save-last retention (lightning ModelCheckpoint,
     conf/cifar10.yaml:59-67) -> orbax CheckpointManagerOptions(best_fn).
  2. self-describing checkpoints: the deinstantiated EDMSpec config rides in
     the checkpoint (reference: EDM.save_config/hyper_parameters,
     edm.py:152-157) so ``load_edm_from_checkpoint`` rebuilds the exact
     architecture from the file alone.
  3. EMA weights inside the checkpoint (reference keeps them in optimizer
     state, ema.py:326-336) — here the TrainState carries a *tuple* of EMA
     trees (multi-profile, post-hoc-EMA-ready) plus their sigma_rels in the
     config; ``load_ema`` selects a profile instead of swapping tensors.

Orbax gives async, multi-host-safe, sharding-aware serialization — the
TPU-idiomatic replacement for torch.save pickles.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import orbax.checkpoint as ocp

from tinyedm_tpu.training.state import TrainState


def _to_saveable(state: TrainState) -> dict:
    """TrainState -> plain nested dict (stable schema for orbax)."""
    return {
        "step": state.step,
        "params": state.params,
        "constants": state.constants,
        "opt_state": state.opt_state,
        "ema": {str(i): e for i, e in enumerate(state.ema)},
    }


def _from_saveable(tree: dict) -> TrainState:
    ema_dict = tree.get("ema", {}) or {}
    ema = tuple(ema_dict[k] for k in sorted(ema_dict, key=int))
    return TrainState(
        step=tree["step"],
        params=tree["params"],
        constants=tree["constants"],
        opt_state=tree["opt_state"],
        ema=ema,
    )


class CheckpointManager:
    """Save/restore TrainState + config with top-k retention."""

    def __init__(
        self,
        directory: str | Path,
        max_to_keep: int = 3,
        monitor: str = "val_loss",
        mode: str = "min",
        save_last: bool = True,
        async_save: bool = True,
        keep_last: int = 2,
    ):
        self.directory = Path(directory).absolute()
        self.monitor = monitor
        # a checkpoint whose metrics MISS the monitored key must rank worst,
        # not best (a m.get(monitor, 0.0) default under mode=min would pin
        # top-k to metric-less saves — e.g. fid-monitored runs where the fid
        # cadence skipped an epoch). In practice such saves never reach the
        # ranking: save() demotes them to the metric-less "last" class below,
        # so the worst-default is defense in depth only.
        worst = float("inf") if mode == "min" else float("-inf")
        best_fn = (lambda m: m.get(monitor, worst)) if monitor else None
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=best_fn,
            best_mode=mode,
            keep_checkpoints_without_metrics=save_last,
            enable_async_checkpointing=async_save,
        )
        self._mngr = ocp.CheckpointManager(self.directory, options=options)
        # orbax exempts metric-less saves from max_to_keep entirely ("never
        # deleted"), which is keep-ALL, not save-last: cadence saves between
        # validations would accumulate one full TrainState per save. Bound
        # that class ourselves: keep the newest ``keep_last`` metric-less
        # steps (2 = the latest resume point + one preemption save margin).
        # Tracked in-memory only — the same deterministic sequence runs on
        # every process, so multihost stays consistent; metric-less steps
        # from BEFORE a restart are not retro-pruned (rare, bounded per run).
        self._save_last = save_last
        self._keep_last = max(int(keep_last), 1)
        self._max_to_keep = max_to_keep
        self._metricless: list[int] = []

    def save(
        self,
        step: int,
        state: TrainState,
        config: Optional[dict] = None,
        metrics: Optional[dict] = None,
    ) -> None:
        m = {k: float(v) for k, v in (metrics or {}).items()} or None
        if m is not None and self.monitor and self.monitor not in m:
            # metrics without the monitored key: entering the top-k ranking
            # at worst would prune the NEWEST save first (e.g. a val_loss
            # save in a fid-monitored run) — demote to the protected
            # metric-less class instead; bounded retention below applies
            m = None
        args = {"state": ocp.args.StandardSave(_to_saveable(state))}
        if config is not None:
            args["config"] = ocp.args.JsonSave(config)
        self._mngr.save(step, args=ocp.args.Composite(**args), metrics=m)
        # bounded "last" class applies only to monitored top-k managers:
        # with monitor=None (e.g. the soak's keep-all manager) every save is
        # metric-less BY DESIGN and must not be pruned here
        if (
            m is None
            and self._save_last
            and self.monitor
            and self._max_to_keep is not None
        ):
            self._metricless = [s for s in self._metricless if s != step] + [step]
            while len(self._metricless) > self._keep_last:
                old = self._metricless.pop(0)
                try:
                    self._mngr.delete(old)
                except Exception:
                    pass  # already pruned or kept by other policy — harmless

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    @property
    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    @property
    def best_step(self) -> Optional[int]:
        return self._mngr.best_step()

    def restore(
        self, step: Optional[int] = None, abstract_state: Optional[TrainState] = None
    ) -> tuple[TrainState, Optional[dict]]:
        if step is None:
            step = self.latest_step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        args = {}
        if abstract_state is not None:
            args["state"] = ocp.args.StandardRestore(_to_saveable(abstract_state))
        else:
            args["state"] = ocp.args.StandardRestore()
        args["config"] = ocp.args.JsonRestore()
        try:
            out = self._mngr.restore(step, args=ocp.args.Composite(**args))
            config = out.get("config")
        except (FileNotFoundError, KeyError):
            out = self._mngr.restore(
                step, args=ocp.args.Composite(state=args["state"])
            )
            config = None
        return _from_saveable(out["state"]), config

    def close(self) -> None:
        self._mngr.close()


def save_checkpoint(
    directory: str | Path, state: TrainState, config: Optional[dict] = None
) -> None:
    """One-shot save (no retention management)."""
    mngr = CheckpointManager(Path(directory), max_to_keep=None, monitor=None, async_save=False)
    mngr.save(int(state.step), state, config)
    mngr.wait()
    mngr.close()


def load_checkpoint(
    directory: str | Path, step: Optional[int] = None
) -> tuple[TrainState, Optional[dict]]:
    mngr = CheckpointManager(Path(directory), max_to_keep=None, monitor=None, async_save=False)
    out = mngr.restore(step)
    mngr.close()
    return out


def load_edm_from_checkpoint(
    directory: str | Path,
    step: Optional[int] = None,
    load_ema: bool = False,
    ema_index: int = 0,
):
    """Reference ``EDM.load_from_checkpoint(..., load_ema=...)`` equivalent
    (edm.py:159-195): rebuild the spec/model from the embedded config and
    return the requested weights. Unlike the reference's double-load quirk
    (generate.py loads the ckpt twice and the second load can clobber the EMA
    swap — SURVEY.md §2.1), selecting EMA here is unambiguous.

    Returns (spec, model, variables, state) where variables =
    {params, constants} holds the requested (train or EMA) weights and
    ``state`` is the full restored TrainState.
    """
    from tinyedm_tpu.config.registry import instantiate

    state, config = load_checkpoint(directory, step)
    if config is None:
        raise ValueError(
            f"checkpoint at {directory} has no embedded config; pass the spec manually"
        )
    spec = instantiate(config["model"] if "model" in config else config)
    model = spec.build_model()
    if load_ema:
        if not state.ema:
            raise ValueError("EMA weights not found in the checkpoint.")
        params = state.ema[ema_index]
    else:
        params = state.params
    variables = {"params": params, "constants": state.constants}
    return spec, model, variables, state
