"""Config system: ``_target_`` object trees + interpolation + the inverse map.

Reproduces the reference's Hydra surface (experiments/train.py:14-25 uses
``hydra.utils.instantiate``; src/tinyedm/utils.py:5-27 implements the inverse
``deinstantiate`` by reflection) without depending on Hydra: YAML trees whose
dicts carry ``_target_`` dotted paths are instantiated recursively, OmegaConf
``${a.b.c}`` interpolations are resolved against the root config, and
``deinstantiate`` reflects dataclass/flax-module fields back into a plain
config dict — making checkpoints self-describing (SURVEY.md §5 checkpoint).

Reference-compatible aliases: ``tinyedm.X`` targets resolve to their
``tinyedm_tpu`` equivalents so existing YAML configs port by search-replace
(or no edit at all).
"""

from __future__ import annotations

import dataclasses
import importlib
import re
from pathlib import Path
from typing import Any, Mapping

import jax.numpy as jnp
import yaml

_TARGET_KEY = "_target_"

# dtype field serialization
_DTYPE_NAMES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
    "float64": jnp.float64,
}
_DTYPE_TO_NAME = {v: k for k, v in _DTYPE_NAMES.items()}

# reference-API target aliases (tinyedm.* -> tinyedm_tpu.*)
TARGET_ALIASES = {
    "tinyedm.EDM": "tinyedm_tpu.training.experiment.EDMSpec",
    "tinyedm.Diffuser": "tinyedm_tpu.diffusion.diffuser.Diffuser",
    "tinyedm.Embedding": "tinyedm_tpu.models.layers.Embedding",
    "tinyedm.Denoiser": "tinyedm_tpu.models.unet.Denoiser",
    "tinyedm.DenoiserWrapper": "tinyedm_tpu.models.unet.DenoiserWrapper",
    "tinyedm.DeterministicSolver": "tinyedm_tpu.diffusion.solver.DeterministicSolver",
    "tinyedm.callbacks.GenerateCallback": "tinyedm_tpu.training.callbacks.GenerateCallback",
    "tinyedm.callbacks.LatentsGenerateCallback": "tinyedm_tpu.training.callbacks.LatentsGenerateCallback",
    "tinyedm.PreditionWriter": "tinyedm_tpu.training.callbacks.PreditionWriter",
    "tinyedm.datamodules.MNISTDataModule": "tinyedm_tpu.data.datamodules.MNISTDataModule",
    "tinyedm.datamodules.CIFAR10DataModule": "tinyedm_tpu.data.datamodules.CIFAR10DataModule",
    "tinyedm.datamodules.ImageNetLatentsDataModule": "tinyedm_tpu.data.datamodules.ImageNetLatentsDataModule",
    "tinyedm.datamodules.RandomNoiseDataModule": "tinyedm_tpu.data.datamodules.RandomNoiseDataModule",
}


def resolve_target(target: str) -> Any:
    """Import the object named by a dotted path (with alias support)."""
    target = TARGET_ALIASES.get(target, target)
    module_name, _, attr = target.rpartition(".")
    if not module_name:
        raise ValueError(f"invalid _target_: {target!r}")
    module = importlib.import_module(module_name)
    return getattr(module, attr)


_INTERP_RE = re.compile(r"^\$\{([a-zA-Z0-9_.]+)\}$")
_EMBED_RE = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


def _lookup(root: Mapping[str, Any], path: str) -> Any:
    cur: Any = root
    for part in path.split("."):
        cur = cur[part]
    return cur


def _resolve_interpolations(node: Any, root: Mapping[str, Any]) -> Any:
    if isinstance(node, str):
        m = _INTERP_RE.match(node)
        if m:
            # full-string interpolation keeps the referenced value's TYPE
            return _resolve_interpolations(_lookup(root, m.group(1)), root)
        if "${" in node:
            # embedded interpolation ("runs/${name}"): hydra-legal, so
            # substitute stringified values — silently passing the literal
            # "${...}" through (the old behavior) created directories named
            # after the unresolved expression
            return _EMBED_RE.sub(
                lambda mm: str(_resolve_interpolations(_lookup(root, mm.group(1)), root)),
                node,
            )
        return node
    if isinstance(node, Mapping):
        return {k: _resolve_interpolations(v, root) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return type(node)(_resolve_interpolations(v, root) for v in node)
    return node


def load_config(path: str | Path, resolve: bool = True) -> dict:
    """Load a YAML experiment config; resolves ${...} interpolations unless
    ``resolve=False`` (use that when CLI overrides follow — hydra semantics:
    overriding an interpolation SOURCE must propagate to its references, so
    resolution happens after overrides in apply_overrides)."""
    with open(path) as f:
        cfg = yaml.safe_load(f)
    return _resolve_interpolations(cfg, cfg) if resolve else cfg


def apply_overrides(cfg: dict, overrides: list[str]) -> dict:
    """Hydra-style dotted CLI overrides: ``a.b.c=value`` (YAML-parsed value)."""
    for ov in overrides:
        key, _, raw = ov.partition("=")
        value = yaml.safe_load(raw)
        cur = cfg
        parts = key.split(".")
        for i, p in enumerate(parts[:-1]):
            if not isinstance(cur, Mapping):
                # descending through an existing scalar/null: name the
                # malformed override instead of a bare AttributeError
                raise ValueError(
                    f"override {ov!r}: {'.'.join(parts[:i])!r} is not a "
                    f"mapping (found {type(cur).__name__})"
                )
            cur = cur.setdefault(p, {})
        if not isinstance(cur, Mapping):
            raise ValueError(
                f"override {ov!r}: {'.'.join(parts[:-1])!r} is not a "
                f"mapping (found {type(cur).__name__})"
            )
        cur[parts[-1]] = value
    return _resolve_interpolations(cfg, cfg)


def instantiate(cfg: Any, **overrides: Any) -> Any:
    """Recursively build the object tree described by a ``_target_`` config."""
    if isinstance(cfg, Mapping):
        if _TARGET_KEY in cfg:
            cls = resolve_target(cfg[_TARGET_KEY])
            kwargs = {
                k: instantiate(v) for k, v in cfg.items() if k != _TARGET_KEY
            }
            kwargs.update(overrides)
            if "dtype" in kwargs and isinstance(kwargs["dtype"], str):
                kwargs["dtype"] = _DTYPE_NAMES[kwargs["dtype"]]
            # YAML has no tuples; dataclass fields declared as tuples get lists —
            # convert shallow lists of scalars to tuples for hashability (flax
            # module fields must be hashable)
            kwargs = {
                k: tuple(v) if isinstance(v, list) else v for k, v in kwargs.items()
            }
            return cls(**kwargs)
        return {k: instantiate(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        # hydra recurses into sequences: a _target_ dict inside a list
        # (e.g. a callbacks list) must instantiate, not reach the
        # constructor as a raw dict
        return type(cfg)(instantiate(v) for v in cfg)
    return cfg


def deinstantiate(obj: Any) -> Any:
    """Reflect an object tree back into a ``_target_`` config dict.

    Works for dataclasses (which includes every flax.linen module and this
    framework's config dataclasses). Inverse of ``instantiate`` — tested as a
    round-trip like the reference (tests/test_deinstantiate.py).
    """
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        cls = type(obj)
        out: dict[str, Any] = {_TARGET_KEY: f"{cls.__module__}.{cls.__qualname__}"}
        for f in dataclasses.fields(obj):
            if not f.init or f.name in ("parent", "name"):  # flax internals
                continue
            out[f.name] = deinstantiate(getattr(obj, f.name))
        return out
    if isinstance(obj, Mapping):
        return {k: deinstantiate(v) for k, v in obj.items()}
    if isinstance(obj, tuple):
        return [deinstantiate(v) for v in obj]
    if isinstance(obj, list):
        return [deinstantiate(v) for v in obj]
    if isinstance(obj, type) and obj in _DTYPE_TO_NAME:
        return _DTYPE_TO_NAME[obj]
    return obj
