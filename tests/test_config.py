"""Config system tests: YAML loading, interpolation, instantiate <->
deinstantiate round-trip (reference parity: tests/test_deinstantiate.py uses
the real shipped cifar10 config as the fixture)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyedm_tpu.config.registry import (
    apply_overrides,
    deinstantiate,
    instantiate,
    load_config,
)
from tinyedm_tpu.training.experiment import EDMSpec

CONF = Path(__file__).resolve().parents[1] / "experiments" / "conf"


def test_load_config_interpolation():
    cfg = load_config(CONF / "cifar10.yaml")
    # ${model.embedding.embedding_dim} resolved
    assert cfg["model"]["denoiser"]["embedding_dim"] == 256
    assert cfg["model"]["_target_"] == "tinyedm_tpu.training.experiment.EDMSpec"


def test_overrides():
    cfg = load_config(CONF / "cifar10.yaml")
    cfg = apply_overrides(cfg, ["model.lr=0.5", "trainer.max_epochs=7"])
    assert cfg["model"]["lr"] == 0.5
    assert cfg["trainer"]["max_epochs"] == 7


def test_override_of_interpolation_source_propagates():
    """Hydra semantics: overriding model.embedding.embedding_dim must reach
    ${model.embedding.embedding_dim} references when the config is loaded
    raw (resolve=False) and overridden before resolution — the train CLI's
    path."""
    cfg = load_config(CONF / "cifar10.yaml", resolve=False)
    cfg = apply_overrides(cfg, ["model.embedding.embedding_dim=128"])
    assert cfg["model"]["denoiser"]["embedding_dim"] == 128


@pytest.mark.parametrize("name", ["mnist", "cifar10", "imagenet", "imagenet512", "smoke"])
def test_instantiate_all_shipped_configs(name):
    cfg = load_config(CONF / f"{name}.yaml")
    spec = instantiate(cfg["model"])
    assert isinstance(spec, EDMSpec)
    model = spec.build_model()
    assert model.sigma_data == 0.5
    assert spec.build_optimizer_config().lr == cfg["model"]["lr"]
    if cfg["model"]["use_ema"]:
        assert spec.build_ema_config() is not None
    # the model must at least shape-check at its native resolution
    hw = {"mnist": 28, "cifar10": 32, "imagenet": 64, "imagenet512": 64, "smoke": 16}[name]
    cin = cfg["model"]["denoiser"].get("in_channels", 3)
    v = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, hw, hw, cin)),
            jnp.ones((1,)),
            jnp.zeros((1,), jnp.int32) if model.conditional else None,
            method=model.denoise_with_aux,
        )
    )
    assert "params" in v


def test_deinstantiate_roundtrip():
    """instantiate(cfg) -> deinstantiate -> instantiate yields an equivalent
    model: identical param tree structure and shapes (the reference asserts
    load_state_dict(strict=True) compatibility)."""
    cfg = load_config(CONF / "cifar10.yaml")
    spec = instantiate(cfg["model"])
    cfg2 = deinstantiate(spec)
    spec2 = instantiate(cfg2)
    m1, m2 = spec.build_model(), spec2.build_model()

    x = jnp.zeros((1, 32, 32, 3))
    sigma = jnp.ones((1,))
    v1 = jax.eval_shape(
        lambda: m1.init({"params": jax.random.PRNGKey(0)}, x, sigma, None)
    )
    v2 = jax.eval_shape(
        lambda: m2.init({"params": jax.random.PRNGKey(0)}, x, sigma, None)
    )
    t1 = jax.tree_util.tree_structure(v1)
    t2 = jax.tree_util.tree_structure(v2)
    assert t1 == t2
    s1 = [l.shape for l in jax.tree_util.tree_leaves(v1)]
    s2 = [l.shape for l in jax.tree_util.tree_leaves(v2)]
    assert s1 == s2


def test_deinstantiate_dtype_serialization():
    cfg = load_config(CONF / "cifar10.yaml")
    spec = instantiate(cfg["model"])
    out = deinstantiate(spec)
    assert out["denoiser"]["dtype"] == "bfloat16"
    # YAML-serializable (no jnp types anywhere)
    import yaml

    yaml.safe_dump(out)


def test_reference_target_aliases():
    """tinyedm.* targets from unmodified reference YAML resolve here."""
    cfg = {
        "_target_": "tinyedm.Diffuser",
        "P_mean": -1.2,
        "P_std": 1.2,
    }
    d = instantiate(cfg)
    from tinyedm_tpu.diffusion.diffuser import Diffuser

    assert isinstance(d, Diffuser)
    assert d.P_mean == -1.2


def test_spec_validation():
    cfg = load_config(CONF / "cifar10.yaml")
    bad = dict(cfg["model"])
    bad["use_ema"] = True
    bad["ema_length"] = None
    with pytest.raises(ValueError, match="ema_length"):
        instantiate(bad)


@pytest.mark.slow
def test_imagenet512_stretch_config_shapes_and_param_count():
    """Pin the imagenet512 stretch config's abstract init (VERDICT r1 weak #7):
    EDM2 default topology on 64x64x4 latents = 272,949,794 params, denoised
    output (B, 64, 64, 4) fp32 plus a per-sample uncertainty scalar. Catches
    topology/channel typos with zero FLOPs (jax.eval_shape only)."""
    import numpy as np

    cfg = load_config(CONF / "imagenet512.yaml")
    spec = instantiate(cfg["model"])
    model = spec.build_model()
    v = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 64, 64, 4)),
            jnp.ones((1,)),
            jnp.zeros((1,), jnp.int32),
            method=model.denoise_with_aux,
        )
    )
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(v["params"]))
    assert n_params == 272_949_794
    denoised, uncertainty = jax.eval_shape(
        lambda vv: model.apply(
            vv,
            jnp.zeros((2, 64, 64, 4)),
            jnp.ones((2,)),
            jnp.zeros((2,), jnp.int32),
            method=model.denoise_with_aux,
        ),
        v,
    )
    assert denoised.shape == (2, 64, 64, 4) and denoised.dtype == jnp.float32
    assert uncertainty.shape == (2,)
    # multi-profile EMA for post-hoc reconstruction is part of the recipe
    assert len(spec.build_ema_config().sigma_rels) >= 2


class TestRegistryEdgeCases:
    def test_embedded_interpolation_substitutes(self, tmp_path):
        """'prefix${a.b}' (hydra-legal) must substitute, not pass the
        literal '${...}' through into e.g. a directory name."""
        import yaml

        from tinyedm_tpu.config.registry import load_config

        p = tmp_path / "c.yaml"
        p.write_text(yaml.safe_dump({
            "name": "run7",
            "out_dir": "runs/${name}",
            "full": "${name}",
        }))
        cfg = load_config(p)
        assert cfg["out_dir"] == "runs/run7"
        assert cfg["full"] == "run7"  # full-string keeps the value type

    def test_instantiate_recurses_into_lists(self):
        """A _target_ dict inside a list (hydra callbacks-style) must
        instantiate, not reach the constructor as a raw dict."""
        from tinyedm_tpu.config.registry import instantiate
        from tinyedm_tpu.diffusion.diffuser import Diffuser

        out = instantiate([
            {"_target_": "tinyedm_tpu.diffusion.diffuser.Diffuser",
             "P_mean": -1.2, "P_std": 1.2},
        ])
        assert isinstance(out[0], Diffuser)

    def test_override_through_scalar_names_the_override(self):
        from tinyedm_tpu.config.registry import apply_overrides

        with pytest.raises(ValueError, match="num_classes"):
            apply_overrides(
                {"model": {"num_classes": None}},
                ["model.num_classes.value=10"],
            )

    def test_yaml_solver_dtype_string_survives_instantiate(self):
        """instantiate converts any `dtype:` field to a jnp dtype class; the
        solvers (whose dtype is a string spelling) must accept that too."""
        import jax.numpy as jnp

        from tinyedm_tpu.config.registry import instantiate

        s = instantiate({
            "_target_": "tinyedm_tpu.diffusion.solver.DeterministicSolver",
            "num_steps": 4,
            "dtype": "bfloat16",
        })
        assert s.jnp_dtype == jnp.bfloat16


def test_num_classes_minus_one_is_unconditional():
    """-1 is the Embedding's unconditional sentinel: spec/model.conditional
    must be False (feeding labels would trip the Embedding's guard)."""
    from tests.test_e2e import tiny_spec

    spec = tiny_spec()
    emb = spec.embedding.clone(num_classes=-1)
    import dataclasses

    spec = dataclasses.replace(spec, embedding=emb)
    assert not spec.conditional
    assert not spec.build_model().conditional
