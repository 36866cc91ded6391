"""Tensor parallelism over the mesh ``model`` axis (beyond the reference,
whose only strategy is DDP — SURVEY.md §2.3/§2.4).

The design under test (parallel/mesh.py::tp_param_spec/state_shardings):
every weight-normed kernel shards its OUTPUT-channel axis over ``model``;
GSPMD derives the activation shardings and inserts the contraction psums.
Params, Adam moments, and EMA trees share the layout, so optimizer + EMA +
forced weight renorm all stay shard-local.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tinyedm_tpu.diffusion.diffuser import Diffuser
from tinyedm_tpu.parallel.mesh import (
    MODEL_AXIS,
    ShardingPlan,
    make_mesh,
    place_state,
    replicate_state,
    shard_batch,
    tp_param_spec,
)
from tinyedm_tpu.training.ema import EMAConfig
from tinyedm_tpu.training.train_step import (
    OptimizerConfig,
    init_train_state,
    make_train_step,
)

from .test_train_step import tiny_model


def test_tp_param_spec_output_axis_by_rank():
    """The sharded axis is the OUTPUT-channel axis of each kernel form —
    the same rank dispatch force_weight_norm uses — so the per-output
    renorm reduction stays shard-local."""
    assert tp_param_spec((32, 16), 2) == P("model", None)          # WNLinear (out, in)
    assert tp_param_spec((4, 32, 16), 2) == P(None, "model", None)  # scan (L, out, in)
    assert tp_param_spec((3, 3, 16, 32), 2) == P(None, None, None, "model")  # HWIO
    assert tp_param_spec((4, 3, 3, 16, 32), 2) == P(None, None, None, None, "model")
    # non-divisible output channels replicate (conv_out's 3 image channels)
    assert tp_param_spec((3, 3, 16, 3), 2) == P()
    # rank-0/1 leaves (gains, biases) replicate
    assert tp_param_spec((32,), 2) == P()
    assert tp_param_spec((), 2) == P()
    # trivial model axis: no-op
    assert tp_param_spec((3, 3, 16, 32), 1) == P()


def test_trainer_rejects_mesh_plus_model_parallel(tmp_path):
    """Passing an explicit mesh AND model_parallel > 1 must fail loudly —
    the explicit mesh would otherwise silently drop the TP request."""
    from tinyedm_tpu.data.datamodules import SyntheticDataModule
    from tinyedm_tpu.training.trainer import Trainer

    from tests.test_e2e import tiny_spec

    with pytest.raises(ValueError, match="model_parallel"):
        Trainer(
            spec=tiny_spec(),
            datamodule=SyntheticDataModule(
                batch_size=16, image_size=8, num_channels=1, num_samples=64
            ),
            out_dir=tmp_path,
            mesh=make_mesh(),
            model_parallel=2,
        )


@pytest.fixture(scope="module")
def tp_mesh():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    return make_mesh(model_parallel=2)  # (data=4, model=2)


def _tiny_state(cfg=None, ema_cfg=None):
    model = tiny_model()
    img = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 8, 1))
    cfg = cfg or OptimizerConfig(lr=1e-3, rampup_steps=1, steady_steps=4)
    state = init_train_state(jax.random.PRNGKey(1), model, img, cfg, ema_cfg)
    return model, img, cfg, state


def test_tp_kernels_actually_sharded(tp_mesh):
    model, img, cfg, state = _tiny_state(ema_cfg=EMAConfig(sigma_rels=(0.13,)))
    placed = replicate_state(tp_mesh, state)
    sharded = [
        (jax.tree_util.keystr(path), leaf.sharding.spec)
        for path, leaf in jax.tree_util.tree_leaves_with_path(placed.params)
        if not leaf.sharding.is_fully_replicated
    ]
    assert sharded, "no param leaf sharded on the TP mesh"
    for name, spec in sharded:
        assert name.endswith("['w']"), f"non-kernel leaf sharded: {name}"
        assert MODEL_AXIS in spec
    # EMA mirrors the param layout exactly (same spec per leaf)
    for (pp, p), (_, e) in zip(
        jax.tree_util.tree_leaves_with_path(placed.params),
        jax.tree_util.tree_leaves_with_path(placed.ema[0]),
    ):
        assert p.sharding.spec == e.sharding.spec, jax.tree_util.keystr(pp)


@pytest.mark.slow
def test_tp_matches_dp_training(tp_mesh):
    """Three steps on the (4,2) TP mesh vs the (8,1) DP mesh: same loss and
    params to float reduction-order tolerance (TP repartitions contractions
    over the model axis, so partial sums accumulate in a different order —
    the same difference class as DDP vs single device)."""
    diffuser = Diffuser(-1.2, 1.2)
    ema_cfg = EMAConfig(sigma_rels=(0.13,))
    model, img, cfg, _ = _tiny_state(ema_cfg=ema_cfg)
    labels = np.zeros((16,), np.int32)

    out = {}
    for name, mesh in (("dp", make_mesh()), ("tp", tp_mesh)):
        state = replicate_state(
            mesh,
            init_train_state(
                jax.random.PRNGKey(1), model, img, cfg, ema_cfg
            ),
        )
        plan = ShardingPlan(mesh)
        step = plan.jit_train_step(
            make_train_step(model, diffuser, cfg, ema_cfg), state=state
        )
        batch = shard_batch(mesh, (np.asarray(img), labels))
        metrics = None
        for i in range(3):
            state, metrics = step(
                state, batch, jax.random.PRNGKey(2 + i), jnp.asarray(float(i))
            )
        out[name] = (float(metrics["train_loss"]), state)

    np.testing.assert_allclose(out["dp"][0], out["tp"][0], rtol=1e-4)
    # Adam normalizes the update to ~lr while nu is tiny, amplifying the
    # reduction-order noise — same tolerance rationale as the zero1 test
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(out["dp"][1].params),
        jax.tree_util.tree_leaves_with_path(out["tp"][1].params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(out["dp"][1].ema),
        jax.tree_util.tree_leaves(out["tp"][1].ema),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_tp_preserves_forced_weight_norm(tp_mesh):
    """After a TP step every weight-normed kernel is still unit-RMS per
    output unit — the renorm reduction is shard-local by construction
    (output axis sharded, fan-in axes intact)."""
    diffuser = Diffuser(-1.2, 1.2)
    model, img, cfg, state = _tiny_state()
    state = replicate_state(tp_mesh, state)
    plan = ShardingPlan(tp_mesh)
    step = plan.jit_train_step(make_train_step(model, diffuser, cfg), state=state)
    batch = shard_batch(tp_mesh, (np.asarray(img), np.zeros((16,), np.int32)))
    state, _ = step(state, batch, jax.random.PRNGKey(2), jnp.asarray(0.0))

    def check(path, leaf):
        if getattr(path[-1], "key", None) != "w" or leaf.ndim not in (2, 4):
            return
        w = np.asarray(leaf)
        axes = (1,) if w.ndim == 2 else (0, 1, 2)  # fan-in per output unit
        rms = np.sqrt((w.astype(np.float64) ** 2).mean(axis=axes))
        np.testing.assert_allclose(
            rms, 1.0, atol=5e-3, err_msg=jax.tree_util.keystr(path)
        )

    jax.tree_util.tree_map_with_path(check, state.params)


@pytest.mark.slow
def test_tp_sampling_matches_single_device(tp_mesh):
    """The Heun sampler with TP-sharded weights (generate --model_parallel)
    reproduces the single-device solve to float reduction-order tolerance —
    per-forward contractions psum over the model axis."""
    from tinyedm_tpu.diffusion.solver import DeterministicSolver
    from tinyedm_tpu.parallel.mesh import (
        batch_sharding,
        place_variables,
        variables_shardings,
    )

    model = tiny_model()
    img = jnp.zeros((8, 8, 8, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, img, jnp.ones((8,), jnp.float32), None
    )
    solver = DeterministicSolver(num_steps=3)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 1))

    def solve(v, x):
        return solver.solve(lambda xx, s, l: model.apply(v, xx, s, l), x, None)

    want = np.asarray(jax.jit(solve)(variables, x0))

    placed = place_variables(tp_mesh, variables)
    assert any(
        not leaf.sharding.is_fully_replicated
        for leaf in jax.tree_util.tree_leaves(placed)
    ), "no variable leaf sharded on the TP mesh"
    solve_tp = jax.jit(
        solve,
        in_shardings=(
            variables_shardings(tp_mesh, variables), batch_sharding(tp_mesh)
        ),
        out_shardings=batch_sharding(tp_mesh),
    )
    got = np.asarray(solve_tp(placed, shard_batch(tp_mesh, np.asarray(x0))))
    # bf16 model forward: reduction-order differences land at bf16 scale
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


@pytest.mark.slow
def test_tp_composes_with_zero1(tp_mesh):
    """tp + zero1 together: kernels sharded over model AND moments/EMA
    additionally sharded over data on a remaining axis; one step runs
    finite."""
    diffuser = Diffuser(-1.2, 1.2)
    ema_cfg = EMAConfig(sigma_rels=(0.13,))
    model, img, cfg, state = _tiny_state(ema_cfg=ema_cfg)
    placed = place_state(tp_mesh, state, zero1=True)

    both = [
        spec
        for _, leaf in jax.tree_util.tree_leaves_with_path(placed.opt_state)
        for spec in [leaf.sharding.spec]
        if MODEL_AXIS in spec and "data" in spec
    ]
    assert both, "no moment leaf sharded over BOTH mesh axes under tp+zero1"

    plan = ShardingPlan(tp_mesh, zero1=True)
    step = plan.jit_train_step(
        make_train_step(model, diffuser, cfg, ema_cfg), state=placed
    )
    batch = shard_batch(tp_mesh, (np.asarray(img), np.zeros((16,), np.int32)))
    placed, metrics = step(placed, batch, jax.random.PRNGKey(2), jnp.asarray(0.0))
    assert np.isfinite(float(metrics["train_loss"]))
