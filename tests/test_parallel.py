"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4c):
pjit data parallelism, metric reduction, EMA-under-sharding, and
single-vs-multi-device numerical equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tinyedm_tpu.diffusion.diffuser import Diffuser
from tinyedm_tpu.parallel.mesh import (
    ShardingPlan,
    batch_sharding,
    make_mesh,
    place_state,
    replicate_state,
    shard_batch,
    zero1_spec,
)
from tinyedm_tpu.training.ema import EMAConfig
from tinyedm_tpu.training.train_step import (
    OptimizerConfig,
    init_train_state,
    make_eval_step,
    make_train_step,
)

from .test_train_step import tiny_model


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    return make_mesh()


def test_mesh_shape(mesh8):
    assert mesh8.shape == {"data": 8, "model": 1}


def test_shard_batch_places_on_data_axis(mesh8):
    batch = (np.zeros((16, 8, 8, 1), np.float32), np.zeros((16,), np.int32))
    sharded = shard_batch(mesh8, batch)
    assert sharded[0].sharding.spec == P("data")
    # each device holds 16/8 = 2 samples
    shard_shapes = {s.data.shape for s in sharded[0].addressable_shards}
    assert shard_shapes == {(2, 8, 8, 1)}


@pytest.mark.slow
def test_sharded_train_step_runs_and_replicates(mesh8):
    model = tiny_model()
    diffuser = Diffuser(-1.2, 1.2)
    cfg = OptimizerConfig(lr=1e-3, rampup_steps=1, steady_steps=2)
    ema_cfg = EMAConfig(sigma_rels=(0.13,))
    img = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 8, 1))
    state = init_train_state(jax.random.PRNGKey(1), model, img, cfg, ema_cfg)
    state = replicate_state(mesh8, state)
    plan = ShardingPlan(mesh8)
    step = plan.jit_train_step(make_train_step(model, diffuser, cfg, ema_cfg))
    batch = shard_batch(mesh8, (np.asarray(img), np.zeros((16,), np.int32)))
    state, metrics = step(state, batch, jax.random.PRNGKey(2), jnp.asarray(0.0))
    assert np.isfinite(float(metrics["train_loss"]))
    assert float(metrics["count"]) == 16  # global count, not per-shard
    # params stay replicated (one logical value on all 8 devices)
    w = state.params["denoiser"]["conv_in"]["w"]
    assert w.sharding.is_fully_replicated
    # EMA bootstrapped to params at step 0 under sharding too
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.ema[0], state.params
    )
    assert max(jax.tree_util.tree_leaves(d)) < 1e-6


@pytest.mark.slow
def test_single_vs_multi_device_equivalence(mesh8):
    """The same batch through a 1-device mesh and the 8-device mesh must give
    the same loss and the same updated params (bitwise-identical RNG, XLA
    all-reduce == local sum)."""
    model = tiny_model()
    diffuser = Diffuser(-1.2, 1.2)
    cfg = OptimizerConfig(lr=1e-3, rampup_steps=1, steady_steps=2)
    img = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 8, 1))
    labels = np.zeros((16,), np.int32)

    mesh1 = make_mesh(num_devices=1)
    out = {}
    for name, mesh in (("one", mesh1), ("eight", mesh8)):
        plan = ShardingPlan(mesh)
        step = plan.jit_train_step(make_train_step(model, diffuser, cfg))
        # init is deterministic in the key; the step donates its input state,
        # so build a fresh state per mesh
        state = replicate_state(
            mesh, init_train_state(jax.random.PRNGKey(1), model, img, cfg)
        )
        batch = shard_batch(mesh, (np.asarray(img), labels))
        state, metrics = step(state, batch, jax.random.PRNGKey(2), jnp.asarray(0.0))
        out[name] = (float(metrics["train_loss"]), state)

    np.testing.assert_allclose(out["one"][0], out["eight"][0], rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(out["one"][1].params)
    l8 = jax.tree_util.tree_leaves(out["eight"][1].params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_eval_step_sharded_metrics(mesh8):
    model = tiny_model()
    diffuser = Diffuser(-1.2, 1.2)
    cfg = OptimizerConfig()
    img = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 8, 1))
    state = replicate_state(
        mesh8, init_train_state(jax.random.PRNGKey(1), model, img, cfg)
    )
    plan = ShardingPlan(mesh8)
    ev = plan.jit_eval_step(make_eval_step(model, diffuser))
    batch = shard_batch(mesh8, (np.asarray(img), np.zeros((16,), np.int32)))
    out = ev(state, batch, jax.random.PRNGKey(3))
    assert float(out["count"]) == 16.0
    assert np.isfinite(float(out["sse"]))


def test_model_axis_composes_with_train_step():
    """TP is a config change: on a (data=4, model=2) mesh the full train step
    (incl. custom_partitioning kernels) compiles and runs with every
    weight-normed kernel genuinely sharded over the model axis (deeper
    numerics checks live in tests/test_tensor_parallel.py)."""
    mesh = make_mesh(model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    model = tiny_model()
    diffuser = Diffuser(-1.2, 1.2)
    cfg = OptimizerConfig(lr=1e-3, rampup_steps=1, steady_steps=2)
    img = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 8, 1))
    state = replicate_state(
        mesh, init_train_state(jax.random.PRNGKey(1), model, img, cfg)
    )
    plan = ShardingPlan(mesh)
    step = plan.jit_train_step(make_train_step(model, diffuser, cfg), state=state)
    batch = shard_batch(mesh, (np.asarray(img), np.zeros((16,), np.int32)))
    state, metrics = step(state, batch, jax.random.PRNGKey(2), jnp.asarray(0.0))
    assert np.isfinite(float(metrics["train_loss"]))
    assert float(metrics["count"]) == 16


def test_zero1_spec_picks_largest_divisible_axis():
    """ZeRO-1 leaf specs: largest data-divisible axis sharded, ties go to
    the LAST such axis (output channels for HWIO kernels), scalars and
    non-divisible leaves stay replicated."""
    assert zero1_spec((), 8) == P()
    assert zero1_spec((4,), 8) == P()  # smaller than the axis
    assert zero1_spec((16,), 8) == P("data")
    assert zero1_spec((32, 16), 8) == P("data")  # largest wins
    assert zero1_spec((12, 16), 8) == P(None, "data")  # 12 % 8 != 0
    # HWIO conv kernel, I == O: tie resolves to the output-channel axis
    assert zero1_spec((3, 3, 16, 16), 8) == P(None, None, None, "data")
    assert zero1_spec((16,), 1) == P()  # single-device mesh: no-op


@pytest.mark.slow
def test_zero1_matches_replicated_training(mesh8):
    """ZeRO-1 (sharded Adam moments + EMA trees) is a memory layout, not a
    semantics change: three steps with zero1 on and off must agree to float
    reduction-order tolerance (XLA lowers the sharded-moment gradient sum as
    reduce-scatter + all-gather, whose accumulation order differs from the
    replicated all-reduce by ~1e-5 relative — same class of difference as
    DDP vs single device), while the moment leaves are genuinely distributed
    over the data axis."""
    model = tiny_model()
    diffuser = Diffuser(-1.2, 1.2)
    cfg = OptimizerConfig(lr=1e-3, rampup_steps=1, steady_steps=4)
    ema_cfg = EMAConfig(sigma_rels=(0.13,))
    img = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 8, 1))
    labels = np.zeros((16,), np.int32)

    out = {}
    for name, zero1 in (("rep", False), ("zero1", True)):
        plan = ShardingPlan(mesh8, zero1=zero1)
        state = place_state(
            mesh8,
            init_train_state(jax.random.PRNGKey(1), model, img, cfg, ema_cfg),
            zero1=zero1,
        )
        step = plan.jit_train_step(
            make_train_step(model, diffuser, cfg, ema_cfg), state=state
        )
        batch = shard_batch(mesh8, (np.asarray(img), labels))
        metrics = None
        for i in range(3):
            state, metrics = step(
                state, batch, jax.random.PRNGKey(2 + i), jnp.asarray(float(i))
            )
        out[name] = (float(metrics["train_loss"]), state)

    np.testing.assert_allclose(out["rep"][0], out["zero1"][0], rtol=1e-5)
    # Adam amplifies the reduce-scatter rounding early (the update magnitude
    # is ~lr regardless of gradient scale while nu is still tiny), so params
    # agree to ~lr-scale noise per step, not to fp32 eps
    for a, b in zip(
        jax.tree_util.tree_leaves(out["rep"][1].params),
        jax.tree_util.tree_leaves(out["zero1"][1].params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(out["rep"][1].ema),
        jax.tree_util.tree_leaves(out["zero1"][1].ema),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )

    z = out["zero1"][1]
    # the big Adam-moment and EMA leaves are genuinely distributed
    assert any(
        not leaf.sharding.is_fully_replicated
        for leaf in jax.tree_util.tree_leaves(z.opt_state)
    ), "no opt_state leaf actually sharded under zero1"
    assert any(
        not leaf.sharding.is_fully_replicated
        for leaf in jax.tree_util.tree_leaves(z.ema)
    ), "no EMA leaf actually sharded under zero1"
    # params stay replicated (the train step consumes them everywhere)
    assert all(
        leaf.sharding.is_fully_replicated
        for leaf in jax.tree_util.tree_leaves(z.params)
    )


@pytest.mark.slow
def test_padded_validation_exact_on_nondivisible_val_set(tmp_path, mesh8):
    """A val set whose tail batch does not divide the mesh data axis must
    produce EXACTLY the single-device val_loss: pad rows carry weight 0 and
    eval noise draws are per-sample (batch-shape-invariant), so every real
    sample contributes identically on any mesh (reference torchmetrics
    counts every sample, metric.py:34-36)."""
    from tinyedm_tpu.data.datamodules import SyntheticDataModule
    from tinyedm_tpu.diffusion.diffuser import Diffuser as Diff
    from tinyedm_tpu.models.edm import EDM  # noqa: F401  (spec deps)
    from tinyedm_tpu.training.experiment import EDMSpec
    from tinyedm_tpu.training.trainer import Trainer
    from tinyedm_tpu.models.layers import Embedding
    from tinyedm_tpu.models.unet import Denoiser

    class TinyValDM(SyntheticDataModule):
        def __init__(self):
            super().__init__(batch_size=16, image_size=8, num_channels=1,
                             num_samples=64)
            # 20 val samples -> batches of 16 and 4; 4 % 8 != 0
            self.val_images = self.train_images[:20]
            self.val_labels = self.train_labels[:20]

    def spec():
        return EDMSpec(
            diffuser=Diff(P_mean=-1.2, P_std=1.2),
            embedding=Embedding(fourier_dim=8, embedding_dim=16, num_classes=10),
            denoiser=Denoiser(
                in_channels=1, out_channels=1, embedding_dim=16, num_heads=2,
                sigma_data=0.5,
                encoder_block_types=("Enc", "EncD"),
                decoder_block_types=("Dec", "DecU", "Dec", "Dec"),
                encoder_out_channels=(8, 16),
                decoder_out_channels=(16, 8, 8, 8),
                skip_connections=(True, False, True, True),
            ),
        )

    losses = {}
    for name, mesh in (("one", make_mesh(num_devices=1)), ("eight", mesh8)):
        trainer = Trainer(
            spec=spec(), datamodule=TinyValDM(), max_epochs=1,
            out_dir=tmp_path / f"run_{name}", seed=0, mesh=mesh,
        )
        trainer.datamodule.prepare_data()
        trainer.datamodule.setup("fit")
        trainer.state = trainer._init_state()
        losses[name] = trainer.validate()
    assert losses["one"] is not None
    np.testing.assert_allclose(losses["one"], losses["eight"], rtol=1e-6)


class TestConstraintHints:
    """parallel.mesh.constrain / constrain_kernel — the round-4 activation
    hints that stop GSPMD involuntary remats under TP (VERDICT r3 weak #2).
    The load-bearing properties: identity outside a constraint mesh AND on
    single-device meshes (the perf-tuned single-chip trace must not change),
    value-preserving with the pinned sharding on real multi-device meshes."""

    def test_identity_without_active_mesh(self):
        from tinyedm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, constrain

        x = jnp.ones((4, 8))
        assert constrain(x, DATA_AXIS, MODEL_AXIS) is x  # same object: no-op

    def test_identity_on_single_device_mesh(self):
        from tinyedm_tpu.parallel.mesh import (
            DATA_AXIS,
            MODEL_AXIS,
            constrain,
            constrain_kernel,
            constraint_mesh,
        )

        with constraint_mesh(make_mesh(num_devices=1)):
            x = jnp.ones((4, 8))
            assert constrain(x, DATA_AXIS, MODEL_AXIS) is x
            assert constrain_kernel(x) is x

    def test_pins_sharding_and_preserves_values(self, mesh8):
        from tinyedm_tpu.parallel.mesh import (
            DATA_AXIS,
            MODEL_AXIS,
            constrain,
            constrain_kernel,
            constraint_mesh,
            tp_param_spec,
        )
        from jax.sharding import NamedSharding

        tp_mesh = make_mesh(model_parallel=2)
        x = np.arange(32, dtype=np.float32).reshape(8, 4)
        with constraint_mesh(tp_mesh):
            out = jax.jit(lambda a: constrain(a, DATA_AXIS, MODEL_AXIS))(x)
            np.testing.assert_array_equal(np.asarray(out), x)
            assert out.sharding == NamedSharding(
                tp_mesh, P(DATA_AXIS, MODEL_AXIS)
            )
            # kernel hint: a (features, in) WNLinear kernel pins to its own
            # TP parameter layout (output channels over the model axis)
            w = np.arange(24, dtype=np.float32).reshape(6, 4)
            wk = jax.jit(constrain_kernel)(w)
            np.testing.assert_array_equal(np.asarray(wk), w)
            # is_equivalent_to: P('model',) and P('model', None) normalize
            # to the same placement but compare unequal as objects
            assert wk.sharding.is_equivalent_to(
                NamedSharding(tp_mesh, tp_param_spec(w.shape, 2)), w.ndim
            )

    def test_context_is_scoped(self, mesh8):
        from tinyedm_tpu.parallel.mesh import (
            DATA_AXIS,
            constrain,
            constraint_mesh,
        )

        with constraint_mesh(mesh8):
            pass
        x = jnp.ones((8,))
        assert constrain(x, DATA_AXIS) is x  # mesh deactivated on exit


class TestConstraintCacheTransitions:
    """Round-4 continuation fix: jax's inner trace caches (remat/custom_vjp
    jaxprs, keyed on (function, avals) only) must be cleared on EVERY
    transition of the constraint-mesh state — in both directions. The
    original fix cleared only when the NEW plan was multi-device, so a
    multi-device trace followed by a single-device plan with identical avals
    could reuse constraint-laden jaxprs pinned to the (now dead) mesh."""

    def test_clears_on_transitions_both_directions(self, monkeypatch):
        import tinyedm_tpu.parallel.mesh as M

        calls = []
        monkeypatch.setattr(M.jax, "clear_caches", lambda: calls.append(1))
        monkeypatch.setattr(M, "_last_constraint_trace_key", None)
        single = ShardingPlan(make_mesh(num_devices=1))
        multi = ShardingPlan(make_mesh())

        f = lambda *a: None  # noqa: E731
        single._with_constraint_mesh(f)()
        assert len(calls) == 0  # trivial state unchanged: never clears
        multi._with_constraint_mesh(f)()
        assert len(calls) == 1  # trivial -> (8,1)
        multi._with_constraint_mesh(f)()
        assert len(calls) == 1  # same mesh again: stable, no churn
        single._with_constraint_mesh(f)()
        assert len(calls) == 2  # (8,1) -> trivial: the reverse direction
        single._with_constraint_mesh(f)()
        assert len(calls) == 2
        multi._with_constraint_mesh(f)()
        assert len(calls) == 3

    def test_mesh_shape_change_counts_as_transition(self, monkeypatch):
        import tinyedm_tpu.parallel.mesh as M

        calls = []
        monkeypatch.setattr(M.jax, "clear_caches", lambda: calls.append(1))
        monkeypatch.setattr(M, "_last_constraint_trace_key", None)
        f = lambda *a: None  # noqa: E731
        ShardingPlan(make_mesh())._with_constraint_mesh(f)()
        ShardingPlan(make_mesh(model_parallel=2))._with_constraint_mesh(f)()
        assert len(calls) == 2  # (8,1) -> (4,2) re-bakes the constraints

    def test_transition_tracked_in_trace_order_not_wrap_order(
        self, monkeypatch
    ):
        """Round-5 ADVICE fix: jaxpr caches are populated at TRACE (first
        call) time, so the transition check must follow call order, not
        construction order. Build both steps up front, then trace multi
        first and single second — each first TRACE must clear, and wrapping
        alone must clear nothing."""
        import tinyedm_tpu.parallel.mesh as M

        calls = []
        monkeypatch.setattr(M.jax, "clear_caches", lambda: calls.append(1))
        monkeypatch.setattr(M, "_last_constraint_trace_key", None)
        f = lambda *a: None  # noqa: E731
        multi_step = ShardingPlan(make_mesh())._with_constraint_mesh(f)
        single_step = ShardingPlan(
            make_mesh(num_devices=1)
        )._with_constraint_mesh(f)
        assert len(calls) == 0  # wrapping populates no caches: no clears
        multi_step()
        assert len(calls) == 1  # first trace under (8,1): transition
        single_step()
        assert len(calls) == 2  # single trace after multi: must re-clear
        multi_step()  # a RE-trace (new avals) transitions again
        assert len(calls) == 3

    @pytest.mark.slow
    def test_tp_trace_then_single_device_trace_stays_correct(self):
        """End to end in the dangerous order: trace the full train step under
        a TP (4,2) plan FIRST, then build a single-device plan for the same
        model with identical avals, and check the single-device result
        against ground truth computed by a bare jax.jit (no plan machinery
        at all). Before the fix the second trace could reuse TP-pinned
        jaxprs."""
        model = tiny_model()
        diffuser = Diffuser(-1.2, 1.2)
        cfg = OptimizerConfig(lr=1e-3, rampup_steps=1, steady_steps=2)
        img = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 8, 1))
        labels = np.zeros((16,), np.int32)

        # 1) TP plan traced first (bakes NamedSharding(4,2) constraints)
        tp_mesh = make_mesh(model_parallel=2)
        tp_state = replicate_state(
            tp_mesh, init_train_state(jax.random.PRNGKey(1), model, img, cfg)
        )
        tp_step = ShardingPlan(tp_mesh).jit_train_step(
            make_train_step(model, diffuser, cfg), state=tp_state
        )
        tp_state, tp_metrics = tp_step(
            tp_state,
            shard_batch(tp_mesh, (np.asarray(img), labels)),
            jax.random.PRNGKey(2),
            jnp.asarray(0.0),
        )

        # 2) single-device plan second — identical avals, constraint-free
        mesh1 = make_mesh(num_devices=1)
        state1 = replicate_state(
            mesh1, init_train_state(jax.random.PRNGKey(1), model, img, cfg)
        )
        step1 = ShardingPlan(mesh1).jit_train_step(
            make_train_step(model, diffuser, cfg)
        )
        state1, metrics1 = step1(
            state1,
            shard_batch(mesh1, (np.asarray(img), labels)),
            jax.random.PRNGKey(2),
            jnp.asarray(0.0),
        )

        # 3) ground truth: bare jit, no ShardingPlan anywhere
        ref_state = init_train_state(jax.random.PRNGKey(1), model, img, cfg)
        ref_step = jax.jit(make_train_step(model, diffuser, cfg))
        ref_state, ref_metrics = ref_step(
            ref_state,
            (jnp.asarray(img), jnp.asarray(labels)),
            jax.random.PRNGKey(2),
            jnp.asarray(0.0),
        )

        np.testing.assert_allclose(
            float(metrics1["train_loss"]), float(ref_metrics["train_loss"]),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            float(tp_metrics["train_loss"]), float(ref_metrics["train_loss"]),
            rtol=1e-5,
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(state1.params),
            jax.tree_util.tree_leaves(ref_state.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )
