"""Communication-level audit of the sharded programs (VERDICT r4 next #2).

The dryrun proves the multi-chip programs compile and execute with zero
partitioner warnings; these tests pin WHICH collectives those programs
contain, so a regression (e.g. an accidental parameter all-gather sneaking
into the DP forward) fails a positive assertion instead of silently
multiplying bytes-on-ICI.

The contract being pinned is the reference's distributed story: Lightning
DDP (/root/reference/experiments/conf/cifar10.yaml:4-8 -> torch.distributed/
NCCL) performs exactly one fused gradient all-reduce per step and never
gathers parameters in the forward; torchmetrics adds one scalar-sum
reduction (/root/reference/src/tinyedm/metric.py:34-36). ZeRO-1 adds one
parameter-sized all-gather of the sharded updates. TP psums at contraction
boundaries. All assertions run on the optimized HLO of AOT-compiled
programs on the virtual 8-device CPU mesh; TP's *reshard choices*
(all-to-all vs all-gather for conv channel resharding) are partitioner
details and deliberately NOT pinned — only the invariants are.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyedm_tpu.diffusion.diffuser import Diffuser
from tinyedm_tpu.diffusion.solver import DeterministicSolver
from tinyedm_tpu.parallel.audit import (
    collective_inventory,
    group_shape,
    inventory_summary,
)
from tinyedm_tpu.parallel.mesh import (
    ShardingPlan,
    batch_sharding,
    make_mesh,
    place_state,
    shard_batch,
)
from tinyedm_tpu.training.ema import EMAConfig
from tinyedm_tpu.training.train_step import (
    OptimizerConfig,
    init_train_state,
    make_eval_step,
    make_train_step,
)

from .test_train_step import tiny_model

pytestmark = pytest.mark.slow

OPT = OptimizerConfig(lr=1e-3, rampup_steps=1, steady_steps=2)
EMA = EMAConfig(sigma_rels=(0.13,))
BATCH = 16


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    img = jax.random.normal(jax.random.PRNGKey(0), (BATCH, 8, 8, 1))
    labels = np.zeros((BATCH,), np.int32)
    state0 = init_train_state(jax.random.PRNGKey(1), model, img, OPT, EMA)
    param_bytes = sum(
        x.size * 4 for x in jax.tree_util.tree_leaves(state0.params)
    )
    return model, img, labels, param_bytes


def _train_inventory(model, img, labels, mesh, zero1=False):
    state = place_state(
        mesh,
        init_train_state(jax.random.PRNGKey(1), model, img, OPT, EMA),
        zero1=zero1,
    )
    plan = ShardingPlan(mesh, zero1=zero1)
    step = plan.jit_train_step(
        make_train_step(model, Diffuser(-1.2, 1.2), OPT, EMA), state=state
    )
    batch = shard_batch(mesh, (np.asarray(img), labels))
    txt = (
        step.lower(state, batch, jax.random.PRNGKey(2), jnp.asarray(0.0))
        .compile()
        .as_text()
    )
    return collective_inventory(txt)


def _sampler_inventory(model, img, labels, mesh):
    state = place_state(
        mesh, init_train_state(jax.random.PRNGKey(1), model, img, OPT, EMA)
    )
    solver = DeterministicSolver(num_steps=4)

    def sample(params, constants, x0, labs):
        return solver.solve(
            lambda x, s, l: model.apply(
                {"params": params, "constants": constants}, x, s, l
            ),
            x0,
            labs,
        )

    sample_j = jax.jit(
        sample,
        in_shardings=(
            jax.tree_util.tree_map(lambda a: a.sharding, state.ema[0]),
            jax.tree_util.tree_map(lambda a: a.sharding, state.constants),
            batch_sharding(mesh),
            batch_sharding(mesh),
        ),
        out_shardings=batch_sharding(mesh),
    )
    x0 = shard_batch(mesh, np.zeros_like(np.asarray(img)))
    labs = shard_batch(mesh, labels)
    txt = (
        sample_j.lower(state.ema[0], state.constants, x0, labs)
        .compile()
        .as_text()
    )
    return collective_inventory(txt)


class TestDataParallelContract:
    """Pure DP on (8,1): the DDP contract, asserted positively."""

    def test_exactly_one_fused_gradient_allreduce(self, setup):
        model, img, labels, param_bytes = setup
        inv = _train_inventory(model, img, labels, make_mesh())

        assert [c.kind for c in inv] == ["all-reduce"], (
            "pure-DP train step must contain exactly one collective (the "
            f"fused gradient all-reduce), got {inventory_summary(inv)}"
        )
        ar = inv[0]
        # one group spanning all 8 devices
        assert group_shape(ar) == (1, 8)
        # payload = every gradient leaf (~param bytes) + a few metric
        # scalars; anything well above that means extra state is riding the
        # reduction, anything below means some gradient skipped sync
        assert param_bytes <= ar.bytes <= int(param_bytes * 1.05) + 1024, (
            f"gradient all-reduce payload {ar.bytes} vs params {param_bytes}"
        )

    def test_no_parameter_allgather_in_forward(self, setup):
        model, img, labels, _ = setup
        inv = _train_inventory(model, img, labels, make_mesh())
        kinds = {c.kind for c in inv}
        assert "all-gather" not in kinds and "all-to-all" not in kinds

    def test_eval_step_reduces_only_scalar_metrics(self, setup):
        model, img, labels, _ = setup
        mesh = make_mesh()
        state = place_state(
            mesh, init_train_state(jax.random.PRNGKey(1), model, img, OPT, EMA)
        )
        plan = ShardingPlan(mesh)
        estep = plan.jit_eval_step(make_eval_step(model, Diffuser(-1.2, 1.2)))
        batch = shard_batch(
            mesh, (np.asarray(img), labels, np.ones((BATCH,), np.float32))
        )
        txt = (
            estep.lower(state, batch, jax.random.PRNGKey(3))
            .compile()
            .as_text()
        )
        inv = collective_inventory(txt)
        # the torchmetrics dist_reduce_fx="sum" analog: one all-reduce of
        # the (sse, count) scalar pair, nothing else
        assert [c.kind for c in inv] == ["all-reduce"]
        assert inv[0].bytes == 8  # two f32 scalars

    def test_dp_sampler_is_collective_free(self, setup):
        """Batch-sharded sampling with replicated weights is embarrassingly
        parallel: the scanned Heun solve must contain NO collectives."""
        model, img, labels, _ = setup
        inv = _sampler_inventory(model, img, labels, make_mesh())
        assert inv == []


class TestZero1Contract:
    def test_grad_reduce_plus_one_param_sized_allgather(self, setup):
        """ZeRO-1: gradients still sum globally (possibly as several
        per-shard all-reduces totalling ~param bytes) and the sharded
        updates come back via all-gathers totalling ~param bytes — the
        'single extra all-gather' of the design, and nothing else."""
        model, img, labels, param_bytes = setup
        inv = _train_inventory(model, img, labels, make_mesh(), zero1=True)

        kinds = {c.kind for c in inv}
        assert kinds <= {"all-reduce", "all-gather", "reduce-scatter"}, (
            f"unexpected collective kinds under zero1: {kinds}"
        )
        s = inventory_summary(inv)
        ar_bytes = s.get("all-reduce", {}).get("bytes", 0) + s.get(
            "reduce-scatter", {}
        ).get("bytes", 0)
        ag_bytes = s.get("all-gather", {}).get("bytes", 0)
        # gradient sum: ~param bytes (+ metric scalars, + slack for the
        # few non-divisible leaves that reduce unsharded)
        assert param_bytes * 0.95 <= ar_bytes <= param_bytes * 1.10 + 4096
        # updated-parameter gather: ~param bytes, once
        assert param_bytes * 0.80 <= ag_bytes <= param_bytes * 1.05 + 4096

    def test_all_groups_span_the_data_axis(self, setup):
        model, img, labels, _ = setup
        inv = _train_inventory(model, img, labels, make_mesh(), zero1=True)
        for c in inv:
            assert group_shape(c) == (1, 8), (c.kind, c.replica_groups)


class TestTensorParallelContract:
    """TP on (4,2): psums at contraction boundaries, gradient sync over the
    data axis, and no whole-parameter-tree gathers. The partitioner's
    reshard mechanism (all-to-all vs all-gather on conv channel dims) is
    NOT pinned — it may legitimately differ between XLA versions/backends."""

    def test_model_axis_psums_exist(self, setup):
        model, img, labels, _ = setup
        inv = _train_inventory(model, img, labels, make_mesh(model_parallel=2))
        # contraction psums: all-reduces with 4 groups of 2 (model axis)
        model_axis = [
            c
            for c in inv
            if c.kind == "all-reduce" and group_shape(c) == (4, 2)
        ]
        assert model_axis, "TP forward/backward lost its contraction psums"

    def test_gradient_sync_over_data_axis_exists(self, setup):
        model, img, labels, _ = setup
        inv = _train_inventory(model, img, labels, make_mesh(model_parallel=2))
        # gradient all-reduce(s): 2 groups of 4 (data axis), in the
        # backward/optimizer region
        data_axis = [
            c
            for c in inv
            if c.kind == "all-reduce" and group_shape(c) == (2, 4)
        ]
        assert data_axis, "TP step lost its data-axis gradient sync"

    def test_no_collective_moves_full_parameter_bytes(self, setup):
        """The point of TP is that parameters stay sharded: no single
        collective may carry the whole parameter tree."""
        model, img, labels, param_bytes = setup
        inv = _train_inventory(model, img, labels, make_mesh(model_parallel=2))
        biggest = max((c.bytes for c in inv), default=0)
        assert biggest < param_bytes, (
            f"a collective moves {biggest} bytes >= full params {param_bytes}"
        )

    def test_tp_sampler_has_psums_but_no_param_sized_gathers(self, setup):
        model, img, labels, param_bytes = setup
        inv = _sampler_inventory(
            model, img, labels, make_mesh(model_parallel=2)
        )
        assert any(c.kind == "all-reduce" for c in inv)
        biggest = max((c.bytes for c in inv), default=0)
        assert biggest < param_bytes


class TestInventoryParser:
    """Unit coverage for the HLO parser itself (no compilation)."""

    HLO = """\
HloModule jit_step
%fused_computation (p: f32[8]) -> f32[8] {
  ROOT %r = f32[8]{0} add(%p, %p)
}
ENTRY %main {
  %ar = (f32[3,3,2,8]{3,2,1,0}, f32[]) all-reduce(%a, %b), channel_id=1, replica_groups=[1,8]<=[8], use_global_device_ids=true, to_apply=%add, metadata={op_name="jit(train_step)/grad"}
  %ag = f32[256,72]{1,0} all-gather(%c), channel_id=2, replica_groups=[4,2]<=[8]T(1,0), dimensions={0}
  %done = f32[8]{0} all-reduce-done(%start)
  %start = (f32[8]{0}, f32[8]{0}) all-reduce-start(%d), replica_groups={{0,1},{2,3}}
  %cp = f32[4,4]{1,0} collective-permute(%e), source_target_pairs={{0,1},{1,0}}
  %not_a_match = f32[2]{0} fusion(%ar), kind=kLoop, calls=%fused_computation
}
"""

    def test_parses_kinds_shapes_bytes_groups(self):
        inv = collective_inventory(self.HLO)
        kinds = [c.kind for c in inv]
        assert kinds == [
            "all-reduce",
            "all-gather",
            "all-reduce",
            "collective-permute",
        ]
        ar, ag, start, cp = inv
        assert ar.bytes == 3 * 3 * 2 * 8 * 4 + 4
        assert ar.shapes == ("f32[3,3,2,8]", "f32[]")
        assert group_shape(ar) == (1, 8)
        assert ar.op_name == "jit(train_step)/grad"
        assert ag.bytes == 256 * 72 * 4
        assert group_shape(ag) == (4, 2)
        # async pair counted once, payload from the -done's result (the
        # start's own tuple is backend-dependent)
        assert start.bytes == 8 * 4
        assert group_shape(start) == (2, 2)
        assert cp.bytes == 16 * 4
        assert group_shape(cp) is None  # source_target_pairs, not groups

    def test_async_start_payload_comes_from_done_result(self):
        # all-gather-start's tuple is (operand, result): the operand is the
        # 1/n shard, so halving the tuple would report ~0.56x the gathered
        # bytes. The -done result is the collective's true output.
        hlo = """\
HloModule jit_async
ENTRY %main {
  %ags = (f32[32,8]{1,0}, f32[256,8]{1,0}) all-gather-start(%p), channel_id=1, replica_groups=[1,8]<=[8], dimensions={0}
  %agd = f32[256,8]{1,0} all-gather-done(%ags)
  %ars = f32[128]{0} all-reduce-start(%q), channel_id=2, replica_groups=[1,8]<=[8], to_apply=%add
  %ard = f32[128]{0} all-reduce-done(%ars)
}
"""
        inv = collective_inventory(hlo)
        assert [c.kind for c in inv] == ["all-gather", "all-reduce"]
        ag, ar = inv
        assert ag.bytes == 256 * 8 * 4  # full gathered result, not 0.56x
        assert ag.shapes == ("f32[256,8]",)
        # bare-result all-reduce-start: halving would have reported 256 B
        assert ar.bytes == 128 * 4

    def test_loop_body_collectives_are_attributed(self):
        # a lax.scan body is a while-loop body computation: its collectives
        # execute once per trip, so the audit must be able to tell them
        # apart from entry-level ones
        from tinyedm_tpu.parallel.audit import while_body_computations

        hlo = """\
HloModule jit_scan
%body.7 (p: (f32[8]{0}, s32[])) -> (f32[8]{0}, s32[]) {
  %psum = f32[8]{0} all-reduce(%x), channel_id=3, replica_groups=[4,2]<=[8], to_apply=%add
}
%cond.9 (p: (f32[8]{0}, s32[])) -> pred[] {
  %lt = pred[] compare(%i, %n), direction=LT
}
ENTRY %main {
  %w = (f32[8]{0}, s32[]) while(%init), condition=%cond.9, body=%body.7
  %ar = f32[64]{0} all-reduce(%g), channel_id=4, replica_groups=[1,8]<=[8], to_apply=%add
}
"""
        bodies = while_body_computations(hlo)
        assert bodies == {"body.7"}
        inv = collective_inventory(hlo)
        assert [(c.name, c.computation) for c in inv] == [
            ("psum", "body.7"),
            ("ar", "main"),
        ]

    def test_done_and_operand_references_do_not_match(self):
        inv = collective_inventory(self.HLO)
        names = [c.name for c in inv]
        assert "done" not in names
        assert "not_a_match" not in names

    def test_summary(self):
        s = inventory_summary(collective_inventory(self.HLO))
        assert s["all-reduce"]["count"] == 2
        assert s["all-gather"]["bytes"] == 256 * 72 * 4
