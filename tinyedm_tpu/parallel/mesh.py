"""Device mesh + sharding layer.

The reference's entire distributed story is Lightning DDP over NCCL implied
by ``devices: -1, strategy: auto`` (conf/cifar10.yaml:4-8; SURVEY.md §2.4).
The TPU-native equivalent: one mesh over ICI with a ``data`` axis (DP,
first-class) and a ``model`` axis so tensor parallelism is a config change,
not a rewrite — ``trainer.model_parallel: N`` reshapes the mesh and
``state_shardings`` shards every weight-normed kernel's output-channel axis
over ``model``; GSPMD derives the activation shardings and collectives from
those parameter specs. The jitted train step runs under ``jax.jit`` with
NamedShardings: batch split on ``data``, state replicated (or TP/ZeRO-1
sharded) — XLA emits the gradient all-reduce over ICI, which *is* DDP.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` (the
DCN axis becomes the outer dimension of the device reshape automatically via
jax.devices() ordering); per-host data feeding goes through
``make_array_from_process_local_data``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    num_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """Build a (data, model) mesh over all (or the first N) devices."""
    devs = devices if devices is not None else jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    n = len(devs)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dimension split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_local_slice(x: np.ndarray, process_index: int, process_count: int) -> np.ndarray:
    """This process's contiguous share of a global-batch array.

    Every process iterates the same global batch order (datamodules shuffle
    with a shared seed), so slicing by process rank yields disjoint,
    order-preserving shares that exactly tile the global batch — the
    per-host input pipeline of SURVEY.md §2.4 with no cross-host exchange.
    The global batch must divide evenly by process_count (shard_batch
    callers guarantee divisibility by the mesh data-axis size, of which
    process_count is a factor)."""
    x = np.asarray(x)
    if x.shape[0] % process_count != 0:
        raise ValueError(
            f"global batch {x.shape[0]} not divisible by {process_count} processes"
        )
    per = x.shape[0] // process_count
    return x[process_index * per : (process_index + 1) * per]


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch (pytree of arrays with a leading GLOBAL batch dim)
    onto the mesh, split along ``data``.

    Single-process: a plain device_put. Multi-host: each process contributes
    its disjoint ``process_local_slice`` and the global array is assembled
    via make_array_from_process_local_data."""
    sharding = batch_sharding(mesh)
    pc = jax.process_count()
    if pc == 1:
        return jax.device_put(batch, sharding)
    pi = jax.process_index()

    def place(x):
        local = process_local_slice(x, pi, pc)
        return jax.make_array_from_process_local_data(sharding, local)

    return jax.tree_util.tree_map(place, batch)


def _zero1_axis(shape: tuple, data_size: int, skip: Optional[int] = None):
    """Largest data-divisible axis (ties prefer the LAST such axis); ``skip``
    excludes an axis already claimed by tensor parallelism."""
    if data_size <= 1:
        return None
    best = None
    for i, d in enumerate(shape):
        if i == skip:
            continue
        if d % data_size == 0 and d >= data_size:
            if best is None or d >= shape[best]:
                best = i
    return best


def zero1_spec(shape: tuple, data_size: int, skip: Optional[int] = None) -> P:
    """ZeRO-1 PartitionSpec for one state leaf: split the largest axis that
    divides evenly by the data-axis size; leaves with no such axis (scalars,
    tiny gains) stay replicated. Ties prefer the LAST such axis — for conv
    kernels (HWIO) and stacked EMA copies that is the output-channel axis,
    which keeps the per-output weight-renorm reduction shard-local. ``skip``
    excludes the axis tensor parallelism already shards over ``model``."""
    best = _zero1_axis(shape, data_size, skip)
    if best is None:
        return P()
    return P(*([None] * best + [DATA_AXIS]))


# output-channel axis of a weight-normed kernel, by rank: WNLinear (out, in),
# scan-stacked (L, out, in), WNConv HWIO, scan-stacked (L, kh, kw, I, O) —
# the same rank dispatch as training/state.py::force_weight_norm
_TP_OUT_AXIS = {2: 0, 3: 1, 4: 3, 5: 4}


def tp_param_spec(shape: tuple, model_size: int) -> P:
    """Tensor-parallel PartitionSpec for one weight-normed kernel: shard the
    OUTPUT-channel axis over ``model``. This keeps the per-output weight
    renorm reduction (force_weight_norm: norm over fan-in per output unit)
    entirely shard-local, and GSPMD propagates the resulting channel-sharded
    activations through the network, inserting the contraction psums where a
    following kernel reduces over its (sharded) input channels. Kernels whose
    output axis does not divide the model-axis size (conv_out's image
    channels, the uncertainty head) replicate — XLA reshards at the boundary."""
    ax = _TP_OUT_AXIS.get(len(shape))
    if model_size <= 1 or ax is None:
        return P()
    if shape[ax] % model_size != 0 or shape[ax] < model_size:
        return P()
    spec = [None] * len(shape)
    spec[ax] = MODEL_AXIS
    return P(*spec)


def _is_kernel(path) -> bool:
    return bool(path) and getattr(path[-1], "key", None) == "w"


def state_shardings(mesh: Mesh, state: Any, zero1: bool = False) -> Any:
    """Per-leaf NamedShardings for a TrainState (or its jax.eval_shape
    abstraction).

    Defaults: everything replicated (pure DP — the gradient all-reduce over
    ICI is the reference's DDP).

    Tensor parallelism is a mesh-shape change: when the mesh ``model`` axis
    is larger than 1, every weight-normed kernel (leaves named ``w``, the
    same convention force_weight_norm keys on) shards its output-channel axis
    over ``model`` — params, Adam moments, and every EMA tree identically, so
    the elementwise optimizer/EMA updates stay shard-local and no resharding
    happens inside the step. GSPMD derives the activation shardings and the
    collectives from these parameter specs.

    With ``zero1``, the Adam moments and every EMA tree additionally shard
    their largest data-divisible axis over ``data`` (ZeRO-1 / optimizer-state
    sharding, SURVEY.md §2.3's FSDP note; composes with TP by skipping the
    model-sharded axis). Params stay data-replicated — XLA all-gathers the
    sharded Adam *updates* once per step (same bytes as the gradient
    all-reduce), so the only steady-state cost is one extra all-gather while
    per-chip memory drops by ~(1-1/N) of the moment + EMA bytes
    (ImageNet-512: mu+nu fp32 + 2 EMA trees = 16 B/param x 272.9M ~= 4.4 GB
    -> ~0.5 GB/chip on 8 chips)."""
    rep = replicated(mesh)
    shardings = jax.tree_util.tree_map(lambda _: rep, state)
    tp = mesh.shape[MODEL_AXIS]
    d = mesh.shape[DATA_AXIS]
    # TrainState (or its shape-abstraction) only; plain variables dicts (the
    # sampling path) always replicate
    tp_on = tp > 1 and hasattr(state, "params") and hasattr(state, "replace")
    if not (zero1 or tp_on):
        return shardings

    def opt_leaf(path, x):
        shape = getattr(x, "shape", ())
        base = (
            tp_param_spec(shape, tp) if (tp_on and _is_kernel(path)) else P()
        )
        if not zero1:
            return NamedSharding(mesh, base)
        taken = _TP_OUT_AXIS.get(len(shape)) if MODEL_AXIS in base else None
        zax = _zero1_axis(shape, d, skip=taken)
        if zax is None:
            return NamedSharding(mesh, base)
        merged = list(base) + [None] * (len(shape) - len(base))
        merged[zax] = DATA_AXIS
        return NamedSharding(mesh, P(*merged))

    return shardings.replace(
        # params take exactly the sampling-path kernel layout (all-replicated
        # when the model axis is trivial)
        params=variables_shardings(mesh, state.params),
        opt_state=jax.tree_util.tree_map_with_path(opt_leaf, state.opt_state),
        ema=jax.tree_util.tree_map_with_path(opt_leaf, state.ema),
    )


def variables_shardings(mesh: Mesh, variables: Any) -> Any:
    """Per-leaf NamedShardings for a flax ``variables`` dict (the sampling
    path): weight-normed kernels TP-shard over ``model`` when the mesh has a
    non-trivial model axis, everything else replicates. The sampler's jit
    should take these as its weight in_shardings so a model too large for
    one chip's HBM can sample across the model axis."""
    rep = replicated(mesh)
    tp = mesh.shape[MODEL_AXIS]
    if tp <= 1:
        return jax.tree_util.tree_map(lambda _: rep, variables)

    def leaf(path, x):
        if _is_kernel(path):
            return NamedSharding(mesh, tp_param_spec(x.shape, tp))
        return rep

    return jax.tree_util.tree_map_with_path(leaf, variables)


def place_variables(mesh: Mesh, variables: Any) -> Any:
    """Place a flax variables dict onto the mesh per ``variables_shardings``."""
    return jax.device_put(variables, variables_shardings(mesh, variables))


def place_state(mesh: Mesh, state: Any, zero1: bool = False) -> Any:
    """Place a host/abstract-placed train state onto the mesh: replicated
    (DP), kernel-sharded over ``model`` when the mesh has a non-trivial model
    axis (TP), and/or with ZeRO-1 sharded optimizer/EMA state when
    ``zero1``."""
    return jax.device_put(state, state_shardings(mesh, state, zero1))


def replicate_state(mesh: Mesh, state: Any) -> Any:
    """Place a train-state pytree over the mesh: replicated for a pure-DP
    mesh (35.6M-param models), TP-sharded kernels when the mesh model axis >
    1; see ``place_state(zero1=True)`` for the sharded-optimizer form.
    Plain variables dicts (sampling) always replicate."""
    return place_state(mesh, state)


@dataclasses.dataclass(frozen=True)
class ShardingPlan:
    """Shardings for the train step: batch data-split, scalars replicated,
    state replicated — or, with ``zero1``, optimizer/EMA state sharded over
    ``data`` (pass the placed state to ``jit_train_step`` so the per-leaf
    sharding tree can be derived). ``jit_train_step`` applies them + donates
    the state."""

    mesh: Mesh
    zero1: bool = False

    def _state_shardings(self, state):
        tp = self.mesh.shape[MODEL_AXIS] > 1
        if not (self.zero1 or tp):
            return replicated(self.mesh)  # pytree prefix: whole state
        if state is None:
            raise ValueError(
                "a zero1 or tensor-parallel ShardingPlan needs the state "
                "to derive per-leaf shardings"
            )
        return state_shardings(self.mesh, state, zero1=self.zero1)

    def jit_train_step(self, train_step, state=None):
        rep = replicated(self.mesh)
        st = self._state_shardings(state)
        # the batch sharding is a pytree PREFIX: every batch leaf (images,
        # labels, optional mask) splits its leading dim over ``data``
        data = batch_sharding(self.mesh)
        return jax.jit(
            train_step,
            in_shardings=(st, data, rep, rep),
            out_shardings=(st, rep),
            donate_argnums=(0,),
        )

    def jit_eval_step(self, eval_step, state=None):
        rep = replicated(self.mesh)
        st = self._state_shardings(state)
        data = batch_sharding(self.mesh)
        return jax.jit(
            eval_step,
            in_shardings=(st, data, rep),
            out_shardings=rep,
        )
