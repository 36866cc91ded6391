"""Device mesh + sharding layer.

The reference's entire distributed story is Lightning DDP over NCCL implied
by ``devices: -1, strategy: auto`` (conf/cifar10.yaml:4-8; SURVEY.md §2.4).
The TPU-native equivalent: one mesh over ICI with a ``data`` axis (DP,
first-class) and a ``model`` axis stub (size 1 by default) so tensor
sharding is a config change, not a rewrite. The jitted train step runs under
``jax.jit`` with NamedShardings: batch split on ``data``, state replicated —
XLA emits the gradient all-reduce over ICI, which *is* DDP.

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


def zero1_spec(shape: tuple, data_size: int) -> P:
    """ZeRO-1 PartitionSpec for one state leaf: split the largest axis that
    divides evenly by the data-axis size; leaves with no such axis (scalars,
    tiny gains) stay replicated. Ties prefer the LAST such axis — for conv
    kernels (HWIO) and stacked EMA copies that is the output-channel axis,
    which keeps the per-output weight-renorm reduction shard-local."""
    if data_size <= 1:
        return P()
    best = None
    for i, d in enumerate(shape):
        if d % data_size == 0 and d >= data_size:
            if best is None or d >= shape[best]:
                best = i
    if best is None:
        return P()
    return P(*([None] * best + [DATA_AXIS]))


def state_shardings(mesh: Mesh, state: Any, zero1: bool = False) -> Any:
    """Per-leaf NamedShardings for a TrainState (or its jax.eval_shape
    abstraction): everything replicated; with ``zero1``, the Adam moments and
    every EMA tree shard their largest data-divisible axis over ``data``
    (ZeRO-1 / optimizer-state sharding, SURVEY.md §2.3's FSDP note). Params
    stay replicated — XLA all-gathers the sharded Adam *updates* once per
    step (same bytes as the gradient all-reduce) and the EMA update reads the
    replicated params by local slice, so the only steady-state cost is one
    extra all-gather while per-chip memory drops by ~(1-1/N) of the moment +
    EMA bytes (ImageNet-512: mu+nu fp32 + 2 EMA trees = 16 B/param x 272.9M
    ~= 4.4 GB -> ~0.5 GB/chip on 8 chips)."""
    rep = replicated(mesh)
    shardings = jax.tree_util.tree_map(lambda _: rep, state)
    if not zero1:
        return shardings
    d = mesh.shape[DATA_AXIS]

    def shard_leaf(x):
        return NamedSharding(mesh, zero1_spec(getattr(x, "shape", ()), d))

    return shardings.replace(
        opt_state=jax.tree_util.tree_map(shard_leaf, state.opt_state),
        ema=jax.tree_util.tree_map(shard_leaf, state.ema),
    )


def place_state(mesh: Mesh, state: Any, zero1: bool = False) -> Any:
    """Place a host/abstract-placed train state onto the mesh: replicated, or
    with ZeRO-1 sharded optimizer/EMA state when ``zero1``."""
    return jax.device_put(state, state_shardings(mesh, state, zero1))


def replicate_state(mesh: Mesh, state: Any) -> Any:
    """Fully replicate a train-state pytree over the mesh (DP for a 35.6M-param
    model; see ``place_state(zero1=True)`` for the sharded-optimizer form)."""
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
        if not self.zero1:
            return replicated(self.mesh)  # pytree prefix: whole state
        if state is None:
            raise ValueError("zero1 ShardingPlan needs the state to derive shardings")
        return state_shardings(self.mesh, state, zero1=True)

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
