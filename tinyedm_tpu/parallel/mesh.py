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


def replicate_state(mesh: Mesh, state: Any) -> Any:
    """Fully replicate a train-state pytree over the mesh (DP for a 35.6M-param
    model; FSDP-style sharding of opt/EMA state along ``data`` is a
    PartitionSpec change here if memory ever demands it)."""
    return jax.device_put(state, replicated(mesh))


@dataclasses.dataclass(frozen=True)
class ShardingPlan:
    """Shardings for the train step: state replicated, batch data-split,
    scalars replicated. ``jit_train_step`` applies them + donates the state."""

    mesh: Mesh

    def jit_train_step(self, train_step):
        rep = replicated(self.mesh)
        # the batch sharding is a pytree PREFIX: every batch leaf (images,
        # labels, optional mask) splits its leading dim over ``data``
        data = batch_sharding(self.mesh)
        return jax.jit(
            train_step,
            in_shardings=(rep, data, rep, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )

    def jit_eval_step(self, eval_step):
        rep = replicated(self.mesh)
        data = batch_sharding(self.mesh)
        return jax.jit(
            eval_step,
            in_shardings=(rep, data, rep),
            out_shardings=rep,
        )
