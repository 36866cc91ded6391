"""Worker for the 2-process distributed-CPU integration test.

Run as: python tests/_multihost_worker.py <process_id> <coordinator_port>

Each process owns 4 virtual CPU devices (8 global), initializes
jax.distributed with gloo CPU collectives, builds the global (data, model)
mesh, feeds its disjoint per-process slice through shard_batch, and checks
that (a) a global reduction over the assembled array equals the full-batch
value and (b) a psum'd eval-style metric matches the single-process answer.
This exercises the multi-host branch of parallel/mesh.py end to end
(SURVEY.md §2.4 per-host input pipeline) without TPU hardware.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tinyedm_tpu.parallel.mesh import (  # noqa: E402
    ShardingPlan,
    make_mesh,
    place_state,
    replicated,
    shard_batch,
)


def _assemble(x) -> np.ndarray:
    """Reassemble a (possibly sharded) global array from the process's
    addressable shards. Valid here because the data axis replicates every
    model-axis shard into both processes (TP pairs sit within a process)."""
    out = np.zeros(x.shape, np.asarray(x.addressable_shards[0].data).dtype)
    for s in x.addressable_shards:
        out[s.index] = np.asarray(s.data)
    return out


def main() -> None:
    process_id = int(sys.argv[1])
    port = sys.argv[2]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    mesh = make_mesh()
    assert dict(mesh.shape) == {"data": 8, "model": 1}

    # global batch known to every process; shard_batch slices per-process
    global_batch = 16
    images = np.arange(global_batch * 4, dtype=np.float32).reshape(global_batch, 4)
    labels = np.arange(global_batch, dtype=np.int32)
    batch = shard_batch(mesh, (images, labels))

    plan = ShardingPlan(mesh)

    @jax.jit
    def global_sums(b):
        imgs, labs = b
        return jnp.sum(imgs), jnp.sum(labs)

    s_img, s_lab = jax.jit(
        global_sums, out_shardings=(replicated(mesh), replicated(mesh))
    )(batch)
    np.testing.assert_allclose(float(s_img), images.sum())
    assert int(s_lab) == int(labels.sum())

    # psum-style metric reduction across the data axis (the eval-step shape)
    def metric(b):
        imgs, _ = b
        return {"sse": jnp.sum(imgs * imgs), "count": jnp.asarray(imgs.shape[0], jnp.float32)}

    out = plan.jit_eval_step(lambda state, b, rng: metric(b))(None, batch, None)
    np.testing.assert_allclose(float(out["sse"]), (images * images).sum(), rtol=1e-6)
    np.testing.assert_allclose(float(out["count"]), global_batch)

    # ---- phase 2: multihost x TP x zero1 as one real program (VERDICT r4
    # next #8). A (data=4, model=2) mesh whose data axis SPANS the two
    # processes while TP pairs sit within each process; the full train step
    # (forced renorm, Adam, EMA, psum'd metrics) runs with ZeRO-1 sharded
    # optimizer state, and the result is checked against a bare
    # single-device step on the same full batch.
    from tests.test_train_step import tiny_model  # noqa: E402

    from tinyedm_tpu.diffusion.diffuser import Diffuser  # noqa: E402
    from tinyedm_tpu.training.ema import EMAConfig  # noqa: E402
    from tinyedm_tpu.training.train_step import (  # noqa: E402
        OptimizerConfig,
        init_train_state,
        make_train_step,
    )

    mesh42 = make_mesh(model_parallel=2)
    assert dict(mesh42.shape) == {"data": 4, "model": 2}
    # TP pairs are consecutive devices -> within one process (4 local devs)
    for row in mesh42.devices:
        assert row[0].process_index == row[1].process_index

    model = tiny_model()
    diffuser = Diffuser(-1.2, 1.2)
    cfg = OptimizerConfig(lr=1e-3, rampup_steps=1, steady_steps=2)
    ema_cfg = EMAConfig(sigma_rels=(0.13,))
    img = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 8, 1))
    labs16 = np.zeros((16,), np.int32)

    state = place_state(
        mesh42,
        init_train_state(jax.random.PRNGKey(1), model, img, cfg, ema_cfg),
        zero1=True,
    )
    step = ShardingPlan(mesh42, zero1=True).jit_train_step(
        make_train_step(model, diffuser, cfg, ema_cfg), state=state
    )
    tp_batch = shard_batch(mesh42, (np.asarray(img), labs16))
    state, metrics = step(
        state, tp_batch, jax.random.PRNGKey(2), jnp.asarray(0.0)
    )
    jax.block_until_ready(state)
    assert int(state.step) == 1

    # ground truth: bare jit on this process's local device, full batch
    ref_state = init_train_state(jax.random.PRNGKey(1), model, img, cfg, ema_cfg)
    ref_step = jax.jit(make_train_step(model, diffuser, cfg, ema_cfg))
    ref_state, ref_metrics = ref_step(
        ref_state,
        (jnp.asarray(img), jnp.asarray(labs16)),
        jax.random.PRNGKey(2),
        jnp.asarray(0.0),
    )
    np.testing.assert_allclose(
        float(metrics["train_loss"]),
        float(ref_metrics["train_loss"]),
        rtol=1e-4,
    )
    assert float(metrics["count"]) == 16.0  # global count across processes
    # an updated TP-sharded kernel, reassembled from local shards, matches
    # the single-device update (tolerance = float reduction order)
    w = _assemble(state.params["denoiser"]["conv_in"]["w"])
    np.testing.assert_allclose(
        w, np.asarray(ref_state.params["denoiser"]["conv_in"]["w"]),
        rtol=2e-4, atol=2e-6,
    )
    # zero1 moment shards really span the mesh (not replicated)
    assert any(
        not leaf.sharding.is_fully_replicated
        for leaf in jax.tree_util.tree_leaves(state.opt_state)
        if hasattr(leaf, "sharding") and leaf.ndim > 0
    )

    print(f"MULTIHOST_OK process={process_id}", flush=True)


if __name__ == "__main__":
    main()
