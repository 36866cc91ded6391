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
    replicated,
    shard_batch,
)


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

    print(f"MULTIHOST_OK process={process_id}", flush=True)


if __name__ == "__main__":
    main()
