"""Worker process for the multi-host test: 2 processes x 4 CPU devices.

Run as: python tests/_multihost_worker.py <coordinator> <world> <rank>
Prints MULTIHOST_OK on success.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from satellite_pose_estimation_tpu.parallel.multihost import (  # noqa: E402
    allgather_object,
    global_mesh,
    host_sharded_batch,
    init_distributed,
)


def main():
    coordinator, world, rank = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    init_distributed(coordinator, world, rank)
    assert jax.process_count() == world, jax.process_count()
    assert jax.device_count() == 4 * world, jax.device_count()
    assert jax.local_device_count() == 4

    mesh = global_mesh()
    assert mesh.devices.size == 8

    # per-host input sharding: each process contributes 4 distinct rows
    local = np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 100 * rank
    batch = host_sharded_batch({"x": local, "name": "b0"}, mesh)
    assert batch["x"].shape == (8, 3)  # global shape
    assert batch["name"] == "b0"

    # a jitted global reduction sees BOTH hosts' data
    total = jax.jit(lambda x: jnp.sum(x))(batch["x"])
    expected = sum(
        float((np.arange(12, dtype=np.float32) + 100 * r).sum())
        for r in range(world)
    )
    np.testing.assert_allclose(float(total), expected)

    # eval-log merge across processes
    gathered = allgather_object({"rank": np.asarray([rank])})
    assert sorted(np.asarray(gathered["rank"]).ravel().tolist()) == [0, 1]

    print(f"MULTIHOST_OK rank={rank} total={float(total)}", flush=True)


if __name__ == "__main__":
    main()
