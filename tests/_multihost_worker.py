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
# Share the suite's persistent compilation cache: on this 1-core host a
# cold compile under concurrent load can exceed the parent's subprocess
# timeout (which kills with SIGKILL — historically misread as host OOM);
# warm-cache runs finish in seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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

    # one REAL sharded train step across both hosts: each process feeds its
    # local half of the global batch; gradients reduce over all 8 devices.
    from jax.sharding import NamedSharding, PartitionSpec as P

    from satellite_pose_estimation_tpu.data.augment import AugmentConfig
    from satellite_pose_estimation_tpu.losses.criterion import (
        CriterionConfig)
    from satellite_pose_estimation_tpu.models.detr import (
        DETRConfig, DETRKeypointModel)
    from satellite_pose_estimation_tpu.train.state import (
        TrainConfig, create_train_state)
    from satellite_pose_estimation_tpu.train.steps import make_train_step

    model = DETRKeypointModel(DETRConfig(
        backbone="resnet18", hidden_dim=32, nheads=4, enc_layers=1,
        dec_layers=2, dim_feedforward=64, num_queries=16, dropout=0.0))
    tc = TrainConfig()
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((2, 64, 64, 3), jnp.float32), tc)
    state = jax.device_put(state, NamedSharding(mesh, P()))

    r = np.random.RandomState(rank)
    local_b = 8  # global batch 16
    train_batch = host_sharded_batch({
        "image": r.randint(0, 255, (local_b, 96, 96, 3)).astype(np.uint8),
        "clip_bbox_buf": np.tile(
            np.float32([4, 4, 92, 92]), (local_b, 1)),
        "landmarks_buf": (r.rand(local_b, 11, 2) * 80 + 5).astype(
            np.float32),
        "labels": np.tile(np.arange(11, dtype=np.int32), (local_b, 1)),
    }, mesh)
    step = make_train_step(CriterionConfig(), tc, AugmentConfig(out_size=64))
    state, losses = step(state, train_batch, jax.random.PRNGKey(1))
    loss = float(losses["loss_total"])
    assert np.isfinite(loss), loss
    # every process must see the SAME globally reduced loss
    all_losses = np.asarray(
        allgather_object(np.asarray([loss], np.float32))).ravel()
    np.testing.assert_allclose(all_losses, all_losses[0], rtol=1e-6)

    # cross-process meter sync (the reference's MetricLogger all_reduce,
    # R2/src/misc/logger.py:37-48): counts/totals sum over ranks
    from satellite_pose_estimation_tpu.utils.metric_logger import (
        MetricLogger)

    logger = MetricLogger()
    logger.update(loss=float(rank + 1))  # rank0: 1.0, rank1: 2.0
    logger.synchronize_between_processes()
    assert logger.meters["loss"].count == world
    np.testing.assert_allclose(
        logger.meters["loss"].global_avg, 1.5 if world == 2 else 1.0)

    print(f"MULTIHOST_OK rank={rank} total={float(total)} "
          f"loss={loss:.4f}", flush=True)


if __name__ == "__main__":
    main()
