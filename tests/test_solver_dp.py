"""SpeedSolver data-parallel pinning: the landmarker task must actually
build a dp>=2 mesh on a multi-device backend (the reference wraps BOTH the
train and eval loaders in DistributedSampler, R2/src/misc/dist.py:114-126),
and the sharded eval program must produce the same per-image poses/scores
as a single-device run — eval is dp with no cross-chip communication, which
is the premise the v5e-8 north-star projection rides on (BASELINE.md)."""
import os

import numpy as np
import pytest

from satellite_pose_estimation_tpu.core.yaml_config import YAMLConfig
from satellite_pose_estimation_tpu.parallel.mesh import create_mesh
from satellite_pose_estimation_tpu.train.solver import SpeedSolver

from tests.test_solver_integration import TINY_CFG, make_fake_speed


@pytest.fixture(scope="module")
def speed_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dp_speed"))
    make_fake_speed(root, n_images=12)
    # 8 train / 4 val so batch sizes 8 and 4 force a dp4 mesh on the
    # 8-virtual-device backend (auto_mesh takes the largest common divisor)
    np.savetxt(os.path.join(root, "annos/train_t.txt"),
               np.arange(0, 8), fmt="%d")
    np.savetxt(os.path.join(root, "annos/val_t.txt"),
               np.arange(8, 12), fmt="%d")
    return root


def _solver(root, out_dir, mesh=None):
    cfg = dict(TINY_CFG)
    cfg["train_dataloader"] = {
        "batch_size": 8, "dataset": {"index_file": "train_t.txt",
                                     "resize": 64},
    }
    cfg["val_dataloader"] = {
        "batch_size": 4, "dataset": {"index_file": "val_t.txt",
                                     "resize": 64, "train": False},
    }
    ycfg = YAMLConfig(cfg=cfg, output_dir=out_dir)
    s = SpeedSolver(ycfg, data_root=root, mesh=mesh, seed=7)
    s._build()
    return s


def test_speed_solver_builds_dp_mesh(speed_root, tmp_path):
    s = _solver(speed_root, str(tmp_path / "dp"))
    assert s.mesh is not None, "landmarker task must auto-build a dp mesh"
    assert s.mesh.devices.size == 4  # gcd-style largest divisor of (8, 4)


def test_sharded_eval_matches_single_device(speed_root, tmp_path):
    s_dp = _solver(speed_root, str(tmp_path / "dp"))
    s_1 = _solver(speed_root, str(tmp_path / "single"),
                  mesh=create_mesh(1))
    assert s_dp.mesh.devices.size == 4
    assert s_1.mesh.devices.size == 1

    stats_dp, ev_dp = s_dp.evaluate()
    stats_1, ev_1 = s_1.evaluate()

    # identical per-image results: same filenames, same poses, same scores
    assert set(ev_dp.log) == set(ev_1.log)
    for fname in ev_dp.log:
        a, b = ev_dp.log[fname], ev_1.log[fname]
        for key in ("quat_pr", "tvec_pr", "score", "points"):
            np.testing.assert_allclose(
                np.asarray(a[key], np.float64),
                np.asarray(b[key], np.float64),
                rtol=1e-5, atol=1e-6,
                err_msg=f"{fname}:{key} differs between dp4 and single",
            )
    assert stats_dp["score"] == pytest.approx(stats_1["score"], rel=1e-6)


def test_sharded_train_step_runs_on_dp_mesh(speed_root, tmp_path):
    """One sharded train epoch on the dp mesh: the full aug->model->match->
    loss->opt program executes under SPMD and yields finite losses."""
    import jax

    s = _solver(speed_root, str(tmp_path / "dp_train"))
    stats = s.train_one_epoch(0, jax.random.PRNGKey(0))
    assert np.isfinite(stats["loss_total"])
