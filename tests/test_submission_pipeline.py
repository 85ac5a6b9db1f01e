"""gen_submission pipeline end-to-end on a synthetic detector-box dataset."""
import json
import os

import numpy as np
import pytest


def make_fake_submission_data(root, n_images=4, rng=None):
    import cv2
    from PIL import Image

    rng = rng or np.random.RandomState(0)
    os.makedirs(os.path.join(root, "annos"), exist_ok=True)
    os.makedirs(os.path.join(root, "images/real_test"), exist_ok=True)
    os.makedirs(os.path.join(root, "images/test"), exist_ok=True)

    for split, img_dir, name in (
        ("real", "images/real_test", "wz_real_test.json"),
        ("synt", "images/test", "wz_synt_test.json"),
    ):
        boxes = {}
        for i in range(n_images):
            fn = f"img{i:06d}{'real' if split == 'real' else ''}.jpg"
            img = rng.randint(0, 255, (75, 120, 3)).astype(np.uint8)
            img = cv2.resize(img, (1920, 1200), interpolation=cv2.INTER_CUBIC)
            Image.fromarray(img).save(os.path.join(root, img_dir, fn),
                                      quality=85)
            x1 = float(rng.uniform(300, 1200))
            y1 = float(rng.uniform(200, 700))
            boxes[fn] = [[x1, y1, x1 + 300.0, y1 + 250.0, 0.99]]
        with open(os.path.join(root, "annos", name), "w") as f:
            json.dump(boxes, f)
    return root


def test_gen_submission_single_end_to_end(tmp_path, rng, monkeypatch):
    from satellite_pose_estimation_tpu.core.yaml_config import YAMLConfig
    from satellite_pose_estimation_tpu.data.dataset import (
        SpeedSubmissionDataset,
    )
    from satellite_pose_estimation_tpu.tools.gen_submission_single import (
        gen_submission,
    )
    from satellite_pose_estimation_tpu.train.solver import SpeedSolver
    from satellite_pose_estimation_tpu.utils.submission import SubmissionWriter

    root = make_fake_submission_data(str(tmp_path / "speed"), rng=rng)
    cfg = YAMLConfig(cfg={
        "task": "landmarker",
        "model": "RTDETR",
        "num_classes": 11,
        "output_dir": str(tmp_path / "out"),
        "PResNet": {"depth": 18, "freeze_norm": False},
        "HybridEncoder": {"hidden_dim": 32, "nhead": 4, "dim_feedforward": 64,
                          "expansion": 0.5},
        "RTDETRTransformer": {"num_queries": 12, "num_decoder_layers": 2},
        "SetCriterion": {"losses": ["labels", "points_uncert"]},
        "train_dataloader": {"batch_size": 2, "dataset": {"resize": 64}},
        "val_dataloader": {"batch_size": 2,
                           "dataset": {"resize": 64, "train": False}},
    })

    solver = SpeedSolver(cfg, data_root=root, seed=0)
    # Build only the model/eval step (no train dataset on disk): mimic the
    # tool's path by building from a minimal synthetic train set.
    import jax
    import jax.numpy as jnp

    from satellite_pose_estimation_tpu.geometry.solvers import SolverConfig
    from satellite_pose_estimation_tpu.train.state import create_train_state
    from satellite_pose_estimation_tpu.train.steps import make_eval_step

    solver.model = cfg.build_model()
    solver.state = create_train_state(
        solver.model, jax.random.PRNGKey(0),
        jnp.zeros((2, 64, 64, 3), jnp.float32), cfg.train_config(),
    )
    solver.eval_step = make_eval_step(
        solver_cfg=SolverConfig(input_size=64), out_size=64, solver="sigma"
    )

    writer = SubmissionWriter()
    real_ds = SpeedSubmissionDataset(root, "wz_real_test.json",
                                     "images/real_test", resize=64)
    synt_ds = SpeedSubmissionDataset(root, "wz_synt_test.json",
                                     "images/test", resize=64)
    gen_submission(solver, real_ds, writer, writer.append_real_test, 2)
    gen_submission(solver, synt_ds, writer, writer.append_test, 2)
    path = writer.export(str(tmp_path), suffix="t")

    with open(path) as f:
        lines = f.read().splitlines()
    assert len(lines) == 8  # 4 synt + 4 real
    # synt rows first, sorted; each row filename + 7 numbers
    first = lines[0].split(",")
    assert first[0] == "img000000.jpg"
    assert len(first) == 8
    assert lines[4].split(",")[0] == "img000000real.jpg"
    for line in lines:
        vals = [float(v) for v in line.split(",")[1:]]
        assert all(np.isfinite(vals))
