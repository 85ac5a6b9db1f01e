"""Shipped COCO det configs (R2/configs/rtdetr/*_6x_coco.yml grid) load and
drive DetSolver's transform/model wiring."""
import os.path as osp

import numpy as np
import pytest

from satellite_pose_estimation_tpu.core.yaml_config import YAMLConfig

CFG_DIR = osp.join(osp.dirname(__file__), "..", "configs", "det")


def _load(name):
    return YAMLConfig(cfg_path=osp.join(CFG_DIR, name))


def test_r50vd_coco_config():
    cfg = _load("rtdetr_r50vd_6x_coco.yml")
    assert cfg.task == "detection"
    assert cfg.num_classes == 80
    assert cfg.yaml_cfg["PResNet"]["depth"] == 50
    assert cfg.yaml_cfg["RTDETRTransformer"]["num_queries"] == 300
    assert cfg.yaml_cfg["RTDETRTransformer"]["num_decoder_layers"] == 6
    # 13-entry multi-scale list, 640 weighted x3 (reference line 12)
    ms = cfg.yaml_cfg["RTDETR"]["multi_scale"]
    assert len(ms) == 13 and ms.count(640) == 3
    assert cfg.epoches == 72
    ops = cfg.yaml_cfg["train_dataloader"]["dataset"]["transforms"]["ops"]
    assert {o["type"] for o in ops} >= {
        "RandomPhotometricDistort", "RandomZoomOut", "RandomIoUCrop",
        "SanitizeBoundingBox", "RandomHorizontalFlip", "Resize",
    }


def test_r18vd_coco_config_overrides():
    cfg = _load("rtdetr_r18vd_6x_coco.yml")
    assert cfg.yaml_cfg["PResNet"]["depth"] == 18
    assert cfg.yaml_cfg["PResNet"]["freeze_norm"] is False
    assert cfg.yaml_cfg["HybridEncoder"]["expansion"] == 0.5
    assert cfg.yaml_cfg["RTDETRTransformer"]["num_decoder_layers"] == 3
    # the 3-group regex param spec replaces the base groups wholesale
    groups = cfg.yaml_cfg["optimizer"]["params"]
    assert len(groups) == 3
    assert any("(?!.*norm)" in g["params"] for g in groups)


def test_r101vd_coco_config_overrides():
    cfg = _load("rtdetr_r101vd_6x_coco.yml")
    assert cfg.yaml_cfg["PResNet"]["depth"] == 101
    assert cfg.yaml_cfg["HybridEncoder"]["hidden_dim"] == 384
    assert cfg.yaml_cfg["HybridEncoder"]["dim_feedforward"] == 2048


def test_build_model_uses_box_head_for_detection():
    """YAMLConfig.build_model on a det config must produce the 4-D box
    decoder (export/tooling path), not the 2-D keypoint flavor."""
    cfg = _load("rtdetr_r50vd_6x_coco.yml")
    model = cfg.build_model()
    assert model.config.box_dim == 4


def test_det_solver_builds_train_transforms(tmp_path):
    from satellite_pose_estimation_tpu.train.det_solver import DetSolver

    cfg = _load("rtdetr_r18vd_6x_coco.yml")
    cfg.yaml_cfg["output_dir"] = str(tmp_path / "out")
    solver = DetSolver(cfg, data_root=str(tmp_path))
    tf = solver._train_transforms()
    # ConvertBox (identity in our convention) is solver-owned and stripped;
    # the 7 augmentation/geometry ops remain
    assert tf is not None and len(tf.transforms) == 7

    sample = {
        "image": np.zeros((120, 160, 3), np.uint8),
        "boxes": np.asarray([[0.5, 0.5, 0.25, 0.5]]),
        "labels": np.asarray([3], np.int32),
    }
    out = tf(sample)
    assert out["image"].shape == (640, 640, 3)
    assert out["boxes"].shape[1] == 4


def test_det_solver_model_honors_config(tmp_path):
    from satellite_pose_estimation_tpu.train.det_solver import DetSolver

    cfg = _load("rtdetr_r101vd_6x_coco.yml")
    cfg.yaml_cfg["output_dir"] = str(tmp_path / "out")
    solver = DetSolver(cfg, data_root=str(tmp_path))
    # config plumbing only — no init/compile (r101 @640 is too big for a
    # unit test); _build is exercised at r18 scale in test_det_solver.py
    c = cfg.yaml_cfg
    assert c["HybridEncoder"]["hidden_dim"] == 384
    ds_cfg = c["train_dataloader"]["dataset"]
    assert ds_cfg["img_dir"] == "train2017"
    assert c["remap_mscoco_category"] is True
