"""Whole-grid config exercise: EVERY shipped experiment YAML loads, builds
its model + criterion + optimizer settings, and its filename-encoded
experiment axes (backbone family, loss flavor, fold split, input size)
match what the merged config actually says.

Mirrors the reference experiment grid R2/configs/rtdetr_speed/ (54 leaf
files = {r18vd,r50vd,mobilenetv3} x {plain,kl} x {split 1..6} x {256,512})
+ R2/configs/rtdetr/*_6x_coco.yml + the R1 flagship recipe (gen_single.sh).
A key typo in any leaf file would otherwise ship silently (round-2 verdict:
only 2 of 79 were load-tested).
"""
import os.path as osp
import re

import numpy as np
import pytest

from satellite_pose_estimation_tpu.core.yaml_config import YAMLConfig

CFG_ROOT = osp.join(osp.dirname(__file__), "..", "configs")


def _leaf_configs(sub):
    import glob

    return sorted(
        osp.basename(p)
        for p in glob.glob(osp.join(CFG_ROOT, sub, "*.yml"))
    )


SPEED_CFGS = _leaf_configs("speed")
DET_CFGS = _leaf_configs("det")


def test_grid_is_complete():
    """73 speed leaves: 1 R1 DETR + 72 RT-DETR ({3 backbones} x {plain,kl}
    x {6 splits} x {256,512}); 3 det leaves."""
    assert len(SPEED_CFGS) == 73
    assert len(DET_CFGS) == 3
    rtdetr = [c for c in SPEED_CFGS if c.startswith("rtdetr_")]
    assert len(rtdetr) == 72
    for fam in ("r50vd", "r18vd", "mobilenetv3"):
        for loss in ("", "kl_"):
            for split in range(1, 7):
                for size in ("", "_512"):
                    name = f"rtdetr_{fam}_{loss}{split}{size}.yml"
                    assert name in SPEED_CFGS, f"missing grid cell {name}"


@pytest.mark.parametrize("name", SPEED_CFGS)
def test_speed_config_loads_and_matches_filename(name):
    cfg = YAMLConfig(cfg_path=osp.join(CFG_ROOT, "speed", name))
    assert cfg.task == "landmarker"
    assert cfg.num_classes == 11
    model = cfg.build_model()
    crit = cfg.criterion_config()
    tr = cfg.dataloader_settings("train")
    va = cfg.dataloader_settings("val")
    tc = cfg.train_config(steps_per_epoch=10)

    if name.startswith("detr_"):
        # R1 flagship recipe (gen_single.sh: resnet50s8, enc/dec 4)
        assert cfg.model_name == "DETR"
        assert model.config.backbone == "resnet50s8"
        assert crit.point_loss == "smooth_l1"
        assert crit.eos_coef == pytest.approx(0.1)
        assert not crit.use_focal  # R1 matcher: softmax class cost
        return

    # Every R2 speed recipe shares use_focal_loss: True into the matcher
    # (sigmoid class cost, R2/configs/rtdetr_speed/include/*.yml:60 +
    # matcher __share__).
    assert crit.use_focal

    m = re.match(
        r"rtdetr_(r50vd|r18vd|mobilenetv3)_(kl_)?([1-6])(_512)?\.yml", name
    )
    assert m, f"unrecognized grid filename {name}"
    fam, kl, split, is512 = m.group(1), m.group(2), int(m.group(3)), bool(
        m.group(4)
    )

    # backbone family (R2 include/rtdetr_{r50vd,mobilenet,...}.yml)
    if fam == "mobilenetv3":
        assert model.config.backbone == "mobilenetv3_large"
        # mobilenet runs 2x the schedule (R2 configs: epoches 192,
        # milestone 96)
        assert cfg.epoches == 192
        assert tuple(cfg.yaml_cfg["lr_scheduler"]["milestones"]) == (96,)
    else:
        assert model.config.backbone == "presnet"
        assert model.config.depth == {"r50vd": 50, "r18vd": 18}[fam]
        assert cfg.epoches == 96

    # loss flavor (losses: ['labels','points'] vs ['labels','points_uncert'])
    losses = cfg.yaml_cfg["SetCriterion"]["losses"]
    if kl:
        assert losses == ["labels", "points_uncert"]
        assert crit.point_loss == "uncert"
    else:
        assert losses == ["labels", "points"]
        assert crit.point_loss == "l1"

    # fold split index files (R1/annos train_[1-6].txt / val_[1-6].txt)
    assert tr.index_file == f"train_{split}.txt"
    assert va.index_file == f"val_{split}.txt"

    # input size + the 512 batch reduction
    size = 512 if is512 else 256
    assert tr.resize == size and va.resize == size
    assert tr.batch_size == (16 if is512 else 50)
    assert va.batch_size == (16 if is512 else 50)

    # shared RT-DETR speed settings (R2 leaf configs: 30 queries, 3 decoder
    # layers, AdamW 3e-4 / backbone 3e-5, EMA 0.9999/2000, clip 0.1)
    assert model.config.num_queries == 30
    assert model.config.num_decoder_layers == 3
    assert model.config.box_dim == 2
    assert crit.cost_class == pytest.approx(2.0)
    assert crit.cost_pts == pytest.approx(5.0)
    assert crit.eos_coef == pytest.approx(1e-4)
    assert tc.lr == pytest.approx(3e-4)
    assert tc.lr_backbone == pytest.approx(3e-5)
    assert tc.use_ema and tc.ema_decay == pytest.approx(0.9999)
    assert tc.clip_max_norm == pytest.approx(0.1)
    assert cfg.checkpoint_step == 12
    # 3-group regex optimizer spec present in every leaf via the include
    assert len(cfg.yaml_cfg["optimizer"]["params"]) == 3
    # output_dir is per-experiment and matches the filename stem
    assert cfg.output_dir.endswith(name[:-4])


@pytest.mark.parametrize("name", DET_CFGS)
def test_det_config_loads(name):
    cfg = YAMLConfig(cfg_path=osp.join(CFG_ROOT, "det", name))
    assert cfg.task == "detection"
    assert cfg.num_classes == 80
    model = cfg.build_model()
    assert model.config.box_dim == 4
    depth = int(re.search(r"_r(\d+)vd_", name).group(1))
    assert model.config.depth == depth
    tr = cfg.dataloader_settings("train")
    assert tr.batch_size > 0
    ops = cfg.yaml_cfg["train_dataloader"]["dataset"]["transforms"]["ops"]
    assert any(o["type"] == "Resize" for o in ops)


# ---------------------------------------------------------------------------
# One init + optimizer-group + tiny forward per backbone family: proves the
# merged config drives a real program, not just dataclass plumbing.
# ---------------------------------------------------------------------------

_FAMILY_REPRESENTATIVE = {
    "r50vd": "rtdetr_r50vd_kl_2_512.yml",
    "r18vd": "rtdetr_r18vd_3.yml",
    "mobilenetv3": "rtdetr_mobilenetv3_kl_4.yml",
    "detr": "detr_r50s8.yml",
}


@pytest.mark.parametrize("fam", sorted(_FAMILY_REPRESENTATIVE))
def test_family_representative_builds_and_runs(fam):
    import jax
    import jax.numpy as jnp

    name = _FAMILY_REPRESENTATIVE[fam]
    cfg = YAMLConfig(cfg_path=osp.join(CFG_ROOT, "speed", name))
    model = cfg.build_model()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    q = model.config.num_queries
    assert out["pred_logits"].shape == (2, q, 12)
    assert out["pred_points"].shape == (2, q, 2)
    if fam != "detr" and cfg.criterion_config().point_loss == "uncert":
        assert out["pred_sigmas"].shape == (2, q, 2)
    for leaf in jax.tree_util.tree_leaves(out):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))

    # registry optimizer built from the shipped regex groups: every group
    # matches a non-empty param set and the union is a partition
    tx = cfg.build_tx(variables["params"], steps_per_epoch=10)
    if cfg.yaml_cfg.get("optimizer", {}).get("params"):
        assert tx is not None
        from satellite_pose_estimation_tpu.train.optim import (
            build_param_groups,
        )

        labels, groups = build_param_groups(
            cfg.yaml_cfg["optimizer"]["params"], variables["params"]
        )
        import flax

        flat_labels = list(
            flax.traverse_util.flatten_dict(labels).values()
        )
        n_groups = len(cfg.yaml_cfg["optimizer"]["params"])
        for g in range(n_groups):
            # torch-parity quirk: mobilenetv3 names its BatchNorms bn1/Bn1
            # (R2/nn/backbone/mobilenetv3.py:53-70,138-140) so the shared
            # 'backbone...norm' regex group matches NOTHING for that family
            # in the reference too — an empty g0 is the correct membership.
            if fam == "mobilenetv3" and g == 0:
                assert flat_labels.count("g0") == 0
                continue
            assert flat_labels.count(f"g{g}") > 0, (
                f"regex group g{g} matched nothing in {name}"
            )
        # default catch-all holds the remainder
        assert flat_labels.count(f"g{n_groups}") > 0
