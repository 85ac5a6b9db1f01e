"""Full-framework integration: synthetic SPEED dataset on disk -> config ->
SpeedSolver.fit (train + per-epoch eval + checkpoints + logs) -> resume."""
import json
import os

import numpy as np
import pytest

import cv2
import jax
import jax.numpy as jnp
from PIL import Image

from satellite_pose_estimation_tpu.geometry.camera import Camera, WORLD_POINTS
from satellite_pose_estimation_tpu.geometry.rotations import rotmat_to_quat


def make_fake_speed(root, n_images=8, rng=None):
    rng = rng or np.random.RandomState(0)
    os.makedirs(os.path.join(root, "annos"), exist_ok=True)
    os.makedirs(os.path.join(root, "images/train"), exist_ok=True)

    anns = []
    for i in range(n_images):
        rvec = rng.randn(3) * 0.5
        tvec = np.array(
            [rng.uniform(-0.5, 0.5), rng.uniform(-0.3, 0.3),
             rng.uniform(18.0, 30.0)]
        )
        pts, _ = cv2.projectPoints(
            WORLD_POINTS, rvec, tvec, Camera.K, np.zeros(5)
        )
        pts = pts.reshape(-1, 2)
        R, _ = cv2.Rodrigues(rvec)
        q = np.asarray(rotmat_to_quat(jnp.asarray(R)))

        x1, y1 = pts.min(0) - 10
        x2, y2 = pts.max(0) + 10
        filename = f"img{i:06d}.jpg"
        # Small random image upscaled so keypoint areas have texture.
        img = rng.randint(0, 255, (75, 120, 3)).astype(np.uint8)
        img = cv2.resize(img, (1920, 1200), interpolation=cv2.INTER_CUBIC)
        Image.fromarray(img).save(
            os.path.join(root, "images/train", filename), quality=80
        )
        anns.append(
            {
                "filename": filename,
                "landmarks": pts.tolist(),
                "bbox_xxyy": [float(x1), float(y1), float(x2), float(y2)],
                "q_vbs2tango": q.tolist(),
                "r_Vo2To_vbs_true": tvec.tolist(),
            }
        )

    with open(os.path.join(root, "annos/wz_train.json"), "w") as f:
        json.dump(anns, f)
    np.savetxt(
        os.path.join(root, "annos/train_t.txt"),
        np.arange(0, n_images - 2), fmt="%d",
    )
    np.savetxt(
        os.path.join(root, "annos/val_t.txt"),
        np.arange(n_images - 2, n_images), fmt="%d",
    )
    return root


TINY_CFG = {
    "task": "landmarker",
    "model": "RTDETR",
    "num_classes": 11,
    "epoches": 1,
    "checkpoint_step": 1,
    "log_step": 1,
    # shipped speed configs run with ModelEMA on (reference include);
    # with freeze_norm False this exercises EMA of weights AND BN stats
    "use_ema": True,
    "PResNet": {"depth": 18, "freeze_norm": False},
    "HybridEncoder": {"hidden_dim": 32, "nhead": 4, "dim_feedforward": 64,
                      "expansion": 0.5},
    "RTDETRTransformer": {"num_queries": 12, "num_decoder_layers": 2},
    "SetCriterion": {
        "losses": ["labels", "points_uncert"],
        "weight_dict": {"loss_ce": 1, "loss_bbox": 5},
        "matcher": {"weight_dict": {"cost_class": 2, "cost_bbox": 5}},
    },
    "optimizer": {"lr": 1e-4},
    "lr_scheduler": {"milestones": [1000]},
    "train_dataloader": {
        "batch_size": 3,
        "dataset": {"index_file": "train_t.txt", "resize": 64},
    },
    "val_dataloader": {
        "batch_size": 2,
        "dataset": {"index_file": "val_t.txt", "resize": 64, "train": False},
    },
}


def test_solver_fit_eval_checkpoint_resume(tmp_path, rng):
    from satellite_pose_estimation_tpu.core.yaml_config import YAMLConfig
    from satellite_pose_estimation_tpu.train.solver import SpeedSolver

    root = make_fake_speed(str(tmp_path / "speed"), rng=rng)
    out_dir = str(tmp_path / "out")

    cfg = YAMLConfig(cfg=dict(TINY_CFG), output_dir=out_dir)
    solver = SpeedSolver(cfg, data_root=root, seed=0)
    solver.fit()

    # logs + eval dump + checkpoints exist
    assert os.path.exists(os.path.join(out_dir, "log.txt"))
    assert os.path.exists(os.path.join(out_dir, "eval_0000_log.json"))
    assert os.path.isdir(os.path.join(out_dir, "checkpoint"))
    with open(os.path.join(out_dir, "log.txt")) as f:
        entry = json.loads(f.readline())
    assert "train_loss_total" in entry and "test_score" in entry
    assert np.isfinite(entry["train_loss_total"])
    # Untrained-ish model: score should be near the 1+pi anchor or below.
    assert 0 <= entry["test_score"] <= 4.2

    with open(os.path.join(out_dir, "eval_0000_log.json")) as f:
        eval_log = json.load(f)
    assert len(eval_log) == 2  # two val images
    for item in eval_log.values():
        assert "points" in item and "score" in item and "sigma" in item

    # resume: restores epoch counter and runs another epoch
    cfg2 = YAMLConfig(cfg=dict(TINY_CFG), output_dir=out_dir, epoches=2)
    solver2 = SpeedSolver(cfg2, data_root=root, seed=0)
    solver2.resume(os.path.join(out_dir, "checkpoint"))
    solver2.fit()
    assert solver2.start_epoch == 1
    # EMA shadows (weights + BN stats) survived the checkpoint round trip
    assert solver2.state.ema_params is not None
    assert solver2.state.ema_batch_stats is not None


def test_yaml_config_files_load():
    from satellite_pose_estimation_tpu.core.yaml_config import YAMLConfig

    cfg = YAMLConfig("configs/speed/rtdetr_r50vd_kl_1.yml")
    assert cfg.task == "landmarker"
    assert cfg.num_classes == 11
    assert cfg.criterion_config().point_loss == "uncert"
    assert cfg.criterion_config().cost_class == 2.0
    tc = cfg.train_config(steps_per_epoch=10)
    assert tc.lr == pytest.approx(3e-4)
    assert tc.lr_backbone == pytest.approx(3e-5)
    # ModelEMA on, reference include values
    # (R2/configs/rtdetr_speed/include/optimizer.yml:1-5)
    assert tc.use_ema and tc.ema_decay == pytest.approx(0.9999)
    assert tc.ema_warmups == pytest.approx(2000)
    # 3-group regex param spec (backbone-norm no-decay, backbone,
    # encoder/decoder norm/bias no-decay)
    groups = cfg.yaml_cfg["optimizer"]["params"]
    assert len(groups) == 3
    assert any("(?!.*norm)" in g["params"] for g in groups)
    model = cfg.build_model()
    assert model.config.depth == 50
    assert model.config.num_queries == 30

    cfg_r1 = YAMLConfig("configs/speed/detr_r50s8.yml")
    assert cfg_r1.model_name == "DETR"
    m1 = cfg_r1.build_model()
    assert m1.config.backbone == "resnet50s8"
    assert cfg_r1.criterion_config().point_loss == "smooth_l1"
    assert cfg_r1.criterion_config().eos_coef == pytest.approx(0.1)


def test_r2_format_config_compat(tmp_path):
    """The loader must accept R2's shipped config schema (same keys)."""
    from satellite_pose_estimation_tpu.core.yaml_config import YAMLConfig

    base = tmp_path / "base.yml"
    exp = tmp_path / "exp.yml"
    base.write_text(
        "num_classes: 11\n"
        "PResNet:\n  depth: 50\n  freeze_at: -1\n  freeze_norm: False\n"
        "HybridEncoder:\n  hidden_dim: 256\n  expansion: 0.5\n"
        "  eval_spatial_size: [256, 256]\n"
    )
    exp.write_text(
        f"__include__: ['{base}']\n"
        "task: landmarker\n"
        "RTDETRTransformer:\n  eval_idx: -1\n  num_decoder_layers: 3\n"
        "  num_denoising: 0\n  num_queries: 30\n"
        "SetCriterion:\n  weight_dict: {loss_ce: 1, loss_bbox: 5}\n"
        "  losses: ['labels', 'points_uncert']\n"
        "optimizer:\n  type: AdamW\n  lr: 0.0003\n"
        "  params:\n    - params: '^(?=.*backbone)(?=.*norm).*$'\n"
        "      lr: 0.00003\n      weight_decay: 0.\n"
        "lr_scheduler:\n  type: MultiStepLR\n  milestones: [1000]\n  gamma: 0.1\n"
    )
    cfg = YAMLConfig(str(exp))
    model = cfg.build_model()
    assert model.config.depth == 50
    assert model.config.num_decoder_layers == 3
    assert cfg.criterion_config().point_loss == "uncert"
    assert cfg.train_config().lr_backbone == pytest.approx(3e-5)


def test_batches_prefetch_equivalence(tmp_path, rng):
    """Prefetched iteration must yield exactly the batches the synchronous
    path yields (same order, same contents), and propagate loader errors."""
    from satellite_pose_estimation_tpu.data.dataset import SpeedTrainDataset

    root = make_fake_speed(str(tmp_path), n_images=8, rng=rng)

    def make_ds():
        return SpeedTrainDataset(
            root, ann_file="wz_train.json", index_file="train_t.txt",
            img_dir="images/train", resize=64, train=True, seed=3,
        )

    # fresh datasets: the shuffle rng advances per epoch
    sync = list(make_ds().batches(2, pad_last=True, drop_last=False,
                                  prefetch=0))
    pre = list(make_ds().batches(2, pad_last=True, drop_last=False,
                                 prefetch=2))
    assert len(sync) == len(pre) == 3
    for a, b in zip(sync, pre):
        assert a.keys() == b.keys()
        for k in a:
            if k == "filename":
                assert list(a[k]) == list(b[k])
            elif k == "pad":
                assert a[k] == b[k]
            else:
                np.testing.assert_array_equal(a[k], b[k])

    # errors raised on the producer thread surface at the consumer
    ds = make_ds()
    ds.img_dir = "does/not/exist"
    with pytest.raises(Exception):
        list(ds.batches(2, prefetch=2))


def test_decode_cache_equivalence(tmp_path, rng, monkeypatch):
    """The decoded-frame RAM cache must be transparent: identical samples
    with the cache on (default, small dataset) and off (SPE_DECODE_CACHE=0),
    and repeat-epoch reads on the deterministic val path are bit-identical
    to the first epoch."""
    from satellite_pose_estimation_tpu.data.dataset import SpeedTrainDataset

    root = make_fake_speed(str(tmp_path), n_images=6, rng=rng)

    def make_ds(train):
        return SpeedTrainDataset(
            root, ann_file="wz_train.json", index_file="train_t.txt",
            img_dir="images/train", resize=64, train=train, seed=3,
        )

    cached = make_ds(train=True)
    assert cached._decode_cache is not None
    monkeypatch.setenv("SPE_DECODE_CACHE", "0")
    plain = make_ds(train=True)
    assert plain._decode_cache is None
    monkeypatch.delenv("SPE_DECODE_CACHE")

    for i in range(len(cached)):
        a, b = cached[i], plain[i]
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["landmarks_buf"], b["landmarks_buf"])
    assert len(cached._decode_cache) == len(cached)

    # repeat epoch through the cache: val crops are deterministic
    val = make_ds(train=False)
    e1 = [val[i]["image"] for i in range(len(val))]
    e2 = [val[i]["image"] for i in range(len(val))]
    for a, b in zip(e1, e2):
        np.testing.assert_array_equal(a, b)


def test_packed_cache_equivalence(tmp_path, rng, monkeypatch):
    """Deterministic-path packed-sample cache (round 5): val samples served
    from the packed cache are identical to the uncached path, train mode
    never caches (stochastic crops), the decoded-frame cache is skipped
    when the packed cache covers the split, and a cached sample cannot be
    mutated in place."""
    from satellite_pose_estimation_tpu.data.dataset import SpeedTrainDataset

    root = make_fake_speed(str(tmp_path), n_images=6, rng=rng)

    def make_ds(train):
        return SpeedTrainDataset(
            root, ann_file="wz_train.json", index_file="train_t.txt",
            img_dir="images/train", resize=64, train=train, seed=3,
        )

    val = make_ds(train=False)
    assert val._packed_cache is not None
    monkeypatch.setenv("SPE_PACKED_CACHE", "0")
    plain = make_ds(train=False)
    assert plain._packed_cache is None
    monkeypatch.delenv("SPE_PACKED_CACHE")

    first = [val[i] for i in range(len(val))]          # fills the cache
    assert len(val._packed_cache) == len(val)
    # packed cache covers the split -> decoded frames were not retained
    assert len(val._decode_cache) == 0
    again = [val[i] for i in range(len(val))]          # served from cache
    for a, b, c in zip(first, again, [plain[i] for i in range(len(plain))]):
        for k in a:
            if k == "filename":
                assert a[k] == b[k] == c[k]
            else:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
                np.testing.assert_array_equal(a[k], c[k], err_msg=k)

    with pytest.raises(ValueError):
        again[0]["image"][0, 0, 0] = 7  # frozen

    tr = make_ds(train=True)
    assert tr._packed_cache is None  # train crops are stochastic per epoch
