"""Import/smoke coverage for CLI tools and small utilities."""
import importlib

import numpy as np
import pytest


TOOL_MODULES = [
    "satellite_pose_estimation_tpu.tools.main",
    "satellite_pose_estimation_tpu.tools.train",
    "satellite_pose_estimation_tpu.tools.gen_submission_single",
    "satellite_pose_estimation_tpu.tools.gen_submission_multi",
    "satellite_pose_estimation_tpu.tools.simple_test_result",
    "satellite_pose_estimation_tpu.tools.analyze_log",
    "satellite_pose_estimation_tpu.tools.output_min_scores",
    "satellite_pose_estimation_tpu.tools.val_p_which_p",
    "satellite_pose_estimation_tpu.tools.gen_new_trainjson",
    "satellite_pose_estimation_tpu.tools.visualize",
    "satellite_pose_estimation_tpu.tools.export",
    "satellite_pose_estimation_tpu.tools.get_backbone_time",
    "satellite_pose_estimation_tpu.tools.get_inference_time",
    "satellite_pose_estimation_tpu.tools.synthetic_selfcheck",
    "satellite_pose_estimation_tpu.tools.train_cifar",
    "satellite_pose_estimation_tpu.tools.plot_ablations",
]


@pytest.mark.parametrize("mod", TOOL_MODULES)
def test_tool_imports(mod):
    importlib.import_module(mod)


def test_r1_cli_arg_surface():
    from satellite_pose_estimation_tpu.tools.main import (
        args_to_config,
        get_args_parser,
    )

    parser = get_args_parser()
    args = parser.parse_args(
        ["--backbone", "resnet50s8", "--enc_layers", "4", "--dec_layers",
         "4", "--num_queries", "20", "--input_size", "224", "--repro", "20"]
    )
    cfg = args_to_config(args)
    model = cfg.build_model()
    assert model.config.backbone == "resnet50s8"
    assert model.config.enc_layers == 4
    assert cfg.criterion_config().eos_coef == pytest.approx(0.1)


def test_transforms_registry(rng):
    from satellite_pose_estimation_tpu.data.transforms import Compose

    c = Compose.from_config(
        [
            {"type": "RandomHorizontalFlip", "p": 1.0},
            {"type": "Resize", "size": 64},
            {"type": "Normalize"},
        ],
        rng=rng,
    )
    sample = {
        "image": np.zeros((32, 48, 3), np.uint8),
        "landmarks": np.asarray([[10.0, 5.0]]),
    }
    out = c(sample)
    assert out["image"].shape == (64, 64, 3)
    # flip then resize: x = (48-1-10) * 64/48
    np.testing.assert_allclose(out["landmarks"][0, 0], 37 * 64 / 48)


def test_prefetch_to_device(rng):
    from satellite_pose_estimation_tpu.data.prefetch import prefetch_to_device

    batches = [
        {"x": rng.rand(4, 8), "filename": ["a"] * 4, "pad": 0}
        for _ in range(5)
    ]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    assert out[0]["pad"] == 0 and out[0]["filename"] == ["a"] * 4
    np.testing.assert_allclose(np.asarray(out[2]["x"]), batches[2]["x"])

    # producer-thread exceptions re-raise at the consumer: a bad batch must
    # crash the epoch, not silently truncate it
    def bad_iter():
        yield batches[0]
        raise RuntimeError("decode failed")

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="decode failed"):
        list(prefetch_to_device(bad_iter(), size=2))

    # abandoning the iterator releases the producer (no eternal q.put block)
    import time

    produced = []

    def slow_iter():
        for b in batches:
            produced.append(1)
            yield b

    it = prefetch_to_device(slow_iter(), size=1)
    next(it)
    it.close()  # consumer leaves early (e.g. train_step raised)
    n_after_close = len(produced)
    time.sleep(1.0)
    # producer observed the stop event: nothing new got produced after a
    # grace period (it may have had one item in flight at close time)
    assert len(produced) <= n_after_close + 1 < len(batches)


def test_analyze_log_roundtrip(tmp_path):
    import json

    from satellite_pose_estimation_tpu.tools.analyze_log import load_log

    path = tmp_path / "log.txt"
    entries = [
        {"epoch": 0, "train_loss_total": 5.0, "test_score": 4.1},
        {"epoch": 1, "train_loss_total": 3.0, "test_score": 2.0},
    ]
    path.write_text("\n".join(json.dumps(e) for e in entries) + "\n")
    loaded = load_log(str(path))
    assert loaded == entries


def test_analyze_log_backfills_scores_from_stats_string(tmp_path):
    """Reference-format log.txt carries scores only inside the
    test_speed_eval_pose string; load_log must regex-backfill test_score*
    (the TB extraction of R2/solver/speed_solver.py:167-189)."""
    import json

    from satellite_pose_estimation_tpu.tools.analyze_log import load_log

    stats = (
        "tvec score: 0.123456, quat score: 0.654321, final score: "
        "0.777777; median tvec: 0.123456, median quat: 0.654321; "
        "mean tvec abs: [0.1, 0.2, 0.3], median tvec abs:[0.1, 0.2, 0.3]"
    )
    path = tmp_path / "log.txt"
    path.write_text(
        json.dumps({"epoch": 0, "test_speed_eval_pose": stats}) + "\n"
    )
    (entry,) = load_log(str(path))
    assert entry["test_score"] == 0.777777
    assert entry["test_score_tvec"] == 0.123456
    assert entry["test_score_quat"] == 0.654321


def test_plot_ablations_tool(tmp_path):
    import json

    from satellite_pose_estimation_tpu.tools import plot_ablations

    logs = []
    for run in range(2):
        p = tmp_path / f"run{run}.txt"
        p.write_text("\n".join(
            json.dumps({"epoch": e, "test_score": 4.0 / (e + 1) + run * 0.1})
            for e in range(5)
        ))
        logs.append(str(p))
    out = tmp_path / "plots"
    plot_ablations.main([
        "--logs", *logs, "--labels", "ed1", "ed2",
        "--name", "layer", "--out", str(out),
    ])
    plot_ablations.main([
        "--bar", "0.047", "0.036", "--ticks", "1", "2",
        "--name", "layer", "--out", str(out),
    ])
    names = {f.name for f in out.iterdir()}
    assert names == {"layer_epoch_score_all.png", "layer_epoch_score_last.png",
                     "layer_num_bar.png"}


def test_evaluator_gtless_degrades_gracefully():
    from satellite_pose_estimation_tpu.train.evaluator import SpeedEvaluator

    ev = SpeedEvaluator()
    results = {
        "points": np.zeros((2, 11, 2)),
        "probs": np.zeros((2, 20, 12)),
        "quat_pr": np.tile([1.0, 0, 0, 0], (2, 1)),
        "tvec_pr": np.tile([0.0, 0, 10.0], (2, 1)),
        "valid": np.asarray([True, False]),
    }
    ev.update_batch(["img001.jpg", "img002.jpg"], results)
    stats = ev.summarize()
    assert "no ground truth" in stats and "2 images" in stats
    scalars = ev.scalar_summary()
    assert scalars["num_images"] == 2 and scalars["num_valid"] == 1
    assert "score" not in scalars


def test_export_stablehlo_roundtrip(tmp_path):
    import yaml

    from satellite_pose_estimation_tpu.tools.export import export

    cfg = {
        "model": "RTDETR",
        "num_classes": 11,
        "PResNet": {"depth": 18, "freeze_norm": False},
        "HybridEncoder": {"hidden_dim": 32, "nhead": 4,
                          "dim_feedforward": 64, "expansion": 0.5},
        "RTDETRTransformer": {"num_queries": 8, "num_decoder_layers": 2},
    }
    cfg_path = tmp_path / "tiny.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "export"
    export(str(cfg_path), None, str(out), batch=1, input_size=64,
           check=True)
    hlo = (out / "model.stablehlo.mlir").read_text()
    assert "stablehlo" in hlo and len(hlo) > 10000
    assert (out / "params").exists()


def test_val_p_which_p_sweep(tmp_path):
    import cv2
    import json as _json

    from satellite_pose_estimation_tpu.geometry.camera import (
        Camera,
        WORLD_POINTS,
    )
    from satellite_pose_estimation_tpu.tools import val_p_which_p

    rng = np.random.RandomState(0)
    log = {}
    for i in range(6):
        rvec = rng.randn(3)
        rvec = rvec / np.linalg.norm(rvec) * rng.uniform(0, np.pi)
        tvec = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1),
                         rng.uniform(6, 20)])
        img, _ = cv2.projectPoints(WORLD_POINTS.astype(np.float64), rvec,
                                   tvec, Camera.K, np.zeros(5))
        kp = img.reshape(-1, 2) + rng.randn(11, 2) * 0.5
        # 12-query log: 11 confident one-hot keypoints + 1 background
        logits = np.full((12, 12), 0.01)
        pts = np.zeros((12, 2))
        for q in range(11):
            logits[q, q] = 50.0
            pts[q] = kp[q]
        logits[11, 11] = 50.0
        R_gt, _ = cv2.Rodrigues(rvec)
        tr = np.trace(R_gt)
        q0 = np.sqrt(max(1 + tr, 1e-9)) / 2
        quat_gt = [q0, (R_gt[2, 1] - R_gt[1, 2]) / (4 * q0),
                   (R_gt[0, 2] - R_gt[2, 0]) / (4 * q0),
                   (R_gt[1, 0] - R_gt[0, 1]) / (4 * q0)]
        log[f"img{i:03d}.jpg"] = {
            "points": pts.tolist(),
            "logits": (np.exp(logits) /
                       np.exp(logits).sum(-1, keepdims=True)).tolist(),
            "sigma": np.full((12, 2), 0.25).tolist(),
            "quat_gt": quat_gt,
            "tvec_gt": tvec.tolist(),
        }
    p = tmp_path / "eval_log.json"
    p.write_text(_json.dumps(log))

    for mode in ("random", "topn"):
        args = type("A", (), {"eval_log": str(p), "repro": 25,
                              "mode": mode, "seed": 0})
        results = val_p_which_p.main(args)
        # plenty of clean points: every N >= 4 must solve well
        assert all(v < 0.2 for v in results.values()), (mode, results)
        # more points should not be dramatically worse
        assert results[11] <= results[4] + 0.05


def test_yaml_augment_config():
    from satellite_pose_estimation_tpu.core.yaml_config import YAMLConfig

    cfg = YAMLConfig(cfg={"augment": {"p_jpeg": 0.0, "interp": "cubic",
                                      "iso_intensity": [0.2, 0.3]}})
    a = cfg.augment_config(96)
    assert a.out_size == 96 and a.p_jpeg == 0.0 and a.interp == "cubic"
    assert a.iso_intensity == (0.2, 0.3)
    assert a.p_iso == 0.2  # untouched defaults stay

    import pytest as _pytest

    bad = YAMLConfig(cfg={"augment": {"p_tpyo": 1.0}})
    with _pytest.raises(ValueError, match="unknown augment"):
        bad.augment_config(96)


def test_synthetic_det_dataset_renders_valid_coco(tmp_path):
    """synthetic_det_selfcheck.render_dataset writes a COCO-format dataset
    CocoDetection can load: normalized cxcywh targets inside [0,1], both
    shape classes present."""
    from satellite_pose_estimation_tpu.data.coco import CocoDetection
    from satellite_pose_estimation_tpu.tools.synthetic_det_selfcheck import (
        N_CLASSES, render_dataset,
    )

    render_dataset(str(tmp_path), n_images=6, seed=0)
    ds = CocoDetection(
        str(tmp_path / "train2017"),
        str(tmp_path / "annotations" / "instances_train2017.json"),
    )
    assert len(ds) == 6
    labels = []
    for i in range(len(ds)):
        s = ds[i]
        assert s["image"].shape == (160, 160, 3)  # solver resizes, not ds
        assert len(s["boxes"]) >= 1
        b = np.asarray(s["boxes"])
        assert (b >= 0).all() and (b <= 1).all()
        labels.extend(np.asarray(s["labels"]).tolist())
    assert set(labels) <= set(range(N_CLASSES)) and len(set(labels)) == 2
