"""Full-scale submission contract over the reference's REAL detector-box
sets (R1/annos/wz_real_test.json: 300 entries, wz_synt_test.json: 2998),
with synthesized 1920x1200 stand-in frames.

Round-2 verdict: the submission path was golden-tested only on small
fixtures; a key contract — the pad-canvas crop + CSV writer at true scale
and count (R1/gen_submission_single.py:112-187, R1/datasets/speed.py:84-160)
— had never executed over the real box distribution (boxes up to ~980 px
square clips, spills past every edge, filename sets with the real/synt
naming split).

Default run: a deterministic 48-entry subsample of each split (CI-fast).
``SPE_FULL_SUBMISSION=1`` runs ALL 3298 entries — executed and recorded in
ROUND3.md. Checks:

* gen_submission end to end (device crop -> model -> PnP -> CSV);
* CSV contract: synthetic rows first then real, each split sorted by
  filename, every entry exactly once, 8 fields/row, finite floats;
* live-reference crop parity on sampled REAL boxes: clip box equality vs
  R1 SpeedSubmission.generate_clip_bbox, and pixel identity between our
  packed buffer and the reference's zero-canvas paste over the pack stride
  lattice (covers the decimated >512-px-clip regime the small fixtures
  never reached).
"""
import json
import os
import os.path as osp

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from PIL import Image

from tests._r1_reference import (
    R1_DIR,
    load_r1_dataset_module,
    r1_available,
)

pytestmark = pytest.mark.skipif(
    not r1_available(), reason="R1 reference tree not present"
)

FULL = os.environ.get("SPE_FULL_SUBMISSION", "") == "1"
SUBSAMPLE = 48


def _gradient_frame():
    """Textured-but-JPEG-cheap stand-in: smooth gradients decode ~4x faster
    than noise on this 1-core host and give every crop distinct content."""
    y = np.linspace(0, 255, 1200, dtype=np.float32)[:, None]
    x = np.linspace(0, 255, 1920, dtype=np.float32)[None, :]
    img = np.stack([y + 0 * x, 0 * y + x, (y + x) / 2], axis=-1)
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def submission_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("full_sub")
    annos = root / "annos"
    annos.mkdir()
    frame = _gradient_frame()

    counts = {}
    for src_name, img_dir in (("wz_real_test.json", "images/real_test"),
                              ("wz_synt_test.json", "images/test")):
        with open(osp.join(R1_DIR, "annos", src_name)) as f:
            boxes = json.load(f)
        if not FULL:
            keys = sorted(boxes)[::max(len(boxes) // SUBSAMPLE, 1)][:SUBSAMPLE]
            boxes = {k: boxes[k] for k in keys}
        with open(annos / src_name, "w") as f:
            json.dump(boxes, f)
        d = root / img_dir
        d.mkdir(parents=True)
        master = d / "__master__.jpg"
        Image.fromarray(frame).save(master, quality=60)
        for fn in boxes:
            os.link(master, d / fn)
        os.unlink(master)
        counts[src_name] = len(boxes)
    return str(root), counts


@pytest.fixture(scope="module")
def tiny_solver(submission_root, tmp_path_factory):
    from satellite_pose_estimation_tpu.core.yaml_config import YAMLConfig
    from satellite_pose_estimation_tpu.train.solver import SpeedSolver

    from tests.test_solver_integration import make_fake_speed

    # _build needs a train/val dataset on disk; the submission datasets are
    # constructed separately against the detector-box root
    train_root = make_fake_speed(
        str(tmp_path_factory.mktemp("sub_train")), n_images=4
    )
    cfg = YAMLConfig(cfg={
        "task": "landmarker",
        "model": "RTDETR",
        "num_classes": 11,
        "output_dir": str(tmp_path_factory.mktemp("sub_out")),
        "PResNet": {"depth": 18, "freeze_norm": False},
        "HybridEncoder": {"hidden_dim": 32, "nhead": 4,
                          "dim_feedforward": 64, "expansion": 0.5},
        "RTDETRTransformer": {"num_queries": 12, "num_decoder_layers": 2},
        "SetCriterion": {"losses": ["labels", "points_uncert"]},
        "train_dataloader": {
            "batch_size": 2,
            "dataset": {"index_file": "train_t.txt", "resize": 64},
        },
        "val_dataloader": {
            "batch_size": 2,
            "dataset": {"index_file": "val_t.txt", "resize": 64,
                        "train": False},
        },
    })
    solver = SpeedSolver(cfg, data_root=train_root, seed=0)
    solver._build()
    return solver


def test_full_scale_gen_submission(submission_root, tiny_solver, tmp_path):
    from satellite_pose_estimation_tpu.data.dataset import (
        SpeedSubmissionDataset,
    )
    from satellite_pose_estimation_tpu.tools.gen_submission_single import (
        gen_submission,
    )
    from satellite_pose_estimation_tpu.utils.submission import (
        SubmissionWriter,
    )

    root, counts = submission_root
    writer = SubmissionWriter()
    real_ds = SpeedSubmissionDataset(root, "wz_real_test.json",
                                     "images/real_test", resize=64)
    synt_ds = SpeedSubmissionDataset(root, "wz_synt_test.json",
                                     "images/test", resize=64)
    assert len(real_ds) == counts["wz_real_test.json"]
    assert len(synt_ds) == counts["wz_synt_test.json"]

    gen_submission(tiny_solver, real_ds, writer, writer.append_real_test,
                   batch_size=16)
    gen_submission(tiny_solver, synt_ds, writer, writer.append_test,
                   batch_size=16)
    path = writer.export(str(tmp_path), suffix="fullscale")

    with open(path) as f:
        rows = [line.rstrip("\n").split(",") for line in f if line.strip()]
    n_synt, n_real = counts["wz_synt_test.json"], counts["wz_real_test.json"]
    assert len(rows) == n_synt + n_real

    synt_rows, real_rows = rows[:n_synt], rows[n_synt:]
    # synthetic block first, then real; each sorted by filename
    assert all(not r[0].endswith("real.jpg") for r in synt_rows)
    assert all(r[0].endswith("real.jpg") for r in real_rows)
    for block in (synt_rows, real_rows):
        names = [r[0] for r in block]
        assert names == sorted(names)
        assert len(set(names)) == len(names)
    # every detector-box entry appears exactly once
    with open(osp.join(root, "annos", "wz_synt_test.json")) as f:
        assert {r[0] for r in synt_rows} == set(json.load(f))
    with open(osp.join(root, "annos", "wz_real_test.json")) as f:
        assert {r[0] for r in real_rows} == set(json.load(f))
    # row = filename + q0..q3 + r0..r2, all finite
    for r in rows:
        assert len(r) == 8
        vals = np.asarray([float(v) for v in r[1:]])
        assert np.isfinite(vals).all()


def test_real_box_crops_match_live_reference(submission_root):
    """Sampled REAL detector boxes through the live R1 SpeedSubmission
    class vs our dataset: identical clip boxes, and identical pixels
    between our packed buffer and the reference canvas over the stride
    lattice (pack_crop decimates by 2 for the ~980 px clips the real box
    distribution produces — R1/datasets/speed.py:113-146 keeps full res
    and resizes later; the lattice identity proves both hold the same
    geometry)."""
    from satellite_pose_estimation_tpu.data.dataset import (
        SpeedSubmissionDataset,
    )

    root, _ = submission_root
    speed_module = load_r1_dataset_module()

    rng = np.random.RandomState(0)
    decimated_seen = 0
    for ann, img_dir in (("wz_real_test.json", "images/real_test"),
                         ("wz_synt_test.json", "images/test")):
        ds = SpeedSubmissionDataset(root, ann, img_dir, resize=64)
        ref = object.__new__(speed_module.SpeedSubmission)
        ref.img_dir = img_dir
        ref.transforms = None
        ref.normalize = lambda im: (im, None)
        speed_module.DATA_ROOT = root  # reference reads DATA_ROOT/img_dir

        idxs = rng.choice(len(ds), size=min(12, len(ds)), replace=False)
        for i in idxs:
            info = ds.data_infos[int(i)]
            ref.data_infos = [{"filename": info["filename"],
                               "bbox_xxyy": np.asarray(info["bbox_xxyy"])}]
            crop_t, target = ref[0]
            ref_canvas = (
                (crop_t.permute(1, 2, 0).numpy() * 255.0)
                .round().astype(np.uint8)
            )
            ref_clip = np.asarray(target["clip_bbox"], np.float64)

            ours = ds[int(i)]
            np.testing.assert_array_equal(
                np.asarray(ours["clip_bbox"], np.float64), ref_clip,
                err_msg=f"clip box differs for {info['filename']}",
            )
            # buffer[j, i] == canvas[sy1 - y1i + j*step, sx1 - x1i + i*step]
            x1i, y1i, x2i, y2i = ref_clip.astype(int)
            step = int(ours["scale"])
            if step > 1:
                decimated_seen += 1
            sx1, sy1 = int(ours["offset"][0]), int(ours["offset"][1])
            H, W = 1200, 1920
            sx2, sy2 = min(W, x2i), min(H, y2i)
            nj = (sy2 - sy1 + step - 1) // step
            ni = (sx2 - sx1 + step - 1) // step
            buf = ours["image"][:nj, :ni]
            lattice = ref_canvas[
                sy1 - y1i : sy1 - y1i + nj * step : step,
                sx1 - x1i : sx1 - x1i + ni * step : step,
            ]
            np.testing.assert_array_equal(
                buf, lattice,
                err_msg=f"buffer/canvas pixels differ for {info['filename']}",
            )
    # the real box distribution must actually exercise the decimated regime
    assert decimated_seen > 0
