"""Live crop-math parity: R1/datasets/speed.py box formulas and the
SpeedSubmission pad-to-square canvas, imported and executed from the
reference tree, vs our data/crop.py ports.

The crop box is THE parity-critical data contract (every downstream pixel
and landmark coordinate flows through it); round-1 tests pinned our ports
against re-derived numpy oracles — this pins them against the reference's
own code:

* generate_clip_bbox_val        (R1/datasets/speed.py:246-260)
* generate_clip_bbox_train      (:262-291) — with the truncnorm sampler
  monkeypatched to the SAME deterministic values on both sides, so the
  surrounding arithmetic (int casts, ceil half-scale, clip order) is
  compared while randomness is factored out
* SpeedSubmission.generate_clip_bbox (:92-108) fuzz, incl. boxes whose
  1.2x square extends outside the image
* SpeedSubmission.__getitem__ canvas placement (:113-146): zero canvas of
  the clip size, ratio-preserving paste — compared against the canvas our
  box semantics dictate, on a real PNG round-trip
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
PIL = pytest.importorskip("PIL")
from PIL import Image

from tests._r1_reference import load_r1_dataset_module, r1_available

from satellite_pose_estimation_tpu.data import crop as our_crop

pytestmark = pytest.mark.skipif(
    not r1_available(), reason="R1 reference tree not present"
)


@pytest.fixture(scope="module")
def speed_module():
    mod = load_r1_dataset_module()
    import albumentations

    assert getattr(albumentations, "__graft_stub__", False)
    return mod


def _fuzz_boxes(rng, n, width, height):
    out = []
    for _ in range(n):
        x1 = rng.uniform(-10, width - 5)
        y1 = rng.uniform(-10, height - 5)
        w = rng.uniform(3, width * 0.9)
        h = rng.uniform(3, height * 0.9)
        out.append(np.array([x1, y1, x1 + w, y1 + h]))
    # deterministic edge cases: corner-hugging, off-image, thin boxes
    out += [
        np.array([0.0, 0.0, 30.0, 8.0]),
        np.array([width - 20.0, height - 30.0, width + 5.0, height + 4.0]),
        np.array([-15.0, 40.0, 10.0, 140.0]),
        np.array([50.0, -12.0, 58.0, 3.0]),
    ]
    return out


def test_val_box_live_parity(speed_module):
    rng = np.random.RandomState(0)
    width, height = 1920, 1200
    train_ds = object.__new__(speed_module.SpeedTrain)
    for bbox in _fuzz_boxes(rng, 200, width, height):
        ref = train_ds.generate_clip_bbox_val(bbox, (width, height))
        ours = our_crop.generate_clip_bbox_val(bbox, (width, height))
        np.testing.assert_array_equal(ours, ref)


def test_submission_box_live_parity(speed_module):
    rng = np.random.RandomState(1)
    sub_ds = object.__new__(speed_module.SpeedSubmission)
    for bbox in _fuzz_boxes(rng, 200, 1920, 1200):
        ref = sub_ds.generate_clip_bbox(bbox)
        ours = our_crop.generate_clip_bbox_submission(bbox)
        np.testing.assert_array_equal(ours, ref)


def test_train_box_live_parity(speed_module, monkeypatch):
    """Deterministic truncnorm on both sides -> the int/ceil/clip scaffolding
    must agree exactly."""
    det = lambda loc, clip: loc + 0.37 * clip - 1.2
    monkeypatch.setattr(speed_module, "truncnorm", det)
    monkeypatch.setattr(
        our_crop, "truncnorm_sample", lambda loc, clip, rng: det(loc, clip)
    )
    rng = np.random.RandomState(2)
    width, height = 1920, 1200
    train_ds = object.__new__(speed_module.SpeedTrain)
    for bbox in _fuzz_boxes(rng, 200, width, height):
        ref = train_ds.generate_clip_bbox_train(bbox, (width, height))
        ours = our_crop.generate_clip_bbox_train(bbox, (width, height), None)
        np.testing.assert_array_equal(ours, ref)


def test_submission_canvas_live_parity(speed_module, tmp_path, monkeypatch):
    rng = np.random.RandomState(3)
    width, height = 160, 100
    img = rng.randint(0, 256, (height, width, 3), np.uint8)
    os.makedirs(tmp_path / "imgs", exist_ok=True)
    Image.fromarray(img).save(tmp_path / "imgs" / "t.png")

    monkeypatch.setattr(speed_module, "DATA_ROOT", str(tmp_path))

    cases = [
        np.array([40.0, 30.0, 90.0, 70.0]),  # interior
        np.array([-8.0, -5.0, 30.0, 40.0]),  # spills past top-left
        np.array([120.0, 60.0, 170.0, 108.0]),  # spills past bottom-right
        np.array([10.0, 70.0, 150.0, 98.0]),  # wide box, tall spill
    ]
    for bbox in cases:
        ds = object.__new__(speed_module.SpeedSubmission)
        ds.img_dir = "imgs"
        ds.transforms = None
        ds.normalize = lambda im: (im, None)
        ds.data_infos = [{"filename": "t.png", "bbox_xxyy": bbox}]

        crop_t, target = ds[0]
        ref_canvas = (
            (crop_t.permute(1, 2, 0).numpy() * 255.0).round().astype(np.uint8)
        )
        ref_clip = np.asarray(target["clip_bbox"])

        clip = our_crop.generate_clip_bbox_submission(bbox)
        np.testing.assert_array_equal(clip, ref_clip)

        # canvas dictated by our box semantics: zero square of the clip
        # side, image pasted at the overlap offset
        x1i, y1i, x2i, y2i = clip.astype(int)
        side = x2i - x1i
        ours_canvas = np.zeros((side, side, 3), np.uint8)
        sx1, sy1 = max(0, x1i), max(0, y1i)
        sx2, sy2 = min(width, x2i), min(height, y2i)
        ours_canvas[
            sy1 - y1i : sy1 - y1i + (sy2 - sy1),
            sx1 - x1i : sx1 - x1i + (sx2 - sx1),
        ] = img[sy1:sy2, sx1:sx2]
        np.testing.assert_array_equal(ours_canvas, ref_canvas)
