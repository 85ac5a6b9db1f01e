"""Det-task transform registry: the ops the reference registers from
torchvision v2 (R2/src/data/transforms.py:27-160) in our numpy/sample-dict
convention (boxes = normalized cxcywh)."""
import numpy as np
import pytest

from satellite_pose_estimation_tpu.data.transforms import (
    Compose,
    _boxes_abs_xyxy,
    _boxes_norm_cxcywh,
)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _sample(H=60, W=80, boxes=((0.5, 0.5, 0.25, 0.5),), labels=(3,)):
    img = (np.arange(H * W * 3).reshape(H, W, 3) % 255).astype(np.uint8)
    return {
        "image": img,
        "boxes": np.asarray(boxes, np.float64).reshape(-1, 4),
        "labels": np.asarray(labels, np.int32),
    }


def test_box_format_roundtrip():
    b = np.asarray([[0.5, 0.5, 0.25, 0.5], [0.1, 0.2, 0.05, 0.1]])
    xyxy = _boxes_abs_xyxy(b, 80, 60)
    np.testing.assert_allclose(xyxy[0], [30, 15, 50, 45])
    np.testing.assert_allclose(_boxes_norm_cxcywh(xyxy, 80, 60), b)


def test_photometric_distort_changes_pixels(rng):
    c = Compose.from_config(
        [{"type": "RandomPhotometricDistort", "p": 1.0}], rng=rng)
    s = _sample()
    out = c(s)
    assert out["image"].shape == s["image"].shape
    assert out["image"].dtype == np.uint8
    assert not np.array_equal(out["image"], s["image"])
    np.testing.assert_array_equal(out["boxes"], s["boxes"])


def test_photometric_distort_p0_identity(rng):
    c = Compose.from_config(
        [{"type": "RandomPhotometricDistort", "p": 0.0}], rng=rng)
    s = _sample()
    np.testing.assert_array_equal(c(s)["image"], s["image"])


def test_iou_crop_shifts_boxes(rng):
    # sampler_options=[0.0]: always crop, any overlap accepted
    c = Compose.from_config(
        [{"type": "RandomIoUCrop", "sampler_options": [0.0], "p": 1.0}],
        rng=rng)
    s = _sample()
    xyxy_before = _boxes_abs_xyxy(s["boxes"], 80, 60)[0]
    out = c(s)
    nh, nw = out["image"].shape[:2]
    assert nh <= 60 and nw <= 80 and (nh, nw) != (60, 80)
    # the (single) box center must lie inside the crop (guaranteed by the
    # center-containment trial condition); verify the shift is consistent
    xyxy_after = _boxes_abs_xyxy(out["boxes"], nw, nh)[0]
    shift = xyxy_before - xyxy_after  # [left, top, left, top]
    assert shift[0] == pytest.approx(shift[2], abs=1e-9)
    assert shift[1] == pytest.approx(shift[3], abs=1e-9)
    cx, cy = (xyxy_after[0] + xyxy_after[2]) / 2, (
        xyxy_after[1] + xyxy_after[3]) / 2
    assert 0 < cx < nw and 0 < cy < nh


def test_iou_crop_noop_on_threshold_one(rng):
    c = Compose.from_config(
        [{"type": "RandomIoUCrop", "sampler_options": [1.0]}], rng=rng)
    s = _sample()
    out = c(s)
    assert out["image"].shape == s["image"].shape


def test_random_crop_size_and_landmarks(rng):
    c = Compose.from_config([{"type": "RandomCrop", "size": 40}], rng=rng)
    s = _sample()
    s["landmarks"] = np.asarray([[50.0, 30.0]])
    out = c(s)
    assert out["image"].shape == (40, 40, 3)
    # landmark shifted by the crop offset; recover it from the box shift
    xyxy_b = _boxes_abs_xyxy(s["boxes"], 80, 60)[0]
    xyxy_a = _boxes_abs_xyxy(out["boxes"], 40, 40)[0]
    left, top = xyxy_b[0] - xyxy_a[0], xyxy_b[1] - xyxy_a[1]
    np.testing.assert_allclose(out["landmarks"][0], [50 - left, 30 - top])


def test_random_crop_pads_small_images(rng):
    c = Compose.from_config([{"type": "RandomCrop", "size": 100}], rng=rng)
    out = c(_sample())
    assert out["image"].shape == (100, 100, 3)


def test_sanitize_removes_degenerate(rng):
    c = Compose.from_config(
        [{"type": "SanitizeBoundingBox", "min_size": 2}], rng=rng)
    s = _sample(
        boxes=[(0.5, 0.5, 0.25, 0.5),    # fine
               (0.5, 0.5, 0.01, 0.5),    # 0.8 px wide -> dropped
               (1.2, 0.5, 0.25, 0.5)],   # center off-image -> dropped
        labels=[1, 2, 3])
    out = c(s)
    assert out["boxes"].shape == (1, 4)
    np.testing.assert_array_equal(out["labels"], [1])


def test_convert_box_xyxy(rng):
    c = Compose.from_config(
        [{"type": "ConvertBox", "out_fmt": "xyxy"}], rng=rng)
    out = c(_sample())
    np.testing.assert_allclose(out["boxes"][0], [30, 15, 50, 45])
    # the shipped det-config terminal op is the identity in our convention
    c2 = Compose.from_config(
        [{"type": "ConvertBox", "out_fmt": "cxcywh", "normalize": True}],
        rng=rng)
    s = _sample()
    np.testing.assert_array_equal(c2(s)["boxes"], s["boxes"])


def test_pad_to_size_rescales_boxes(rng):
    c = Compose.from_config([{"type": "PadToSize", "spatial_size": 100}],
                            rng=rng)
    s = _sample()
    out = c(s)
    assert out["image"].shape == (100, 100, 3)
    assert out["padding"] == [0, 0, 20, 40]
    # absolute geometry unchanged under the new normalization base
    np.testing.assert_allclose(
        _boxes_abs_xyxy(out["boxes"], 100, 100)[0], [30, 15, 50, 45])


def test_empty_and_dtype_ops(rng):
    c = Compose.from_config(
        [{"type": "EmptyTransform"}, {"type": "ToImageTensor"},
         {"type": "ConvertDtype"}], rng=rng)
    out = c(_sample())
    assert out["image"].dtype == np.float32
    assert out["image"].max() <= 1.0
