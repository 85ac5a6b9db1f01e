"""Device crop+resize vs the reference host pipeline (PIL crop + cv2
INTER_CUBIC resize), and crop-box geometry parity."""
import cv2
import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from satellite_pose_estimation_tpu.data.crop import (
    generate_clip_bbox_val,
    generate_clip_bbox_submission,
)
from satellite_pose_estimation_tpu.data.dataset import pack_crop
from satellite_pose_estimation_tpu.ops.image_warp import crop_resize_cubic


def reference_val_crop(img_np, clip_bbox, out_size):
    """R1 val path: PIL crop(bbox) -> cv2.resize INTER_CUBIC."""
    pil = Image.fromarray(img_np)
    crop = np.asarray(pil.crop(tuple(clip_bbox)))
    return cv2.resize(crop, (out_size, out_size), interpolation=cv2.INTER_CUBIC)


def reference_submission_crop(img_np, bbox_clip, out_size):
    """R1 SpeedSubmission path (R1/datasets/speed.py:113-153): zero canvas of
    clip_size, copy the intersecting region, cubic resize."""
    H, W = img_np.shape[:2]
    clip_size = int(bbox_clip[2] - bbox_clip[0])
    canvas = np.zeros((clip_size, clip_size, 3), img_np.dtype)
    x1 = max(0, int(bbox_clip[0])); y1 = max(0, int(bbox_clip[1]))
    cx1 = int(x1 - bbox_clip[0]); cy1 = int(y1 - bbox_clip[1])
    x2 = min(W, int(bbox_clip[2])); y2 = min(H, int(bbox_clip[3]))
    canvas[cy1:cy1 + y2 - y1, cx1:cx1 + x2 - x1] = img_np[y1:y2, x1:x2]
    return cv2.resize(canvas, (out_size, out_size), interpolation=cv2.INTER_CUBIC)


def smooth_random_image(rng, h=300, w=400):
    """Low-frequency random image (cubic kernels agree best away from
    hard noise edges; real SPEED images are smooth)."""
    small = rng.rand(h // 8, w // 8, 3) * 255
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC).clip(
        0, 255
    ).astype(np.uint8)


def test_submission_crop_parity(rng):
    img = smooth_random_image(rng)
    # Detector box fully inside
    bbox = np.asarray([120.3, 80.7, 260.9, 190.2])
    clip = generate_clip_bbox_submission(bbox)
    ref = reference_submission_crop(img, clip.astype(int), 128)
    ours = np.asarray(
        crop_resize_cubic(jnp.asarray(img), jnp.asarray(clip), 128, False)
    )
    err = np.abs(ours - ref.astype(np.float32))
    assert np.median(err) < 1.0, f"median err {np.median(err)}"
    assert np.mean(err) < 2.0, f"mean err {np.mean(err)}"


def test_submission_crop_parity_out_of_bounds(rng):
    img = smooth_random_image(rng)
    # Box near the corner -> canvas extends outside the image
    bbox = np.asarray([5.0, 8.0, 120.0, 90.0])
    clip = generate_clip_bbox_submission(bbox)
    ref = reference_submission_crop(img, clip.astype(int), 128)
    ours = np.asarray(
        crop_resize_cubic(jnp.asarray(img), jnp.asarray(clip), 128, False)
    )
    # Zero-padded regions must agree exactly; interior within tolerance.
    err = np.abs(ours - ref.astype(np.float32))
    assert np.median(err) < 1.5, f"median err {np.median(err)}"


def test_val_crop_integer_box_parity(rng):
    img = smooth_random_image(rng)
    clip = np.asarray([40.0, 30.0, 200.0, 170.0])  # integer-valued, inside
    ref = reference_val_crop(img, clip.astype(int), 96)
    ours = np.asarray(
        crop_resize_cubic(jnp.asarray(img), jnp.asarray(clip), 96, False)
    )
    err = np.abs(ours - ref.astype(np.float32))
    assert np.median(err) < 1.0, f"median err {np.median(err)}"


def test_pack_crop_roundtrip(rng):
    img = smooth_random_image(rng, 1200, 1920)
    clip = generate_clip_bbox_val(
        np.asarray([900.0, 700.0, 1150.0, 980.0]), (1920, 1200)
    )
    buf, bbox_buf, scale, offset = pack_crop(img, clip, 512)
    assert scale == 1.0
    # Warping from the packed buffer == warping from the full image.
    full = np.asarray(
        crop_resize_cubic(jnp.asarray(img), jnp.asarray(clip), 64, False)
    )
    packed = np.asarray(
        crop_resize_cubic(jnp.asarray(buf), jnp.asarray(bbox_buf), 64, False)
    )
    np.testing.assert_allclose(packed, full, atol=1e-2)


def test_pack_crop_decimation(rng):
    img = smooth_random_image(rng, 1200, 1920)
    clip = np.asarray([100.0, 50.0, 1400.0, 1150.0])  # larger than pack 512
    buf, bbox_buf, scale, offset = pack_crop(img, clip, 512)
    assert scale in (2.0, 4.0)
    assert bbox_buf[2] <= 512 + 1 and bbox_buf[3] <= 512 + 1
