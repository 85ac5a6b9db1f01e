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


def _square_smooth(rng, s=128):
    small = rng.rand(s // 8, s // 8, 3) * 255
    return cv2.resize(small, (s, s), interpolation=cv2.INTER_CUBIC).clip(
        0, 255
    ).astype(np.float32)


def test_rotate_shear3_identity(rng):
    from satellite_pose_estimation_tpu.ops.image_warp import rotate_shear3

    img = _square_smooth(rng)
    out = np.asarray(rotate_shear3(jnp.asarray(img), jnp.float32(0.0)))
    np.testing.assert_allclose(out, img, atol=1e-3)


@pytest.mark.parametrize("deg", [7.0, -30.0, 62.0, -89.0])
def test_rotate_shear3_vs_cv2(rng, deg):
    """3-shear rotation ~= cv2.warpAffine direct rotation on smooth content
    (the reference's train-time Rotate, borderValue 0). Interpolation is
    three 1-D passes vs one 2-D kernel, so parity is behavioral."""
    from satellite_pose_estimation_tpu.ops.image_warp import rotate_shear3

    img = _square_smooth(rng)
    S = img.shape[0]
    c = (S - 1) / 2.0
    theta = np.deg2rad(deg)
    ours = np.asarray(rotate_shear3(jnp.asarray(img), jnp.float32(theta)))
    # cv2.getRotationMatrix2D(angle>0) is CCW in (x, up-y) = content map
    # R(-theta) in (x, down-y); our content map is kp' = R(theta)(kp-c)+c.
    M = cv2.getRotationMatrix2D((c, c), -deg, 1.0)
    ref = cv2.warpAffine(
        img, M, (S, S), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )
    err = np.abs(ours - ref)
    assert np.median(err) < 2.0, f"median err {np.median(err)}"
    # zero-border region must agree away from the content edge (the shear
    # passes anti-alias the content/zero boundary over a ~2 px band)
    content = (ref.max(axis=-1) > 0).astype(np.uint8)
    near = cv2.dilate(content, np.ones((9, 9), np.uint8)) > 0
    far_out = ~near
    if far_out.any():
        assert np.abs(ours[far_out]).max() < 4.0


def test_rotate_shear3_matches_gather_warp(rng):
    """Same rotation via the direct inverse-affine gather path (the
    augment_batch fallback) — both are bilinear, so they agree tightly."""
    from satellite_pose_estimation_tpu.ops.image_warp import (
        affine_warp_bilinear,
        rotate_shear3,
    )

    img = _square_smooth(rng)
    S = img.shape[0]
    c = (S - 1) / 2.0
    theta = 0.41
    cos, sin = np.cos(theta), np.sin(theta)
    M = jnp.asarray([
        [cos, sin, c - cos * c - sin * c],
        [-sin, cos, c + sin * c - cos * c],
    ])
    gather = np.asarray(
        affine_warp_bilinear(jnp.asarray(img), M, S, normalize=False)
    )
    shear = np.asarray(rotate_shear3(jnp.asarray(img), jnp.float32(theta)))
    assert np.median(np.abs(shear - gather)) < 2.0


def test_rotate_shear3_keypoint_consistency(rng):
    """A bright dot must land where the keypoint forward map
    kp' = R(theta)(kp - c) + c says it lands."""
    from satellite_pose_estimation_tpu.ops.image_warp import rotate_shear3

    S = 128
    img = np.zeros((S, S, 3), np.float32)
    kp = np.asarray([88.0, 37.0])
    img[int(kp[1]), int(kp[0])] = 255.0
    img = cv2.GaussianBlur(img, (9, 9), 2.0) * 40.0
    theta = -0.7
    out = np.asarray(rotate_shear3(jnp.asarray(img), jnp.float32(theta)))
    c = (S - 1) / 2.0
    rel = kp - c
    expect = np.asarray([
        np.cos(theta) * rel[0] - np.sin(theta) * rel[1] + c,
        np.sin(theta) * rel[0] + np.cos(theta) * rel[1] + c,
    ])
    yx = np.unravel_index(np.argmax(out[..., 0]), out[..., 0].shape)
    got = np.asarray([yx[1], yx[0]], np.float32)
    assert np.linalg.norm(got - expect) < 1.6, (got, expect)


def test_rotate_shear3_bmm_matches_shear3(rng):
    """The batched-matmul 3-shear form (ops/image_warp.rotate_shear3_bmm,
    the round-4 augment default — 2.1x the binary-shift form on v5e) is
    pixel-identical to rotate_shear3 except at content edges, where its
    partial-tap samples are MORE faithful to cv2 BORDER_CONSTANT (the
    shift form zeroes any sample whose base tap leaves range)."""
    from satellite_pose_estimation_tpu.ops.image_warp import (
        rotate_shear3,
        rotate_shear3_bmm,
    )

    img = _square_smooth(rng)
    for cubic in (False, True):
        for deg in (7.0, -62.0, 89.0):
            th = jnp.float32(np.deg2rad(deg))
            a = np.asarray(rotate_shear3(jnp.asarray(img), th, cubic))
            b = np.asarray(rotate_shear3_bmm(jnp.asarray(img), th, cubic))
            d = np.abs(a - b)
            assert np.median(d) < 1e-2, (cubic, deg, np.median(d))
            # edge-band disagreement only (cubic's 4-tap band is ~2x the
            # bilinear band on this 128 px test image)
            cap = 0.05 if cubic else 0.03
            assert (d > 1.0).mean() < cap, (cubic, deg, (d > 1.0).mean())


@pytest.mark.parametrize("deg", [7.0, -30.0, 62.0, -89.0])
def test_rotate_shear3_bmm_vs_cv2(rng, deg):
    """Same cv2.warpAffine oracle as the shift form (borderValue 0)."""
    from satellite_pose_estimation_tpu.ops.image_warp import (
        rotate_shear3_bmm,
    )

    img = _square_smooth(rng)
    S = img.shape[0]
    c = (S - 1) / 2.0
    theta = np.deg2rad(deg)
    ours = np.asarray(
        rotate_shear3_bmm(jnp.asarray(img), jnp.float32(theta)))
    M = cv2.getRotationMatrix2D((c, c), -deg, 1.0)
    ref = cv2.warpAffine(
        img, M, (S, S), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )
    err = np.abs(ours - ref)
    assert np.median(err) < 2.0, f"median err {np.median(err)}"
    content = (ref.max(axis=-1) > 0).astype(np.uint8)
    near = cv2.dilate(content, np.ones((9, 9), np.uint8)) > 0
    far_out = ~near
    if far_out.any():
        assert np.abs(ours[far_out]).max() < 4.0


def test_rotate_shear3_bmm_identity_and_keypoints(rng):
    from satellite_pose_estimation_tpu.ops.image_warp import (
        rotate_shear3_bmm,
    )

    img = _square_smooth(rng)
    out = np.asarray(rotate_shear3_bmm(jnp.asarray(img), jnp.float32(0.0)))
    np.testing.assert_allclose(out, img, atol=1e-3)

    S = 128
    dot = np.zeros((S, S, 3), np.float32)
    kp = np.asarray([88.0, 37.0])
    dot[int(kp[1]), int(kp[0])] = 255.0
    dot = cv2.GaussianBlur(dot, (9, 9), 2.0) * 40.0
    theta = -0.7
    out = np.asarray(rotate_shear3_bmm(jnp.asarray(dot), jnp.float32(theta)))
    c = (S - 1) / 2.0
    rel = kp - c
    expect = np.asarray([
        np.cos(theta) * rel[0] - np.sin(theta) * rel[1] + c,
        np.sin(theta) * rel[0] + np.cos(theta) * rel[1] + c,
    ])
    yx = np.unravel_index(np.argmax(out[..., 0]), out[..., 0].shape)
    got = np.asarray([yx[1], yx[0]], np.float32)
    assert np.linalg.norm(got - expect) < 1.6, (got, expect)


def test_rotate_shear3_cubic_close_to_bilinear(rng):
    from satellite_pose_estimation_tpu.ops.image_warp import rotate_shear3

    img = _square_smooth(rng)
    bil = np.asarray(rotate_shear3(jnp.asarray(img), jnp.float32(0.3)))
    cub = np.asarray(
        rotate_shear3(jnp.asarray(img), jnp.float32(0.3), cubic=True)
    )
    assert np.median(np.abs(bil - cub)) < 1.5


def test_upsample_bilinear_align_corners_matches_torch(rng):
    """torch nn.UpsamplingBilinear2d oracle (align_corners=True): the
    reference Backbone8s upsample (R1/models/backbone.py:127)."""
    import torch

    from satellite_pose_estimation_tpu.ops.image_warp import (
        upsample_bilinear_align_corners,
    )

    for h, w in ((4, 4), (7, 5), (1, 3)):
        x = rng.rand(2, h, w, 3).astype(np.float32)
        want = torch.nn.UpsamplingBilinear2d(scale_factor=2)(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), 2))
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f"{h}x{w}")


def test_resize_bilinear_torch_matches_interpolate(rng):
    """torch F.interpolate(bilinear, align_corners=False, no antialias)
    oracle — the custom-backbone branch resize (R2 mobilenetv3.py:219)."""
    import torch.nn.functional as F
    import torch

    from satellite_pose_estimation_tpu.ops.image_warp import (
        resize_bilinear_torch,
    )

    for (h, w), (oh, ow) in (((128, 128), (64, 64)), ((9, 7), (4, 3)),
                             ((5, 5), (10, 10))):
        x = rng.rand(2, h, w, 3).astype(np.float32)
        want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                             size=(oh, ow), mode="bilinear",
                             align_corners=False).numpy()
        got = np.asarray(resize_bilinear_torch(jnp.asarray(x), oh, ow))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                                   atol=1e-5, err_msg=f"{h}x{w}->{oh}x{ow}")


def test_resize_bicubic_torch_matches_interpolate(rng):
    """torch F.interpolate(bicubic, align_corners=False) oracle — the
    encoder PAN 0.5x downsample (R2 hybrid_encoder.py:394)."""
    import torch.nn.functional as F
    import torch

    from satellite_pose_estimation_tpu.ops.image_warp import (
        resize_bicubic_torch,
    )

    for (h, w), (oh, ow) in (((16, 16), (8, 8)), ((12, 10), (6, 5)),
                             ((6, 6), (12, 12))):
        x = rng.rand(2, h, w, 3).astype(np.float32)
        want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                             size=(oh, ow), mode="bicubic",
                             align_corners=False).numpy()
        got = np.asarray(resize_bicubic_torch(jnp.asarray(x), oh, ow))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                                   atol=1e-4, err_msg=f"{h}x{w}->{oh}x{ow}")
