"""Oracle tests for the extended photometric family + cubic affine warp
(reference ops: R1/datasets/speed.py:306-334 albumentations pipeline)."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from satellite_pose_estimation_tpu.ops.image_warp import affine_warp_cubic
from satellite_pose_estimation_tpu.ops.photometric import (
    _blockwise_quantize,
    box_blur,
    iso_noise,
    jpeg_artifacts,
    median_blur3,
    motion_blur_kernel,
)


@pytest.fixture
def img(rng):
    # Smooth-ish structured image: gradients + texture, [0, 255].
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    base = np.stack([xx * 2, yy * 2, (xx + yy)], axis=-1)
    return np.clip(base + rng.randn(64, 64, 3) * 20 + 60, 0, 255).astype(
        np.float32
    )


def test_median_blur3_matches_cv2(img):
    ours = np.asarray(median_blur3(jnp.asarray(img)))
    ref = cv2.medianBlur(img.astype(np.uint8), 3).astype(np.float32)
    ours_u8 = np.asarray(median_blur3(jnp.asarray(img.astype(np.uint8)
                                                  .astype(np.float32))))
    np.testing.assert_array_equal(ours_u8[1:-1, 1:-1], ref[1:-1, 1:-1])
    assert ours.shape == img.shape


def test_motion_blur_kernel_is_normalized_line():
    for seed in range(8):
        k = np.asarray(motion_blur_kernel(jax.random.PRNGKey(seed)))
        assert k.shape == (7, 7)
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
        # it's a line: support has at least ksize>=3 cells, at most ~2 rows
        assert 3 <= (k > 0).sum() <= 15
        assert k[3, 3] > 0  # passes through the center


def test_box_blur_matches_cv2(img):
    ours = np.asarray(box_blur(jnp.asarray(img)))
    ref = cv2.blur(img, (3, 3), borderType=cv2.BORDER_CONSTANT)
    np.testing.assert_allclose(ours[1:-1, 1:-1], ref[1:-1, 1:-1],
                               rtol=1e-5, atol=1e-3)


def test_blockwise_quantize_identity_with_unit_table():
    rng = np.random.RandomState(0)
    plane = rng.randint(-128, 127, (16, 16)).astype(np.float32)
    rec = np.asarray(_blockwise_quantize(jnp.asarray(plane), jnp.ones((8, 8))))
    # table=1 rounds DCT coefficients to integers: error bounded by 0.5/coef
    assert np.abs(rec - plane).max() < 4.0


def test_jpeg_quality_monotonic(img):
    x = jnp.asarray(img)
    errs = []
    for q in (20.0, 50.0, 90.0, 99.0):
        out = np.asarray(jpeg_artifacts(x, jnp.float32(q)))
        assert out.min() >= 0 and out.max() <= 255
        errs.append(float(np.mean((out - img) ** 2)))
    assert errs[0] > errs[1] > errs[2] > errs[3]
    # The high-quality floor is 4:2:0 chroma subsampling (real encoders show
    # the same on textured images; tracked in test_jpeg_tracks_real_encoder).
    # On a grayscale image there is no chroma to lose: q=99 ~ identity.
    gray = jnp.asarray(np.repeat(img.mean(-1, keepdims=True), 3, axis=-1))
    out = np.asarray(jpeg_artifacts(gray, jnp.float32(99.0)))
    assert float(np.mean((out - np.asarray(gray)) ** 2)) < 3.0


def test_jpeg_tracks_real_encoder(img):
    """The simulator's per-quality degradation should track cv2's real JPEG
    round-trip within a factor of ~2.5 in MSE at each quality level."""
    for q in (20, 50, 90, 99):
        sim = np.asarray(jpeg_artifacts(jnp.asarray(img), jnp.float32(q)))
        ok, enc = cv2.imencode(
            ".jpg", cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2BGR),
            [cv2.IMWRITE_JPEG_QUALITY, q],
        )
        assert ok
        real = cv2.cvtColor(cv2.imdecode(enc, cv2.IMREAD_COLOR),
                            cv2.COLOR_BGR2RGB).astype(np.float32)
        mse_sim = np.mean((sim - img) ** 2)
        mse_real = np.mean((real - img) ** 2)
        assert 0.4 < mse_sim / mse_real < 2.5, (q, mse_sim, mse_real)


def test_iso_noise_statistics(img):
    x = jnp.asarray(img)
    lo = np.asarray(iso_noise(jax.random.PRNGKey(0), x, 0.02, 0.1))
    hi = np.asarray(iso_noise(jax.random.PRNGKey(0), x, 0.02, 0.5))
    assert lo.min() >= 0 and hi.max() <= 255
    d_lo = np.mean((lo - img) ** 2)
    d_hi = np.mean((hi - img) ** 2)
    assert d_hi > d_lo > 0


def test_affine_warp_cubic_matches_cv2(rng):
    src = rng.randint(0, 255, (80, 90, 3)).astype(np.float32)
    theta = 0.3
    M = np.asarray([
        [np.cos(theta) * 1.1, -np.sin(theta), 25.0],
        [np.sin(theta), np.cos(theta) * 0.9, 18.0],
    ], np.float32)
    S = 48
    ours = np.asarray(affine_warp_cubic(jnp.asarray(src), jnp.asarray(M), S))
    ref = cv2.warpAffine(
        src, M, (S, S),
        flags=cv2.INTER_CUBIC | cv2.WARP_INVERSE_MAP,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )
    # compare only pixels whose full 4x4 support is strictly interior
    d = np.arange(S, dtype=np.float32)
    dx, dy = np.meshgrid(d, d, indexing="xy")
    sx = M[0, 0] * dx + M[0, 1] * dy + M[0, 2]
    sy = M[1, 0] * dx + M[1, 1] * dy + M[1, 2]
    interior = (sx >= 2) & (sx < 90 - 3) & (sy >= 2) & (sy < 80 - 3)
    diff = np.abs(ours - ref)[interior]
    # cv2 uses 5-bit fixed-point tap weights: allow ~1 intensity unit
    assert np.percentile(diff, 99) < 1.5
    assert diff.mean() < 0.3


def test_augment_sample_full_family_runs():
    from satellite_pose_estimation_tpu.data.augment import (
        AugmentConfig,
        augment_sample,
    )

    rng = np.random.RandomState(0)
    buf = rng.randint(0, 255, (96, 96, 3)).astype(np.uint8)
    bbox = jnp.float32([8, 8, 88, 88])
    lms = jnp.asarray(rng.rand(11, 2) * 70 + 10, jnp.float32)
    # force every corruption on
    cfg = AugmentConfig(
        out_size=64, interp="cubic", p_blur=1.0, p_blur_family=1.0,
        p_noise=1.0, p_jpeg=1.0, p_iso=1.0, p_cutout=1.0, p_trunc=1.0,
    )
    img, kp = augment_sample(jax.random.PRNGKey(3), jnp.asarray(buf), bbox,
                             lms, cfg)
    assert np.isfinite(np.asarray(img)).all()
    assert np.isfinite(np.asarray(kp)).all()

    # photometric ops must not move keypoints: same geometry rng =>
    # identical keypoints with corruptions off
    cfg_off = AugmentConfig(out_size=64, interp="cubic", p_blur=0.0,
                            p_blur_family=0.0, p_noise=0.0, p_jpeg=0.0,
                            p_iso=0.0, p_cutout=0.0, p_trunc=0.0)
    _, kp_off = augment_sample(jax.random.PRNGKey(3), jnp.asarray(buf), bbox,
                               lms, cfg_off)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(kp_off), atol=1e-5)


def test_apply_subset_marginal_probability():
    from satellite_pose_estimation_tpu.data.augment import _apply_subset

    B, trials = 16, 40
    hits = np.zeros(B)
    imgs = jnp.zeros((B, 4, 4, 3))
    for t in range(trials):
        out = _apply_subset(jax.random.PRNGKey(t), imgs, 0.25,
                            lambda k, x: x + 1.0)
        hits += np.asarray(out[:, 0, 0, 0])
    # exactly round(0.25*16)=4 per trial, uniform across images
    assert hits.sum() == trials * 4
    p_hat = hits / trials
    assert np.all(p_hat > 0.1) and np.all(p_hat < 0.45)


def test_augment_batch_full_family_finite(rng):
    from satellite_pose_estimation_tpu.data.augment import (
        AugmentConfig,
        augment_batch,
    )

    B = 8
    bufs = jnp.asarray(rng.randint(0, 255, (B, 96, 96, 3)), jnp.uint8)
    bboxes = jnp.tile(jnp.float32([8, 8, 88, 88]), (B, 1))
    lms = jnp.asarray(rng.rand(B, 11, 2) * 70 + 10, jnp.float32)
    cfg = AugmentConfig(out_size=64, p_blur=0.5, p_blur_family=0.5,
                        p_noise=0.5, p_jpeg=0.5, p_iso=0.5, p_cutout=0.5,
                        p_trunc=0.5)
    imgs, kp = augment_batch(jax.random.PRNGKey(0), bufs, bboxes, lms, cfg)
    assert imgs.shape == (B, 64, 64, 3)
    assert np.isfinite(np.asarray(imgs)).all()
    assert np.isfinite(np.asarray(kp)).all()

    # photometric family must not move keypoints
    cfg_off = AugmentConfig(out_size=64, p_blur=0, p_blur_family=0,
                            p_noise=0, p_jpeg=0, p_iso=0, p_cutout=0,
                            p_trunc=0)
    _, kp_off = augment_batch(jax.random.PRNGKey(0), bufs, bboxes, lms,
                              cfg_off)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(kp_off), atol=1e-5)
