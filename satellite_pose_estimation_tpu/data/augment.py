"""Device-side train-time augmentation (jax.random driven, fixed shapes).

TPU-first redesign of the reference albumentations pipeline
(R1/datasets/speed.py:306-334): instead of sequential host interpolations
(HFlip -> Affine -> Rotate -> Resize), the geometric ops compose into ONE
inverse-affine matrix applied in a single bilinear resample from the packed
buffer. Photometric ops (blur / gaussian noise / cutout / edge truncation)
run as vectorised device ops on the warped crop.

Keypoints ride the same affine: the forward map is applied analytically, so
image/keypoint consistency is exact by construction (albumentations-level
behavioral parity; bitwise parity is meaningless for stochastic augs).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.image_warp import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    affine_warp_bilinear,
    affine_warp_cubic,
)


class AugmentConfig(NamedTuple):
    out_size: int = 256
    interp: str = "bilinear"  # "cubic" = INTER_CUBIC warp (reference train
    # interpolation, R1/datasets/speed.py:306-313); bilinear is the faster
    # default (A/B'd on the synthetic selfcheck)
    p_hflip: float = 0.5
    p_rotate: float = 0.4
    rotate_limit_deg: float = 90.0
    p_affine: float = 0.1
    affine_scale_jitter: float = 0.1
    affine_shift_jitter: float = 0.05
    p_blur: float = 0.3
    # OneOf([MotionBlur .2, MedianBlur .1, Blur .1], p=.2): family gate +
    # normalized within-group weights (0.5, 0.25, 0.25).
    p_blur_family: float = 0.2
    motion_blur_max_ksize: int = 7
    p_noise: float = 0.2
    noise_sigma_max: float = 12.75  # ~ albumentations gauss default var cap
    p_jpeg: float = 0.1
    jpeg_quality_min: float = 20.0
    jpeg_quality_max: float = 99.0
    p_iso: float = 0.2
    iso_color_shift: Tuple[float, float] = (0.01, 0.05)
    iso_intensity: Tuple[float, float] = (0.1, 0.5)
    p_cutout: float = 0.1
    cutout_holes: int = 10
    cutout_max: int = 40
    p_trunc: float = 0.2
    trunc_ratio: float = 0.2
    # "bmm" (default) = Paeth 3-shear rotation with each shear as a
    # per-row-matrix batched MATMUL (ops/image_warp.rotate_shear3_bmm:
    # 11.8 ms vs 24.8 for the 51-image subset @224 — the MXU resamples
    # instead of a select chain); "shear" = the binary-decomposed-shift
    # form; "pallas" = shears fused into one VMEM kernel
    # (ops/pallas_rotate.py, TPU only); "gather" = direct inverse-affine
    # warp (bitwise cv2.warpAffine, ~5x slower).
    rotate_impl: str = "bmm"


def _sample_affine(rng, clip_bbox, cfg: AugmentConfig):
    """Compose flip/rotate/affine/crop-resize into an output->source 2x3
    matrix (buffer pixel coords) and its keypoint forward transform."""
    S = cfg.out_size
    k = jax.random.split(rng, 6)
    x1, y1, x2, y2 = clip_bbox[0], clip_bbox[1], clip_bbox[2], clip_bbox[3]
    w, h = x2 - x1, y2 - y1
    cx, cy = (x1 + x2 - 1.0) / 2.0, (y1 + y2 - 1.0) / 2.0

    do_flip = jax.random.bernoulli(k[0], cfg.p_hflip)
    do_rot = jax.random.bernoulli(k[1], cfg.p_rotate)
    theta = jnp.where(
        do_rot,
        jax.random.uniform(
            k[2],
            minval=-cfg.rotate_limit_deg,
            maxval=cfg.rotate_limit_deg,
        )
        * jnp.pi
        / 180.0,
        0.0,
    )
    do_aff = jax.random.bernoulli(k[3], cfg.p_affine)
    scale = jnp.where(
        do_aff,
        1.0
        + jax.random.uniform(
            k[4], minval=-cfg.affine_scale_jitter, maxval=cfg.affine_scale_jitter
        ),
        1.0,
    )
    shift = jnp.where(
        do_aff,
        jax.random.uniform(k[5], (2,), minval=-1.0, maxval=1.0)
        * cfg.affine_shift_jitter
        * jnp.asarray([w, h]),
        jnp.zeros(2),
    )

    # Output pixel d -> crop coords q0 (cv2 resize half-pixel convention).
    # q0 = bb_xy + (d + 0.5) * wh / S - 0.5
    a_x = w / S
    a_y = h / S
    b_x = x1 + 0.5 * a_x - 0.5
    b_y = y1 + 0.5 * a_y - 0.5

    cos_t = jnp.cos(theta) / scale
    sin_t = jnp.sin(theta) / scale

    # src = Flip(C + R(-theta)/scale * (q0 - C) - shift)
    def compose():
        # rows of the linear part acting on (dx, dy)
        m00 = cos_t * a_x
        m01 = sin_t * a_y
        m10 = -sin_t * a_x
        m11 = cos_t * a_y
        t0 = cos_t * (b_x - cx) + sin_t * (b_y - cy) + cx - shift[0]
        t1 = -sin_t * (b_x - cx) + cos_t * (b_y - cy) + cy - shift[1]
        # horizontal flip across the crop center (x -> 2cx - x)
        m00f = jnp.where(do_flip, -m00, m00)
        m01f = jnp.where(do_flip, -m01, m01)
        t0f = jnp.where(do_flip, 2.0 * cx - t0, t0)
        return jnp.asarray([[m00f, m01f, t0f], [m10, m11, t1]])

    M = compose()

    # Keypoint forward map: invert M (2x2 linear + translation).
    det = M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0]
    det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    inv00 = M[1, 1] / det
    inv01 = -M[0, 1] / det
    inv10 = -M[1, 0] / det
    inv11 = M[0, 0] / det

    def kp_forward(kp):
        rel_x = kp[..., 0] - M[0, 2]
        rel_y = kp[..., 1] - M[1, 2]
        return jnp.stack(
            [inv00 * rel_x + inv01 * rel_y, inv10 * rel_x + inv11 * rel_y],
            axis=-1,
        )

    return M, kp_forward


def _photometric(rng, img, cfg: AugmentConfig):
    """Full reference corruption family (R1/datasets/speed.py:314-327) on the
    (S,S,3) crop in [0, 255] space: box blur, OneOf(motion/median/box) blur,
    gaussian noise, JPEG artifacts, ISO noise, cutout, edge truncation. All
    branches are computed and gated with jnp.where — one compiled program."""
    from ..ops.photometric import (
        box_blur,
        iso_noise,
        jpeg_artifacts,
        median_blur3,
        motion_blur,
    )

    S = cfg.out_size
    k = jax.random.split(rng, 16)

    # 3x3 box blur (Blur(blur_limit=3) equivalent).
    do_blur = jax.random.bernoulli(k[0], cfg.p_blur)
    img = jnp.where(do_blur, box_blur(img), img)

    # OneOf([MotionBlur, MedianBlur(3), Blur(3)], p=p_blur_family).
    if cfg.p_blur_family > 0:
        do_fam = jax.random.bernoulli(k[10], cfg.p_blur_family)
        u_fam = jax.random.uniform(k[11])
        fam = jnp.where(
            u_fam < 0.5,
            motion_blur(k[12], img, cfg.motion_blur_max_ksize),
            jnp.where(u_fam < 0.75, median_blur3(img), box_blur(img)),
        )
        img = jnp.where(do_fam, fam, img)

    # Additive gaussian noise.
    do_noise = jax.random.bernoulli(k[1], cfg.p_noise)
    sigma = jax.random.uniform(k[2], minval=0.0, maxval=cfg.noise_sigma_max)
    noise = jax.random.normal(k[3], img.shape) * sigma
    img = jnp.where(do_noise, img + noise, img)

    # JPEG compression artifacts (quality uniform in [min, max]).
    if cfg.p_jpeg > 0:
        do_jpeg = jax.random.bernoulli(k[13], cfg.p_jpeg)
        quality = jax.random.uniform(
            k[14], minval=cfg.jpeg_quality_min, maxval=cfg.jpeg_quality_max
        )
        img = jnp.where(
            do_jpeg, jpeg_artifacts(jnp.clip(img, 0.0, 255.0), quality), img
        )

    # ISO sensor noise.
    if cfg.p_iso > 0:
        do_iso = jax.random.bernoulli(k[15], cfg.p_iso)
        kc, ki, kn = jax.random.split(jax.random.fold_in(rng, 99), 3)
        cshift = jax.random.uniform(kc, minval=cfg.iso_color_shift[0],
                                    maxval=cfg.iso_color_shift[1])
        inten = jax.random.uniform(ki, minval=cfg.iso_intensity[0],
                                   maxval=cfg.iso_intensity[1])
        img = jnp.where(
            do_iso,
            iso_noise(kn, jnp.clip(img, 0.0, 255.0), cshift, inten),
            img,
        )

    # Cutout: fixed number of holes, masked by bernoulli.
    do_cut = jax.random.bernoulli(k[4], cfg.p_cutout)
    holes_xy = jax.random.randint(k[5], (cfg.cutout_holes, 2), 0, S)
    holes_wh = jax.random.randint(k[6], (cfg.cutout_holes, 2), 1, cfg.cutout_max)
    xx = jnp.arange(S)[None, None, :]  # (1,1,S)
    yy = jnp.arange(S)[None, :, None]  # (1,S,1)
    in_x = (xx >= holes_xy[:, 0:1, None]) & (
        xx < holes_xy[:, 0:1, None] + holes_wh[:, 0:1, None]
    )
    in_y = (yy >= holes_xy[:, 1:2, None]) & (
        yy < holes_xy[:, 1:2, None] + holes_wh[:, 1:2, None]
    )
    hole_mask = jnp.any(in_x & in_y, axis=0)  # (S, S)
    img = jnp.where(do_cut & hole_mask[..., None], 0.0, img)

    # img_trunc edge blanking (R1/datasets/speed.py:163-185).
    do_trunc = jax.random.bernoulli(k[7], cfg.p_trunc)
    th = jax.random.randint(k[8], (), 0, max(int(S * cfg.trunc_ratio), 1))
    tw = jax.random.randint(k[9], (), 0, max(int(S * cfg.trunc_ratio), 1))
    u = jax.random.uniform(jax.random.fold_in(rng, 77))
    top = (yy[0] < th) | (xx[0] < tw)     # u < 0.25 branch
    bottom = (yy[0] >= S - th) | (xx[0] >= S - tw)  # u > 0.75 branch
    trunc_mask = jnp.where(u < 0.25, top, jnp.where(u > 0.75, bottom, False))
    img = jnp.where(do_trunc & trunc_mask[..., None], 0.0, img)

    return jnp.clip(img, 0.0, 255.0)


@partial(jax.jit, static_argnames=("cfg",))
def augment_sample(rng, image_buf, clip_bbox, landmarks_buf,
                   cfg: AugmentConfig = AugmentConfig()):
    """One sample: geometric warp (single resample) + photometric + normalize.

    Args:
        image_buf: (P, P, 3) uint8 packed buffer.
        clip_bbox: (4,) crop box in buffer coords.
        landmarks_buf: (K, 2) landmark pixels in buffer coords.
    Returns:
        img (S, S, 3) float32 ImageNet-normalized, landmarks_norm (K, 2) in
        [0, 1] output coords (may exit [0,1] if augmentation moved them out,
        matching remove_invisible=False).
    """
    k_geo, k_photo = jax.random.split(rng)
    M, kp_forward = _sample_affine(k_geo, clip_bbox, cfg)
    warp = (affine_warp_cubic if cfg.interp == "cubic"
            else affine_warp_bilinear)
    img = warp(image_buf, M, cfg.out_size, normalize=False)
    img = _photometric(k_photo, img, cfg)
    img = (img / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    kp_out = kp_forward(landmarks_buf)
    kp_norm = (kp_out + 0.0) / cfg.out_size
    return img, kp_norm


def _apply_subset(rng, imgs, p, fn):
    """Run ``fn`` on a random fixed-count subset of the batch.

    SPMD-efficient gating: per-sample ``jnp.where(do_op, op(img), img)``
    still computes ``op`` for EVERY image (static shapes), which made the
    full corruption family cost ~4 ms/image. Instead exactly
    ``round(p * B)`` images (uniformly chosen without replacement) receive
    the op — the same marginal probability per image, only the count is
    fixed instead of binomial, and the op runs on exactly the expected
    fraction of the batch. fn: (rng, (n, S, S, 3)) -> (n, S, S, 3).
    """
    B = imgs.shape[0]
    n = int(round(p * B))
    if n == 0:
        return imgs
    k_perm, k_op = jax.random.split(rng)
    idx = jax.random.permutation(k_perm, B)[:n]
    sub = jnp.take(imgs, idx, axis=0)
    return imgs.at[idx].set(fn(k_op, sub))


def _photometric_batch(rng, imgs, cfg: AugmentConfig):
    """Batch-level corruption family on (B, S, S, 3) crops in [0, 255]."""
    from ..ops.photometric import (
        box_blur,
        iso_noise,
        jpeg_artifacts,
        median_blur3,
        motion_blur,
    )

    B, S = imgs.shape[0], cfg.out_size
    keys = jax.random.split(rng, 12)

    vb = jax.vmap(box_blur)
    imgs = _apply_subset(keys[0], imgs, cfg.p_blur, lambda k, x: vb(x))

    # OneOf family: per-reference weights .5/.25/.25 within p_blur_family.
    imgs = _apply_subset(
        keys[1], imgs, cfg.p_blur_family * 0.5,
        lambda k, x: jax.vmap(
            lambda kk, im: motion_blur(kk, im, cfg.motion_blur_max_ksize)
        )(jax.random.split(k, x.shape[0]), x),
    )
    imgs = _apply_subset(keys[2], imgs, cfg.p_blur_family * 0.25,
                         lambda k, x: jax.vmap(median_blur3)(x))
    imgs = _apply_subset(keys[3], imgs, cfg.p_blur_family * 0.25,
                         lambda k, x: vb(x))

    def add_noise(k, x):
        k1, k2 = jax.random.split(k)
        sigma = jax.random.uniform(
            k1, (x.shape[0], 1, 1, 1), minval=0.0,
            maxval=cfg.noise_sigma_max)
        return x + jax.random.normal(k2, x.shape) * sigma

    imgs = _apply_subset(keys[4], imgs, cfg.p_noise, add_noise)

    def jpeg(k, x):
        q = jax.random.uniform(
            k, (x.shape[0],), minval=cfg.jpeg_quality_min,
            maxval=cfg.jpeg_quality_max)
        return jax.vmap(jpeg_artifacts)(jnp.clip(x, 0.0, 255.0), q)

    imgs = _apply_subset(keys[5], imgs, cfg.p_jpeg, jpeg)

    def iso(k, x):
        n = x.shape[0]
        kc, ki, kn = jax.random.split(k, 3)
        cs = jax.random.uniform(kc, (n,), minval=cfg.iso_color_shift[0],
                                maxval=cfg.iso_color_shift[1])
        it = jax.random.uniform(ki, (n,), minval=cfg.iso_intensity[0],
                                maxval=cfg.iso_intensity[1])
        return jax.vmap(iso_noise)(jax.random.split(kn, n),
                                   jnp.clip(x, 0.0, 255.0), cs, it)

    imgs = _apply_subset(keys[6], imgs, cfg.p_iso, iso)

    def cutout(k, x):
        n = x.shape[0]
        k1, k2 = jax.random.split(k)
        holes_xy = jax.random.randint(k1, (n, cfg.cutout_holes, 2), 0, S)
        holes_wh = jax.random.randint(k2, (n, cfg.cutout_holes, 2), 1,
                                      cfg.cutout_max)
        x0 = holes_xy[:, :, 0][..., None, None]  # (n, holes, 1, 1)
        y0 = holes_xy[:, :, 1][..., None, None]
        w = holes_wh[:, :, 0][..., None, None]
        h = holes_wh[:, :, 1][..., None, None]
        xx = jnp.arange(S)[None, None, None, :]  # -> (n, holes, 1, S)
        yy = jnp.arange(S)[None, None, :, None]  # -> (n, holes, S, 1)
        hit = (xx >= x0) & (xx < x0 + w) & (yy >= y0) & (yy < y0 + h)
        mask = jnp.any(hit, axis=1)  # (n, S, S)
        return jnp.where(mask[..., None], 0.0, x)

    imgs = _apply_subset(keys[7], imgs, cfg.p_cutout, cutout)

    def trunc(k, x):
        n = x.shape[0]
        k1, k2, k3 = jax.random.split(k, 3)
        hi = max(int(S * cfg.trunc_ratio), 1)
        th = jax.random.randint(k1, (n, 1, 1), 0, hi)
        tw = jax.random.randint(k2, (n, 1, 1), 0, hi)
        u = jax.random.uniform(k3, (n, 1, 1))
        xx = jnp.arange(S)[None, None, :]
        yy = jnp.arange(S)[None, :, None]
        top = (yy < th) | (xx < tw)
        bottom = (yy >= S - th) | (xx >= S - tw)
        mask = jnp.where(u < 0.25, top, jnp.where(u > 0.75, bottom, False))
        return jnp.where(mask[..., None], 0.0, x)

    imgs = _apply_subset(keys[8], imgs, cfg.p_trunc, trunc)
    return jnp.clip(imgs, 0.0, 255.0)


def _axis_matrix(S, a, b, extent, cubic: bool):
    """Dense (S, extent) interpolation matrix for source coords a*d + b.

    Taps outside [0, extent) read zero (BORDER_CONSTANT). Built from iota
    comparisons so the whole resample becomes a dense matmul on the MXU —
    the 2-D gather formulation of the same warp measured ~30x slower on
    TPU (gathers bypass the MXU entirely).
    """
    d = jnp.arange(S, dtype=jnp.float32)
    coords = a * d + b
    base = jnp.floor(coords)
    t = coords - base
    if cubic:
        from ..ops.image_warp import _cubic_weights

        w = _cubic_weights(t)  # (S, 4)
        offs = jnp.asarray([-1.0, 0.0, 1.0, 2.0])
    else:
        w = jnp.stack([1.0 - t, t], axis=-1)  # (S, 2)
        offs = jnp.asarray([0.0, 1.0])
    taps = base[:, None] + offs[None, :]
    inside = (taps >= 0) & (taps <= extent - 1)
    idx = jnp.clip(taps, 0, extent - 1).astype(jnp.int32)
    cols = jnp.arange(extent)[None, None, :]
    onehot = (idx[:, :, None] == cols).astype(jnp.float32)
    return jnp.einsum("st,ste->se", w * inside, onehot)


def augment_batch(rng, images, clip_bboxes, landmarks,
                  cfg: AugmentConfig = AugmentConfig()):
    """Batch augmentation, MXU-first:

    1. flip/scale/shift/crop-resize are axis-separable -> TWO dense matmuls
       per image (like the eval-path MXU warp) for the WHOLE batch;
    2. rotation (p_rotate of images) runs as a gather warp on the already
       resampled (S, S) crop for a fixed-count subset only;
    3. batch-level photometric family on fixed-count subsets.

    The previous formulation (full inverse-affine gather warp per image)
    measured ~475 ms at batch 128 on v5e — gathers bypass the MXU; this
    route moves ~100% of the resampling FLOPs onto it.
    """
    k_sep, k_sel, k_rot, k_photo = jax.random.split(rng, 4)
    B = images.shape[0]
    S = cfg.out_size
    H, W = images.shape[1], images.shape[2]
    cubic = cfg.interp == "cubic"

    # --- separable params per image (flip/scale/shift folded per axis)
    def sep_params(r, bb):
        k = jax.random.split(r, 4)
        x1, y1, x2, y2 = bb[0], bb[1], bb[2], bb[3]
        w, h = x2 - x1, y2 - y1
        cx, cy = (x1 + x2 - 1.0) / 2.0, (y1 + y2 - 1.0) / 2.0
        do_flip = jax.random.bernoulli(k[0], cfg.p_hflip)
        do_aff = jax.random.bernoulli(k[1], cfg.p_affine)
        scale = jnp.where(
            do_aff,
            1.0 + jax.random.uniform(
                k[2], minval=-cfg.affine_scale_jitter,
                maxval=cfg.affine_scale_jitter),
            1.0,
        )
        shift = jnp.where(
            do_aff,
            jax.random.uniform(k[3], (2,), minval=-1.0, maxval=1.0)
            * cfg.affine_shift_jitter * jnp.asarray([w, h]),
            jnp.zeros(2),
        )
        # crop map: q0 = b0 + a0 * d (cv2 half-pixel), then center-scale
        # and shift: src = c + (q0 - c)/scale - shift
        a0x, a0y = w / S, h / S
        b0x = x1 + 0.5 * a0x - 0.5
        b0y = y1 + 0.5 * a0y - 0.5
        ax = a0x / scale
        bx = cx + (b0x - cx) / scale - shift[0]
        ay = a0y / scale
        by = cy + (b0y - cy) / scale - shift[1]
        # horizontal flip across the crop center: x -> 2cx - x
        ax = jnp.where(do_flip, -ax, ax)
        bx = jnp.where(do_flip, 2.0 * cx - bx, bx)
        return ax, bx, ay, by

    ax, bx, ay, by = jax.vmap(sep_params)(
        jax.random.split(k_sep, B), clip_bboxes)

    def warp_sep(img, ax_, bx_, ay_, by_):
        Wx = _axis_matrix(S, ax_, bx_, W, cubic)  # (S, W)
        Wy = _axis_matrix(S, ay_, by_, H, cubic)  # (S, H)
        tmp = jnp.einsum("sh,hwc->swc", Wy, img.astype(jnp.float32))
        return jnp.einsum("xw,swc->sxc", Wx, tmp)

    warped = jax.vmap(warp_sep)(images, ax, bx, ay, by)
    # keypoints through the separable map: d = (src - b) / a
    kp = jnp.stack(
        [(landmarks[..., 0] - bx[:, None]) / ax[:, None],
         (landmarks[..., 1] - by[:, None]) / ay[:, None]],
        axis=-1,
    )

    # --- rotation subset (reference Rotate p=0.4, INTER_CUBIC, constant
    # border) on the resampled crop, about its center
    n_rot = int(round(cfg.p_rotate * B))
    if n_rot > 0 and cfg.rotate_limit_deg > 0:
        idx = jax.random.permutation(k_sel, B)[:n_rot]
        thetas = jax.random.uniform(
            k_rot, (n_rot,), minval=-cfg.rotate_limit_deg,
            maxval=cfg.rotate_limit_deg) * (jnp.pi / 180.0)
        c = (S - 1.0) / 2.0
        if cfg.rotate_impl == "bmm" and cfg.rotate_limit_deg <= 90.0:
            from ..ops.image_warp import rotate_shear3_bmm

            rotated = jax.vmap(
                lambda im, th: rotate_shear3_bmm(im, th, cubic))(
                jnp.take(warped, idx, axis=0), thetas)
        elif cfg.rotate_impl == "pallas" and cfg.rotate_limit_deg <= 90.0:
            from ..ops.pallas_rotate import rotate_shear3_pallas

            rotated = rotate_shear3_pallas(
                jnp.take(warped, idx, axis=0), thetas, cubic=cubic)
        elif cfg.rotate_impl == "shear" and cfg.rotate_limit_deg <= 90.0:
            from ..ops.image_warp import rotate_shear3

            rotated = jax.vmap(lambda im, th: rotate_shear3(im, th, cubic))(
                jnp.take(warped, idx, axis=0), thetas)
        else:
            rot_warp = affine_warp_cubic if cubic else affine_warp_bilinear

            def rot_one(im, th):
                cos, sin = jnp.cos(th), jnp.sin(th)
                # out -> src: src = R(-th) (out - c) + c
                M = jnp.asarray([
                    [cos, sin, c - cos * c - sin * c],
                    [-sin, cos, c + sin * c - cos * c],
                ])
                return rot_warp(im, M, S, normalize=False)

            rotated = jax.vmap(rot_one)(jnp.take(warped, idx, axis=0), thetas)
        warped = warped.at[idx].set(rotated)
        # keypoints rotate with the content: kp' = R(th) (kp - c) + c
        kps = jnp.take(kp, idx, axis=0)
        cos, sin = jnp.cos(thetas)[:, None], jnp.sin(thetas)[:, None]
        rel_x = kps[..., 0] - c
        rel_y = kps[..., 1] - c
        kp = kp.at[idx].set(jnp.stack(
            [cos * rel_x - sin * rel_y + c,
             sin * rel_x + cos * rel_y + c], axis=-1))

    out = _photometric_batch(k_photo, warped, cfg)
    out = (out / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return out, kp / S


def augment_batch_pallas(rng, images, clip_bboxes, landmarks,
                         cfg: AugmentConfig = AugmentConfig(),
                         interpret: bool = False):
    """Pallas-fused variant of augment_batch: geometric warp per image via
    the bilinear gather, then the ENTIRE photometric chain (blur/noise/
    cutout/truncation/normalize) as ONE Pallas kernel pass over the batch
    (ops/pallas_augment.py). Numerically equivalent augmentation family
    (RNG streams differ). Returns (images, landmarks_norm)."""
    import numpy as np

    from ..ops.pallas_augment import fused_photometric_pallas

    B = images.shape[0]
    k_geo, k_params, k_seed = jax.random.split(rng, 3)

    # Geometric warp (unnormalized output in [0, 255]).
    geo_rngs = jax.random.split(k_geo, B)

    def warp_one(r, img, bb, lm):
        M, kp_forward = _sample_affine(r, bb, cfg)
        out = affine_warp_bilinear(img, M, cfg.out_size, normalize=False)
        kp = kp_forward(lm) / cfg.out_size
        return out, kp

    warped, kp_norm = jax.vmap(warp_one)(geo_rngs, images, clip_bboxes,
                                         landmarks)

    # Per-image photometric parameters.
    ks = jax.random.split(k_params, 6)
    S = cfg.out_size
    scalars = jnp.stack(
        [
            jax.random.bernoulli(ks[0], cfg.p_blur, (B,)).astype(jnp.float32),
            jax.random.uniform(ks[1], (B,), minval=0.0,
                               maxval=cfg.noise_sigma_max),
            jax.random.bernoulli(ks[2], cfg.p_noise, (B,)).astype(jnp.float32),
            jax.random.bernoulli(ks[3], cfg.p_cutout, (B,)).astype(jnp.float32),
            jax.random.bernoulli(ks[4], cfg.p_trunc, (B,)).astype(jnp.float32),
            jax.random.uniform(ks[5], (B,)),
            jax.random.randint(
                jax.random.fold_in(k_params, 7), (B,), 0,
                max(int(S * cfg.trunc_ratio), 1)).astype(jnp.float32),
            jax.random.randint(
                jax.random.fold_in(k_params, 8), (B,), 0,
                max(int(S * cfg.trunc_ratio), 1)).astype(jnp.float32),
        ],
        axis=1,
    )
    holes_xy = jax.random.randint(
        jax.random.fold_in(k_params, 9), (B, cfg.cutout_holes, 2), 0, S
    )
    holes_wh = jax.random.randint(
        jax.random.fold_in(k_params, 10), (B, cfg.cutout_holes, 2), 1,
        cfg.cutout_max,
    )
    holes = jnp.concatenate([holes_xy, holes_wh], axis=-1)

    seed = jax.random.randint(k_seed, (), 0, 2**31 - 1)
    noise = None
    if interpret:
        noise = jax.random.normal(k_seed, (B, S, S))
    out = fused_photometric_pallas(
        warped, scalars, holes, seed, interpret=interpret, noise=noise
    )
    return out, kp_norm
