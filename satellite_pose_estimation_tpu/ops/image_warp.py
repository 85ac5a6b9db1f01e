"""Device-resident image warping: fused crop + resize + normalize.

The reference does PIL crop -> cv2.resize(INTER_CUBIC) -> to_tensor ->
ImageNet-normalize on host CPU per image (R1/datasets/speed.py:209-244,
44-160). Here the full-resolution uint8 image goes to the device once and a
single fused gather computes the normalized (S, S, 3) crop:

* ``crop_resize_cubic`` — separable Catmull-Rom (a = -0.75, cv2's cubic
  kernel) with cv2's half-pixel coordinate mapping and edge-replication at
  the crop/canvas border; pixels of the canvas outside the real image are
  zero (the SpeedSubmission pad-to-square contract).
* ``affine_warp_bilinear`` — general inverse-affine warp for train-time
  geometric augmentation (flip/rotate/scale fused into ONE resample instead
  of the reference's sequential interpolations).

Both batch with vmap and run inside jit: per-image crop boxes are traced
values, shapes are static.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def _cubic_weights(t, a=-0.75):
    """Catmull-Rom-style cubic kernel weights for taps at offsets
    (-1, 0, 1, 2) relative to floor(x), with t = frac(x). cv2-compatible
    (BiCubic with a = -0.75)."""
    # |s| for each tap: 1+t, t, 1-t, 2-t
    def k(s):
        s = jnp.abs(s)
        w1 = ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0  # |s| <= 1
        w2 = ((a * s - 5.0 * a) * s + 8.0 * a) * s - 4.0 * a  # 1 < |s| < 2
        return jnp.where(s <= 1.0, w1, jnp.where(s < 2.0, w2, 0.0))

    return jnp.stack([k(t + 1.0), k(t), k(1.0 - t), k(2.0 - t)], axis=-1)


def _axis_samples(out_size, c0, c1):
    """cv2.resize source coordinates for one axis: src = (dst+0.5)*scale-0.5
    within the crop [c0, c1), then offset by c0."""
    scale = (c1 - c0) / out_size
    d = jnp.arange(out_size, dtype=jnp.float32)
    return c0 + (d + 0.5) * scale - 0.5


def _gather_taps_1d(coords, canvas_lo, canvas_hi, img_extent):
    """For fractional source coords (S,), return tap indices (S, 4) int32
    clipped for border-replicate within the canvas, a zero-mask (S, 4) for
    taps outside the real image, and cubic weights (S, 4)."""
    base = jnp.floor(coords)
    t = coords - base
    w = _cubic_weights(t)  # (S, 4)
    taps = base[:, None] + jnp.asarray([-1.0, 0.0, 1.0, 2.0])[None, :]
    # Replicate at the canvas edge (cv2.resize border behavior on the crop).
    lo = jnp.ceil(canvas_lo)
    hi = jnp.floor(canvas_hi - 1e-3)
    taps = jnp.clip(taps, lo, hi)
    # Zero outside the real image (pad-to-square canvas contract).
    inside = (taps >= 0) & (taps <= img_extent - 1)
    idx = jnp.clip(taps, 0, img_extent - 1).astype(jnp.int32)
    return idx, inside.astype(jnp.float32), w


@partial(jax.jit, static_argnames=("out_size", "normalize"))
def crop_resize_cubic(image, clip_bbox, out_size=256, normalize=True):
    """Fused crop+cubic-resize+normalize for one image.

    Args:
        image: (H, W, 3) uint8 or float source image.
        clip_bbox: (4,) float [x1, y1, x2, y2] crop box. May extend beyond
            the image; outside pixels read as zero.
        out_size: output side length S.
        normalize: apply /255 + ImageNet mean/std.
    Returns:
        (S, S, 3) float32.
    """
    H, W, _ = image.shape
    img = image.astype(jnp.float32)

    x1, y1, x2, y2 = clip_bbox[0], clip_bbox[1], clip_bbox[2], clip_bbox[3]
    sx = _axis_samples(out_size, x1, x2)
    sy = _axis_samples(out_size, y1, y2)

    ix, mx, wx = _gather_taps_1d(sx, x1, x2, W)  # (S,4) each
    iy, my, wy = _gather_taps_1d(sy, y1, y2, H)

    # Horizontal pass: (H, W, 3) -> (H, S, 3)
    gathered = img[:, ix.reshape(-1), :].reshape(H, out_size, 4, 3)
    wxm = (wx * mx)[None, :, :, None]
    horiz = jnp.sum(gathered * wxm, axis=2)

    # Vertical pass: (H, S, 3) -> (S, S, 3)
    gathered_v = horiz[iy.reshape(-1), :, :].reshape(out_size, 4, out_size, 3)
    wym = (wy * my)[:, :, None, None]
    out = jnp.sum(gathered_v * wym, axis=1)

    if normalize:
        out = (out / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return out


crop_resize_cubic_batch = jax.jit(
    jax.vmap(crop_resize_cubic, in_axes=(0, 0, None, None)),
    static_argnums=(2, 3),
)


@partial(jax.jit, static_argnames=("out_size", "normalize"))
def affine_warp_bilinear(image, matrix, out_size=256, normalize=True):
    """Inverse-affine bilinear warp: out[y, x] = img(M @ [x, y, 1]).

    Args:
        image: (H, W, 3) source.
        matrix: (2, 3) output->source affine (pixel coords).
    Outside-image samples are zero.
    """
    H, W, _ = image.shape
    img = image.astype(jnp.float32)

    d = jnp.arange(out_size, dtype=jnp.float32)
    dx, dy = jnp.meshgrid(d, d, indexing="xy")  # (S, S)
    sx = matrix[0, 0] * dx + matrix[0, 1] * dy + matrix[0, 2]
    sy = matrix[1, 0] * dx + matrix[1, 1] * dy + matrix[1, 2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    tx = sx - x0
    ty = sy - y0

    def sample(xi, yi):
        inside = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = img.reshape(H * W, 3)
        v = flat[(yc * W + xc).reshape(-1), :].reshape(out_size, out_size, 3)
        return v * inside[..., None].astype(jnp.float32)

    v00 = sample(x0, y0)
    v01 = sample(x0 + 1, y0)
    v10 = sample(x0, y0 + 1)
    v11 = sample(x0 + 1, y0 + 1)
    w00 = ((1 - tx) * (1 - ty))[..., None]
    w01 = (tx * (1 - ty))[..., None]
    w10 = ((1 - tx) * ty)[..., None]
    w11 = (tx * ty)[..., None]
    out = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11

    if normalize:
        out = (out / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return out


@partial(jax.jit, static_argnames=("out_size", "normalize"))
def affine_warp_cubic(image, matrix, out_size=256, normalize=False):
    """Inverse-affine bicubic warp: out[y, x] = img(M @ [x, y, 1]).

    cv2.warpAffine(INTER_CUBIC, BORDER_CONSTANT=0) semantics: Catmull-Rom
    a = -0.75 kernel, separable 4x4 taps, outside-image taps read zero.
    Train-time counterpart of the reference's cubic interpolations
    (R1/datasets/speed.py:306-313: Rotate/Resize with INTER_CUBIC) — the
    eval path (crop_resize_cubic) was already cubic-exact; this closes the
    train-path interpolation gap flagged in round 1.
    """
    H, W, _ = image.shape
    img = image.astype(jnp.float32)

    d = jnp.arange(out_size, dtype=jnp.float32)
    dx, dy = jnp.meshgrid(d, d, indexing="xy")  # (S, S)
    sx = matrix[0, 0] * dx + matrix[0, 1] * dy + matrix[0, 2]
    sy = matrix[1, 0] * dx + matrix[1, 1] * dy + matrix[1, 2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = _cubic_weights(sx - x0)  # (S, S, 4)
    wy = _cubic_weights(sy - y0)

    flat = img.reshape(H * W, 3)
    out = jnp.zeros((out_size, out_size, 3), jnp.float32)
    for j in range(4):  # y taps
        yi = y0 + (j - 1.0)
        in_y = (yi >= 0) & (yi <= H - 1)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        row = jnp.zeros((out_size, out_size, 3), jnp.float32)
        for i in range(4):  # x taps
            xi = x0 + (i - 1.0)
            in_x = (xi >= 0) & (xi <= W - 1)
            xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
            v = flat[(yc * W + xc).reshape(-1), :].reshape(
                out_size, out_size, 3
            )
            v = v * (in_x & in_y)[..., None].astype(jnp.float32)
            row = row + v * wx[..., i, None]
        out = out + row * wy[..., j, None]

    if normalize:
        out = (out / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return out


def _shear_rows(arr, shift, out_len, lo, hi, cubic=False):
    """Per-row fractional horizontal shift: out[r, w] = arr[r, w + shift[r]].

    The resample splits into (a) a static-offset tap blend (the fractional
    part is constant per row, so the 2- or 4-tap interpolation is a weighted
    sum of statically shifted copies — pure VPU elementwise work) and (b) an
    integer per-row shift realised by BINARY DECOMPOSITION: log2(span)
    statically shifted copies gated per row by the shift's bits. No gathers
    and no per-row dynamic slices anywhere — measured 31 ms vs 158 ms
    (direct 2-D gather) / 131 ms (vmapped dynamic_slice, which XLA lowers
    to a scalar gather) for a 51-image 256^2 rotation subset on v5e.

    Args:
        arr: (R, Win) source rows (one channel; vmap over channels/images).
        shift: (R,) float source offset per row.
        out_len: output width.
        lo, hi: static bounds with lo <= floor(shift) <= hi (worst case).
        cubic: 4-tap Catmull-Rom taps instead of bilinear.
    Returns:
        (R, out_len); taps outside [0, Win) read zero (BORDER_CONSTANT).
    """
    R, Win = arr.shape
    m = jnp.floor(shift)
    t = shift - m
    mi = jnp.clip(m.astype(jnp.int32), lo, hi)

    if cubic:
        w = _cubic_weights(t)  # (R, 4) for offsets (-1, 0, 1, 2)
        padded = jnp.pad(arr, ((0, 0), (1, 2)))
        blend = sum(
            w[:, j, None] * padded[:, j : j + Win] for j in range(4)
        )
    else:
        padded = jnp.pad(arr, ((0, 0), (0, 1)))
        blend = (1.0 - t)[:, None] * padded[:, :Win] + t[:, None] * padded[
            :, 1 : Win + 1
        ]

    pad_left = -lo
    pad_right = max(0, hi + out_len - Win)
    cur = jnp.pad(blend, ((0, 0), (pad_left, pad_right)))
    starts = mi + pad_left  # in [0, span]
    span = hi - lo
    k = 0
    while (1 << k) <= span:
        sh = 1 << k
        shifted = jnp.pad(cur[:, sh:], ((0, 0), (0, sh)))
        bit = ((starts >> k) & 1).astype(bool)
        cur = jnp.where(bit[:, None], shifted, cur)
        k += 1
    return cur[:, :out_len]


def rotate_shear3(image, theta, cubic=False):
    """Rotate (S, S, C) about its center (S-1)/2 by ``theta`` (radians,
    same direction as the keypoint map kp' = R(theta)(kp - c) + c) using
    the Paeth 3-shear decomposition R(t) = Shx(a) Shy(b) Shx(a) with
    a = -tan(t/2), b = sin(t).

    TPU rationale: a direct inverse-affine rotation is a 2-D gather, which
    bypasses both MXU and the vector memory path (158 ms for a 51-image
    subset at 256^2 on v5e). Each shear here is a per-row constant
    fractional shift — a static tap blend plus a binary-decomposed integer
    shift — so the whole rotation is elementwise math + statically shifted
    copies (31 ms for the same subset, 5x). Channels ride a leading vmap
    axis so the lane dimension is the image width, not C=3. The
    intermediate canvas is widened to 2S so no content that lands in the
    output window is ever clipped; border semantics match
    cv2.warpAffine(..., borderValue=0) (reference train-time Rotate,
    R1/datasets/speed.py:306-313). Interpolation is three 1-D passes
    instead of one 2-D kernel — behaviorally equivalent augmentation,
    slightly different smoothing (|theta| must be <= pi/2, as in the
    reference's Rotate(limit=90)).
    """
    S = image.shape[0]
    img = image.astype(jnp.float32).transpose(2, 0, 1)  # (C, S, S)
    c = (S - 1.0) / 2.0
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    pad = (S + 1) // 2
    Wp = S + 2 * pad
    y = jnp.arange(S, dtype=jnp.float32)

    # shear 1 (x): src x0 = w - pad - a(y - c), widths S -> Wp
    s1 = -pad - a * (y - c)
    out1 = jax.vmap(
        lambda ch: _shear_rows(ch, s1, Wp, lo=-S - 1, hi=0, cubic=cubic)
    )(img)

    # shear 2 (y): per-column shift on the transposed canvas
    xp = jnp.arange(Wp, dtype=jnp.float32)
    s2 = -b * (xp - (c + pad))
    out2 = jax.vmap(
        lambda ch: _shear_rows(
            ch.T, s2, S, lo=-S - 1, hi=S + 1, cubic=cubic
        ).T
    )(out1)

    # shear 3 (x): src x1p = w + pad - a(y - c), widths Wp -> S
    s3 = pad - a * (y - c)
    out3 = jax.vmap(
        lambda ch: _shear_rows(ch, s3, S, lo=-1, hi=S + 1, cubic=cubic)
    )(out2)
    return out3.transpose(1, 2, 0)


def _shear_rows_bmm(im, shifts, out_w, cubic):
    """Per-row fractional shift as ONE batched matmul:
    out[r, x, c] = sum_w K((x + shifts[r]) - w) * im[r, w, c], K the
    bilinear tent or cv2 INTER_CUBIC Keys kernel (a = -0.75). Taps outside
    [0, Win) contribute zero individually — exact cv2 BORDER_CONSTANT
    semantics (where _shear_rows zeroes a whole sample once its BASE tap
    leaves range, clipping one boundary column)."""
    in_w = im.shape[1]
    grid_w = jnp.arange(in_w, dtype=jnp.float32)
    x = jnp.arange(out_w, dtype=jnp.float32)
    src = x[None, :] + shifts[:, None]  # (R, out_w)
    d = src[:, :, None] - grid_w[None, None, :]  # (R, out_w, in_w)
    if cubic:
        ad = jnp.abs(d)
        a = -0.75
        w = jnp.where(
            ad <= 1.0,
            (a + 2.0) * ad**3 - (a + 3.0) * ad**2 + 1.0,
            jnp.where(ad < 2.0,
                      a * ad**3 - 5.0 * a * ad**2 + 8.0 * a * ad - 4.0 * a,
                      0.0),
        )
    else:
        w = jnp.clip(1.0 - jnp.abs(d), 0.0, 1.0)
    return jnp.einsum("rxw,rwc->rxc", w, im,
                      preferred_element_type=jnp.float32)


def rotate_shear3_bmm(image, theta, cubic=False):
    """Paeth 3-shear rotation with each shear as a per-row-matrix batched
    MATMUL — same widened-canvas sampling semantics as rotate_shear3, but
    the MXU does the resampling instead of the binary-shift select chain:
    measured 11.8 ms vs 24.8 ms for the 51-image train-augment subset
    @224 on v5e (tools_dev/rotate_bmm_ab.py). Pixel-identical to
    rotate_shear3 away from content edges; at edges it is MORE faithful
    to cv2.warpAffine BORDER_CONSTANT (partial-tap samples keep their
    in-range taps; see _shear_rows_bmm). Same |theta| <= pi/2 domain."""
    S = image.shape[0]
    img = image.astype(jnp.float32)
    c = (S - 1.0) / 2.0
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    pad = (S + 1) // 2
    Wp = S + 2 * pad
    y = jnp.arange(S, dtype=jnp.float32)

    s1 = -pad - a * (y - c)
    out1 = _shear_rows_bmm(img, s1, Wp, cubic)  # (S, Wp, C)

    xp = jnp.arange(Wp, dtype=jnp.float32)
    s2 = -b * (xp - (c + pad))
    out2 = _shear_rows_bmm(
        out1.transpose(1, 0, 2), s2, S, cubic
    ).transpose(1, 0, 2)  # (S, Wp, C)

    s3 = pad - a * (y - c)
    return _shear_rows_bmm(out2, s3, S, cubic)  # (S, S, C)


def _dft_mats(P):
    """Real (cos, sin) DFT matrices of size P (constants, folded by XLA)."""
    k = np.arange(P)
    ang = 2.0 * np.pi * np.outer(k, k) / P
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def _shift_rows_fft(rows, m, P, precision):
    """EXACT per-row integer circular shift via DFT phase multiply:
    out[r, x] = rows[r, (x + m_r) mod P]. Four (R, P) @ (P, P) real
    matmuls — full-lane MXU work regardless of channel count (the
    per-row-matrix bmm form is N=3-bound). Integer shifts are exact
    under the DFT (no sinc ringing); callers zero-pad the canvas so the
    circular wrap only ever reads zeros."""
    C, S = _dft_mats(P)
    mm = lambda a, b: jnp.matmul(a, b, precision=precision)
    xre = mm(rows, C)
    xim = -mm(rows, S)
    k = jnp.arange(P, dtype=jnp.float32)
    theta = (2.0 * np.pi / P) * m[:, None] * k[None, :]
    pc, ps = jnp.cos(theta), jnp.sin(theta)
    yre = xre * pc - xim * ps
    yim = xre * ps + xim * pc
    return (mm(yre, C) - mm(yim, S)) / P


def _shear_rows_fft(arr, shift, out_len, P, cubic, precision):
    """_shear_rows semantics (out[r, w] = arr[r, w + shift[r]], constant-0
    border) as static-tap blend + DFT integer shift. ``arr`` (R, Win) is
    zero-embedded into a (R, P) canvas with P >= Win + max|shift| so the
    circular wrap reads zeros only."""
    R, Win = arr.shape
    m = jnp.floor(shift)
    t = (shift - m).astype(jnp.float32)
    canvas = jnp.pad(arr, ((0, 0), (0, P - Win)))
    if cubic:
        w = _cubic_weights(t)  # (R, 4) taps at floor offsets (-1, 0, 1, 2)
        rolled = [jnp.roll(canvas, -(j - 1), axis=1) for j in range(4)]
        blend = sum(w[:, j, None] * rolled[j] for j in range(4))
    else:
        blend = (1.0 - t)[:, None] * canvas + t[:, None] * jnp.roll(
            canvas, -1, axis=1)
    out = _shift_rows_fft(blend, m.astype(jnp.float32), P, precision)
    return out[:, :out_len]


def rotate_shear3_fft(image, theta, cubic=False,
                      precision=jax.lax.Precision.HIGHEST):
    """Paeth 3-shear rotation with each shear's per-row integer shift done
    as a DFT phase multiply — all heavy work is full-lane (P=2S) matmuls
    against shared DFT constants, sidestepping the bmm form's N=3 lane
    cap. Same widened-canvas sampling semantics as rotate_shear3/..._bmm
    (taps outside read zero; |theta| <= pi/2). Interpolation is exact
    bilinear/cubic: fractional taps blend BEFORE the shift, and integer
    circular shifts are exact under the DFT, so the only deviation is
    matmul rounding (HIGHEST-precision f32 passes keep it ~1e-2 pixel on
    a 0..255 image). Measured: see PERF.md round-4 (tools_dev/
    rotate_bmm_ab.py --fft)."""
    Simg = image.shape[0]
    C3 = image.shape[2]
    img = image.astype(jnp.float32)
    c = (Simg - 1.0) / 2.0
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    pad = (Simg + 1) // 2
    Wp = Simg + 2 * pad
    P = Wp  # 2S(+1 parity): covers Win + max|shift| for every shear
    y = jnp.arange(Simg, dtype=jnp.float32)

    def fold(x):  # (R, W, C) -> (C*R, W): channels ride the matmul batch
        return x.transpose(2, 0, 1).reshape(-1, x.shape[1])

    def unfold(x, R):  # (C*R, W) -> (R, W, C)
        return x.reshape(C3, R, -1).transpose(1, 2, 0)

    # shear 1 (x): rows S, widths S -> Wp
    s1 = -pad - a * (y - c)
    out1 = unfold(
        _shear_rows_fft(fold(img), jnp.tile(s1, C3), Wp, P, cubic,
                        precision), Simg)  # (S, Wp, C)

    # shear 2 (y): per-column shift; columns padded S -> P
    xp = jnp.arange(Wp, dtype=jnp.float32)
    s2 = -b * (xp - (c + pad))
    out2 = unfold(
        _shear_rows_fft(fold(out1.transpose(1, 0, 2)), jnp.tile(s2, C3),
                        Simg, P, cubic, precision), Wp
    ).transpose(1, 0, 2)  # (S, Wp, C)

    # shear 3 (x): widths Wp -> S
    s3 = pad - a * (y - c)
    return unfold(
        _shear_rows_fft(fold(out2), jnp.tile(s3, C3), Simg, P, cubic,
                        precision), Simg)  # (S, S, C)


def _axis_weight_matrix(out_size, c0, c1, extent):
    """Dense (out_size, extent) cubic interpolation matrix for one axis.

    Row i holds the 4 Catmull-Rom tap weights of output sample i. Built
    with comparisons against an iota instead of scatters, so it is cheap
    and fully vectorised; the resample then becomes a matmul that runs on
    the MXU instead of 4 serial gathers (the TPU-native formulation).
    """
    coords = _axis_samples(out_size, c0, c1)
    idx, inside, w = _gather_taps_1d(coords, c0, c1, extent)  # (S,4) each
    wm = w * inside  # (S, 4)
    cols = jnp.arange(extent)[None, None, :]  # (1, 1, E)
    onehot = (idx[:, :, None] == cols).astype(jnp.float32)  # (S, 4, E)
    return jnp.einsum("st,ste->se", wm, onehot)  # (S, E)


@partial(jax.jit, static_argnames=("out_size", "normalize"))
def crop_resize_cubic_mxu(image, clip_bbox, out_size=256, normalize=True):
    """MXU formulation of crop_resize_cubic: OUT = Wy @ IMG @ Wx^T per
    channel. Bit-compatible with the gather version (same taps/weights);
    ~10x faster on TPU because both passes are dense matmuls.
    """
    H, W, _ = image.shape
    img = image.astype(jnp.float32)
    x1, y1, x2, y2 = clip_bbox[0], clip_bbox[1], clip_bbox[2], clip_bbox[3]

    Wx = _axis_weight_matrix(out_size, x1, x2, W)  # (S, W)
    Wy = _axis_weight_matrix(out_size, y1, y2, H)  # (S, H)

    with jax.default_matmul_precision("highest"):
        horiz = jnp.einsum("sw,hwc->hsc", Wx, img)  # (H, S, 3)
        out = jnp.einsum("sh,htc->stc", Wy, horiz)  # (S, S, 3)

    if normalize:
        out = (out / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return out


crop_resize_cubic_mxu_batch = jax.jit(
    jax.vmap(crop_resize_cubic_mxu, in_axes=(0, 0, None, None)),
    static_argnums=(2, 3),
)


def _align_corners_matrix(n_in: int, n_out: int):
    """Dense (n_out, n_in) linear-interpolation matrix with torch's
    align_corners=True coordinate mapping: out i samples in coordinate
    i*(n_in-1)/(n_out-1). Built in numpy at trace time (static sizes)."""
    import numpy as np

    if n_in == 1 or n_out == 1:
        return jnp.full((n_out, n_in), 1.0 / n_in, jnp.float32)
    pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.minimum(np.floor(pos).astype(np.int64), n_in - 2)
    frac = (pos - lo).astype(np.float32)
    mat = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    mat[rows, lo] = 1.0 - frac
    mat[rows, lo + 1] += frac
    return jnp.asarray(mat)


def _halfpixel_matrix(n_in: int, n_out: int):
    """Dense (n_out, n_in) linear-interpolation matrix with half-pixel
    centers and NO antialiasing — torch F.interpolate(mode='bilinear',
    align_corners=False, antialias=False) semantics. jax.image.resize
    antialiases when downscaling and is NOT equivalent."""
    import numpy as np

    pos = (np.arange(n_out) + 0.5) * n_in / n_out - 0.5
    pos = np.clip(pos, 0.0, n_in - 1)
    lo = np.minimum(np.floor(pos).astype(np.int64), max(n_in - 2, 0))
    frac = (pos - lo).astype(np.float32)
    mat = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    mat[rows, lo] = 1.0 - frac
    mat[rows, np.minimum(lo + 1, n_in - 1)] += frac
    return jnp.asarray(mat)


def _halfpixel_cubic_matrix(n_in: int, n_out: int):
    """Dense (n_out, n_in) bicubic interpolation matrix (a = -0.75) with
    half-pixel centers, edge-clamped taps, and NO antialiasing — torch
    F.interpolate(mode='bicubic', align_corners=False) semantics."""
    import numpy as np

    a = -0.75

    def k(s):  # pure-numpy twin of _cubic_weights' kernel (trace-safe)
        s = np.abs(s)
        w1 = ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0
        w2 = ((a * s - 5.0 * a) * s + 8.0 * a) * s - 4.0 * a
        return np.where(s <= 1.0, w1, np.where(s < 2.0, w2, 0.0))

    pos = (np.arange(n_out) + 0.5) * n_in / n_out - 0.5
    base = np.floor(pos).astype(np.int64)
    frac = pos - base
    w = np.stack([k(frac + 1.0), k(frac), k(1.0 - frac), k(2.0 - frac)], -1)
    mat = np.zeros((n_out, n_in), np.float32)
    for tap in range(4):
        idx = np.clip(base - 1 + tap, 0, n_in - 1)
        np.add.at(mat, (np.arange(n_out), idx), w[:, tap].astype(np.float32))
    return jnp.asarray(mat)


def resize_bicubic_torch(x, out_h: int, out_w: int):
    """torch F.interpolate(..., mode='bicubic', align_corners=False)
    equivalence (no antialias) as two dense per-axis matmuls — the
    reference's PAN 0.5x downsample (R2 hybrid_encoder.py:394).
    jax.image.resize('cubic') antialiases on downscale and diverges."""
    b, h, w, c = x.shape
    my = _halfpixel_cubic_matrix(h, out_h).astype(x.dtype)
    mx = _halfpixel_cubic_matrix(w, out_w).astype(x.dtype)
    y = jnp.einsum("ph,bhwc->bpwc", my, x)
    return jnp.einsum("qw,bpwc->bpqc", mx, y)


def resize_bilinear_torch(x, out_h: int, out_w: int):
    """torch F.interpolate(..., mode='bilinear', align_corners=False)
    equivalence (no antialias), as two dense per-axis matmuls. Used where
    the reference interpolates feature maps (e.g. the custom MobileNetV3
    branch resize, R2/nn/backbone/mobilenetv3.py:219)."""
    b, h, w, c = x.shape
    my = _halfpixel_matrix(h, out_h).astype(x.dtype)
    mx = _halfpixel_matrix(w, out_w).astype(x.dtype)
    y = jnp.einsum("ph,bhwc->bpwc", my, x)
    return jnp.einsum("qw,bpwc->bpqc", mx, y)


def upsample_bilinear_align_corners(x, scale: int = 2):
    """torch nn.UpsamplingBilinear2d(scale) equivalence — bilinear with
    align_corners=True (R1/models/backbone.py:127 up16sto8s), formulated as
    two dense per-axis matmuls so the resample rides the MXU rather than a
    gather. ``jax.image.resize('bilinear')`` uses half-pixel centers and is
    NOT equivalent. x: (B, H, W, C) -> (B, H*scale, W*scale, C)."""
    b, h, w, c = x.shape
    my = _align_corners_matrix(h, h * scale).astype(x.dtype)
    mx = _align_corners_matrix(w, w * scale).astype(x.dtype)
    y = jnp.einsum("ph,bhwc->bpwc", my, x)
    return jnp.einsum("qw,bpwc->bpqc", mx, y)
