"""End-to-end TRAINING A/B: the live torch reference recipe vs ours.

VERDICT round-2 item 1(b): the 50-step lockstep test
(tests/test_training_dynamics_parity.py) proves step-for-step dynamics
parity in f64; this tool runs the composite capability claim at recipe
scale — a real multi-epoch training run per arm, from ONE shared
converted init, over IDENTICAL aug-off crop tensors in IDENTICAL batch
orders, scored after every epoch through the SAME parity-tested eval
tail (postprocess -> sigma-PnP -> speed_score). The comparison is the
best val SPEED score per arm: does our framework LEARN the task as well
as the reference's training loop does?

Reference recipe mirrored on the torch arm exactly as shipped:
R2/solver/speed_engine.py:58-111 (sum of weighted losses, zero_grad,
backward, clip_grad_norm_, step) with the shipped criterion
(R2/src/zoo/rtdetr/rtdetr_criterion.py losses=[labels, points_uncert])
on the small selfcheck architecture (r18 / hidden 64 — the same modules
the lockstep test builds). Augmentation is off in BOTH arms (identical
inputs; the aug family itself is A/B'd separately, PERF.md), dropout 0,
EMA off (EMA math is lockstep-proven) — so any score gap is the
framework, not the noise sources.

Run on CPU (the torch reference is CPU-only in this environment):

    python tools_dev/e2e_train_ab.py --root /tmp/synth_r3 \
        --n_train 400 --n_val 100 --epochs 20 --batch 16

``--aug on`` (round 4): each arm trains with ITS OWN augmentation family
— ours the device-side family (data/augment.py), the torch arm the
reference albumentations pipeline (R1/datasets/speed.py:306-334)
reimplemented faithfully in cv2 (reference_aug_numpy; albumentations is
not installable here). Same init/data/batch orders; this closes the last
recipe component never compared under training (VERDICT r4 item 4).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

HIDDEN = 64
NHEAD = 4
QUERIES = 30
DEC_LAYERS = 3
SIZE = 128
C = 11
LR = 3e-4
WD = 1e-4
BETAS = (0.9, 0.999)
CLIP = 0.1


def load_split(root, index_file, n, train):
    from satellite_pose_estimation_tpu.data.dataset import SpeedTrainDataset

    ds = SpeedTrainDataset(root, index_file=index_file, resize=SIZE,
                           train=train)
    n = min(n, len(ds))
    samples = [ds[i] for i in range(n)]
    return samples


def precompute_train(samples):
    """Aug-off production path: the full augment_batch with every
    probability zeroed — returns ImageNet-normalized crops + the exact
    normalized keypoints the train step would see."""
    from satellite_pose_estimation_tpu.data.augment import (
        AugmentConfig,
        augment_batch,
    )

    cfg = AugmentConfig(out_size=SIZE, interp="cubic", p_hflip=0.0,
                        p_rotate=0.0, p_affine=0.0, p_blur=0.0,
                        p_blur_family=0.0, p_noise=0.0, p_jpeg=0.0,
                        p_iso=0.0, p_cutout=0.0, p_trunc=0.0)
    fn = jax.jit(lambda im, bb, lm: augment_batch(
        jax.random.PRNGKey(0), im, bb, lm, cfg))
    crops, kps = [], []
    for i in range(0, len(samples), 32):
        chunk = samples[i:i + 32]
        im = jnp.asarray(np.stack([s["image"] for s in chunk]))
        bb = jnp.asarray(np.stack([s["clip_bbox_buf"] for s in chunk]))
        lm = jnp.asarray(np.stack([s["landmarks_buf"] for s in chunk]))
        c, k = fn(im, bb, lm)
        crops.append(np.asarray(c, np.float32))
        kps.append(np.asarray(k, np.float32))
    labels = np.stack([s["labels"] for s in samples])
    return np.concatenate(crops), np.concatenate(kps), labels


def precompute_val(samples):
    from satellite_pose_estimation_tpu.ops.image_warp import crop_resize_cubic

    fn = jax.jit(jax.vmap(
        lambda im, bb: crop_resize_cubic(im, bb, SIZE, True)))
    crops = []
    for i in range(0, len(samples), 32):
        chunk = samples[i:i + 32]
        im = jnp.asarray(np.stack([s["image"] for s in chunk]))
        bb = jnp.asarray(np.stack([s["clip_bbox_buf"] for s in chunk]))
        crops.append(np.asarray(fn(im, bb), np.float32))
    return {
        "crops": np.concatenate(crops),
        "clip": np.stack([s["clip_bbox"] for s in samples]),
        "quat_gt": np.stack([s["quat_gt"] for s in samples]),
        "tvec_gt": np.stack([s["tvec_gt"] for s in samples]),
    }


def reference_aug_numpy(img, kps, rng, img_size):
    """cv2/numpy reimplementation of the reference's exact albumentations
    train pipeline (R1/datasets/speed.py:306-334) for the aug-ON torch
    arm — albumentations itself is not installed here. Faithful op list,
    order, probabilities, and parameter ranges:

      HFlip .5 | IAAAffine .1 (DEFAULT params = identity transform — a
      quirk of the shipped code; imgaug Affine(scale=1, rotate=0, shear=0))
      | Rotate .4 (+-90, INTER_CUBIC, constant border) | Resize cubic |
      Blur .3 (limit 3 -> ksize always 3) |
      OneOf[MotionBlur .2, MedianBlur .1, Blur .1] .2 (weights .5/.25/.25) |
      IAAAdditiveGaussianNoise .2 (sigma U(0, .05*255), per_channel=False:
      ONE noise map over all channels, the imgaug default) |
      JpegCompression(20, 99) .1 | ISONoise .2 (the albumentations 0.4.x
      iso_noise algorithm verbatim: HLS space, Poisson luminance noise
      scaled by the L-channel std, Gaussian hue rotation) |
      Cutout(10 holes, 40x40, zero fill, centers uniform, clipped) .1.

    Round-5 faithfulness audit (VERDICT r4 item 4): MotionBlur now draws
    albumentations' random-chord kernel (cv2.line between two random
    in-kernel points) instead of a center-symmetric line, the additive
    Gaussian noise is single-map (was per-channel), and ISONoise runs the
    exact HLS algorithm (was a luminance-shot approximation). Remaining
    known deltas vs the real albumentations stack: none by construction
    for the geometric ops (same cv2 calls); stochastic streams obviously
    differ (numpy RandomState vs python random).

    img: HxWx3 uint8 crop; kps: (K, 2) xy in crop pixels. Returns
    (img_size x img_size float32 [0,255], kps in resized pixels)."""
    import cv2

    H, W = img.shape[:2]
    img = img.copy()
    kps = kps.astype(np.float64).copy()

    if rng.rand() < 0.5:  # HorizontalFlip
        img = img[:, ::-1].copy()
        kps[:, 0] = (W - 1) - kps[:, 0]
    # IAAAffine(p=.1) with default params: identity — intentionally no-op.

    if rng.rand() < 0.4:  # Rotate(+-90, cubic, constant)
        ang = rng.uniform(-90, 90)
        c = ((W - 1) * 0.5, (H - 1) * 0.5)
        M = cv2.getRotationMatrix2D(c, ang, 1.0)
        img = cv2.warpAffine(img, M, (W, H), flags=cv2.INTER_CUBIC,
                             borderMode=cv2.BORDER_CONSTANT, borderValue=0)
        ones = np.concatenate([kps, np.ones((len(kps), 1))], 1)
        kps = ones @ M.T

    # Resize (cubic)
    imgf = cv2.resize(img, (img_size, img_size),
                      interpolation=cv2.INTER_CUBIC)
    kps = kps * np.asarray([img_size / W, img_size / H])
    img = np.clip(imgf, 0, 255).astype(np.uint8)

    if rng.rand() < 0.3:  # Blur(limit 3) -> ksize 3
        img = cv2.blur(img, (3, 3))
    if rng.rand() < 0.2:  # OneOf, normalized weights .5/.25/.25
        u = rng.rand()
        if u < 0.5:  # MotionBlur (default limit 7 -> ksize in {3,5,7}):
            # albumentations draws a random CHORD — cv2.line between two
            # random in-kernel points (not a center-symmetric line)
            k = int(rng.choice([3, 5, 7]))
            kern = np.zeros((k, k), np.uint8)
            xs_, xe_ = int(rng.randint(0, k)), int(rng.randint(0, k))
            if xs_ == xe_:
                ys_, ye_ = sorted(
                    int(v) for v in rng.choice(k, 2, replace=False))
            else:
                ys_, ye_ = int(rng.randint(0, k)), int(rng.randint(0, k))
            cv2.line(kern, (xs_, ys_), (xe_, ye_), 1, thickness=1)
            kern = kern.astype(np.float32) / max(kern.sum(), 1)
            img = cv2.filter2D(img, -1, kern)
        elif u < 0.75:
            img = cv2.medianBlur(img, 3)
        else:
            img = cv2.blur(img, (3, 3))
    if rng.rand() < 0.2:  # IAAAdditiveGaussianNoise: sigma U(0, 12.75),
        # per_channel=False (imgaug default): ONE noise map, all channels
        sigma = rng.uniform(0, 0.05 * 255)
        noise = rng.randn(*img.shape[:2])[..., None] * sigma
        img = np.clip(img + noise, 0, 255).astype(np.uint8)
    if rng.rand() < 0.1:  # JpegCompression(20, 99)
        q = int(rng.uniform(20, 99))
        ok, enc = cv2.imencode(
            ".jpg", img, [int(cv2.IMWRITE_JPEG_QUALITY), q])
        img = cv2.imdecode(enc, cv2.IMREAD_COLOR)
    if rng.rand() < 0.2:  # ISONoise(color_shift (.01,.05), intensity (.1,.5))
        # albumentations 0.4.x iso_noise verbatim: HLS space, Poisson
        # luminance noise with lambda = std(L) * intensity * 255 applied
        # as (noise/255)*(1-L), Gaussian hue rotation sigma =
        # color_shift * 360 * intensity (degrees, wrapped)
        intensity = rng.uniform(0.1, 0.5)
        color_shift = rng.uniform(0.01, 0.05)
        x = np.multiply(img, 1.0 / 255.0, dtype=np.float32)
        hls = cv2.cvtColor(x, cv2.COLOR_RGB2HLS)
        std_l = float(hls[..., 1].std())
        lum_noise = rng.poisson(
            max(std_l * intensity * 255.0, 0.0), size=hls.shape[:2])
        col_noise = rng.normal(
            0, color_shift * 360.0 * intensity, size=hls.shape[:2])
        hue = hls[..., 0] + col_noise
        hue[hue < 0] += 360
        hue[hue > 360] -= 360
        hls[..., 0] = hue
        hls[..., 1] += (lum_noise / 255.0) * (1.0 - hls[..., 1])
        x = cv2.cvtColor(hls, cv2.COLOR_HLS2RGB) * 255.0
        img = np.clip(x, 0, 255).astype(np.uint8)
    if rng.rand() < 0.1:  # Cutout(10, 40, 40)
        for _ in range(10):
            cx = rng.randint(0, img_size)
            cy = rng.randint(0, img_size)
            h2, w2 = 20, 20
            img[max(cy - h2, 0):cy + h2, max(cx - w2, 0):cx + w2] = 0
    return img.astype(np.float32), kps


def make_scorer(val):
    """Shared eval tail: raw (logits, points, log-sigmas) -> mean SPEED
    score, exactly the make_eval_step math (train/steps.py:126-210)."""
    from satellite_pose_estimation_tpu.geometry.scoring import (
        speed_score_batch,
    )
    from satellite_pose_estimation_tpu.geometry.solvers import (
        SolverConfig,
        solve_pose_sigma_batch,
    )
    from satellite_pose_estimation_tpu.geometry.camera import WORLD_POINTS

    world = jnp.asarray(WORLD_POINTS, jnp.float32)
    clip = jnp.asarray(val["clip"])
    wh = clip[:, 2:4] - clip[:, 0:2]
    qgt = jnp.asarray(val["quat_gt"])
    tgt = jnp.asarray(val["tvec_gt"])
    cfg = SolverConfig()

    @jax.jit
    def score(logits, points, sigmas):
        probs = jax.nn.softmax(logits, axis=-1)
        pts_pix = points * wh[:, None, :] + clip[:, None, 0:2]
        sig_pix = jnp.exp(sigmas) * (wh[:, None, :] ** 2)
        quat, tvec, _ = solve_pose_sigma_batch(
            world, pts_pix, probs, sig_pix, cfg)
        sc = speed_score_batch(quat, tvec, qgt, tgt)
        return jnp.mean(sc["score"])

    return score


# ---------------------------------------------------------------- torch arm

def build_torch(seed=0):
    from tests._r2_reference import load_r2_modules
    import torch

    PResNet, HybridEncoder, RTDETRTransformer, TorchRTDETR = load_r2_modules()
    torch.manual_seed(seed)
    backbone = PResNet(depth=18, return_idx=[1, 2, 3], pretrained=False,
                       freeze_at=-1, freeze_norm=False)
    encoder = HybridEncoder(in_channels=[128, 256, 512], hidden_dim=HIDDEN,
                            dim_feedforward=128, nhead=NHEAD, expansion=0.5,
                            dropout=0.0)
    decoder = RTDETRTransformer(
        num_classes=C, hidden_dim=HIDDEN, num_queries=QUERIES,
        feat_channels=[HIDDEN] * 3, nhead=NHEAD,
        num_decoder_layers=DEC_LAYERS, dim_feedforward=128, num_denoising=0,
    )
    return TorchRTDETR(backbone=backbone, encoder=encoder, decoder=decoder)


def run_torch(sd, tr, val, orders, scorer, epochs, batch, aug_data=None,
              seed=0):
    """``aug_data``: aug-ON mode (VERDICT r4 item 4) — dict of raw packed
    buffers; each batch re-crops from the buffer and runs the
    reference_aug_numpy albumentations family host-side, exactly like the
    reference dataloader (R1/datasets/speed.py __getitem__ + transforms)."""
    import torch

    from tests._r2_reference import load_r2_modules

    load_r2_modules()
    from src.zoo.rtdetr.matcher import HungarianMatcher
    from src.zoo.rtdetr.rtdetr_criterion import SetCriterion

    MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
    STD = np.asarray([0.229, 0.224, 0.225], np.float32)
    aug_rng = np.random.RandomState(777 + seed)

    def aug_batch_np(idxs):
        xs, kps_n = [], []
        for j in idxs:
            bb = aug_data["clip_bbox_buf"][j]
            x1, y1, x2, y2 = [int(round(v)) for v in bb]
            crop = aug_data["image"][j][y1:y2, x1:x2]
            kp = aug_data["landmarks_buf"][j] - np.asarray(
                [bb[0], bb[1]], np.float64)
            im, kp2 = reference_aug_numpy(crop, kp, aug_rng, SIZE)
            xs.append((im / 255.0 - MEAN) / STD)
            kps_n.append(kp2 / SIZE)
        return (np.stack(xs).astype(np.float32),
                np.stack(kps_n).astype(np.float32))

    model = build_torch()
    model.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in
                           sd.items()})
    # Shipped-recipe matcher: use_focal_loss shared global -> sigmoid class
    # cost (the archived r3 A/B ran BOTH arms with the CE-cost matcher —
    # internally consistent; runs from here on use the shipped flavor).
    matcher = HungarianMatcher(
        {"cost_class": 2.0, "cost_bbox": 5.0, "cost_giou": 2.0},
        use_focal_loss=True)
    criterion = SetCriterion(
        matcher, weight_dict={"loss_ce": 1.0, "loss_bbox": 5.0},
        losses=["labels", "points_uncert"], eos_coef=1e-4, num_classes=C)
    opt = torch.optim.AdamW(model.parameters(), lr=LR, betas=BETAS,
                            weight_decay=WD)

    crops, kps, labels = tr
    vx = torch.from_numpy(val["crops"].transpose(0, 3, 1, 2))
    scores, losses = [], []
    for ep in range(epochs):
        model.train(); criterion.train()
        ep_loss = []
        for idxs in orders[ep]:
            if aug_data is not None:
                x_np, kp_np = aug_batch_np(idxs)
                x = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
                targets = [
                    {"labels": torch.from_numpy(
                        labels[j].astype(np.int64)),
                     "landmarks": torch.from_numpy(kp_np[i])}
                    for i, j in enumerate(idxs)
                ]
            else:
                x = torch.from_numpy(crops[idxs].transpose(0, 3, 1, 2))
                targets = [
                    {"labels": torch.from_numpy(labels[j].astype(np.int64)),
                     "landmarks": torch.from_numpy(kps[j].astype(np.float32))}
                    for j in idxs
                ]
            outputs = model(x, targets)
            loss_dict = criterion(outputs, targets)
            loss_dict.pop("class_error", None)
            loss = sum(loss_dict.values())
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
            opt.step()
            ep_loss.append(float(loss.detach()))
        model.eval()
        with torch.no_grad():
            outs = [model(vx[i:i + 32]) for i in range(0, len(vx), 32)]
        logits = np.concatenate([o["pred_logits"].numpy() for o in outs])
        points = np.concatenate([o["pred_pts"].numpy() for o in outs])
        sigmas = np.concatenate([o["pred_sigmas"].numpy() for o in outs])
        s = float(scorer(jnp.asarray(logits), jnp.asarray(points),
                         jnp.asarray(sigmas)))
        scores.append(s)
        losses.append(float(np.mean(ep_loss)))
        print(f"[torch] epoch {ep + 1}/{epochs} loss {losses[-1]:.4f} "
              f"val score {s:.4f}", flush=True)
    return scores, losses


# ----------------------------------------------------------------- our arm

def run_ours(sd, tr, val, orders, scorer, epochs, batch, aug_data=None,
             seed=0):
    """``aug_data``: aug-ON mode — feed raw packed buffers and let the
    production train step run its own device-side augment family
    (data/augment.py), the shipped training path."""
    from satellite_pose_estimation_tpu.losses.criterion import CriterionConfig
    from satellite_pose_estimation_tpu.models.rtdetr import (
        RTDETR,
        RTDETRConfig,
    )
    from satellite_pose_estimation_tpu.train import steps as steps_module
    from satellite_pose_estimation_tpu.train.optim import build_optimizer
    from satellite_pose_estimation_tpu.train.state import (
        TrainConfig,
        TrainState,
        frozen_param_prefixes,
    )
    from satellite_pose_estimation_tpu.utils.checkpoint_convert import (
        convert_r2_rtdetr,
    )

    params, stats = convert_r2_rtdetr(sd, nhead=NHEAD)
    cfg = RTDETRConfig(depth=18, hidden_dim=HIDDEN, num_queries=QUERIES,
                       num_decoder_layers=DEC_LAYERS, dim_feedforward=128,
                       nhead=NHEAD, expansion=0.5, freeze_norm=False,
                       num_classes=C, dtype=jnp.float32)
    model = RTDETR(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, SIZE, SIZE, 3), jnp.float32),
                           train=False)
    frozen = frozen_param_prefixes(variables)
    tx = build_optimizer(
        {"type": "AdamW", "lr": LR, "betas": list(BETAS),
         "weight_decay": WD},
        params, steps_per_epoch=len(orders[0]),
        sched_cfg={"type": "MultiStepLR", "milestones": [100000]},
        clip_max_norm=CLIP, frozen_prefixes=frozen)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, batch_stats=stats,
        opt_state=tx.init(params), ema_params=None, ema_batch_stats=None,
        tx=tx, apply_fn=model.apply)

    # aug-off: identical inputs — the batch carries the precomputed crop +
    # normalized keypoints and the augment hook passes them through
    # untouched. aug-on: raw buffers through the real device augment.
    orig = steps_module.augment_batch
    if aug_data is None:
        steps_module.augment_batch = lambda rng, img, bb, lm, cfg: (img, lm)
    try:
        crit_cfg = CriterionConfig(
            num_classes=C, eos_coef=1e-4, cost_class=2.0, cost_pts=5.0,
            point_loss="uncert", weight_ce=1.0, weight_points=5.0,
            use_focal=True)
        from satellite_pose_estimation_tpu.data.augment import AugmentConfig

        train_step = steps_module.make_train_step(
            crit_cfg, TrainConfig(use_ema=False),
            AugmentConfig(out_size=SIZE, interp="cubic"))

        crops, kps, labels = tr
        zeros_bb = np.zeros((batch, 4), np.float32)

        @jax.jit
        def fwd_eval(st, x):
            variables = {"params": st.params}
            if st.batch_stats:
                variables["batch_stats"] = st.batch_stats
            out = st.apply_fn(variables, x, train=False)
            return (out["pred_logits"], out["pred_points"],
                    out["pred_sigmas"])

        rng = jax.random.PRNGKey(42 + seed)
        vx = jnp.asarray(val["crops"])
        scores, losses = [], []
        for ep in range(epochs):
            ep_loss = []
            for idxs in orders[ep]:
                if aug_data is not None:
                    dev_batch = {
                        "image": jnp.asarray(aug_data["image"][idxs]),
                        "clip_bbox_buf": jnp.asarray(
                            aug_data["clip_bbox_buf"][idxs]),
                        "landmarks_buf": jnp.asarray(
                            aug_data["landmarks_buf"][idxs]),
                        "labels": jnp.asarray(labels[idxs]),
                    }
                else:
                    dev_batch = {
                        "image": jnp.asarray(crops[idxs]),
                        "clip_bbox_buf": jnp.asarray(zeros_bb[:len(idxs)]),
                        "landmarks_buf": jnp.asarray(kps[idxs]),
                        "labels": jnp.asarray(labels[idxs]),
                    }
                rng, k = jax.random.split(rng)
                state, loss_dict = train_step(state, dev_batch, k)
                ep_loss.append(float(loss_dict["loss_total"]))
            outs = [fwd_eval(state, vx[i:i + 32])
                    for i in range(0, len(vx), 32)]
            logits = jnp.concatenate([o[0] for o in outs])
            points = jnp.concatenate([o[1] for o in outs])
            sigmas = jnp.concatenate([o[2] for o in outs])
            s = float(scorer(logits, points, sigmas))
            scores.append(s)
            losses.append(float(np.mean(ep_loss)))
            print(f"[ours ] epoch {ep + 1}/{epochs} loss {losses[-1]:.4f} "
                  f"val score {s:.4f}", flush=True)
    finally:
        steps_module.augment_batch = orig
    return scores, losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_r3")
    ap.add_argument("--n_train", type=int, default=400)
    ap.add_argument("--n_val", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--arm", choices=("both", "torch", "ours"),
                    default="both")
    ap.add_argument("--aug", choices=("off", "on"), default="off",
                    help="on = each arm runs ITS OWN augmentation family "
                    "(ours device-side vs the reference albumentations "
                    "pipeline reimplemented in cv2) — VERDICT r4 item 4")
    ap.add_argument("--out", default="/tmp/e2e_ab.json")
    ap.add_argument("--seed", type=int, default=0,
                    help="varies shared init, batch orders, and both arms' "
                    "aug/train RNG streams together (VERDICT r4 item 4: "
                    ">=3 seeds); 0 reproduces the round-4 run exactly")
    args = ap.parse_args()

    t0 = time.time()
    tr_samples = load_split(args.root, "train_s.txt", args.n_train, True)
    val_samples = load_split(args.root, "val_s.txt", args.n_val, False)
    tr = precompute_train(tr_samples)
    val = precompute_val(val_samples)
    scorer = make_scorer(val)
    aug_data = None
    if args.aug == "on":
        aug_data = {
            "image": np.stack([s["image"] for s in tr_samples]),
            "clip_bbox_buf": np.stack(
                [s["clip_bbox_buf"] for s in tr_samples]),
            "landmarks_buf": np.stack(
                [s["landmarks_buf"] for s in tr_samples]),
        }
    print(f"preprocessed {len(tr_samples)} train / {len(val_samples)} val "
          f"in {time.time() - t0:.0f}s", flush=True)

    # shared init from torch's sampling
    torch_model = build_torch(args.seed)
    sd = {k: v.detach().numpy().copy()
          for k, v in torch_model.state_dict().items()}
    del torch_model

    # shared batch orders: one numpy stream, drop-last like the reference
    order_rng = np.random.RandomState(123 + args.seed)
    n = len(tr_samples)
    orders = []
    for _ in range(args.epochs):
        perm = order_rng.permutation(n)
        steps = [perm[i:i + args.batch]
                 for i in range(0, n - args.batch + 1, args.batch)]
        orders.append(steps)

    result = {"epochs": args.epochs, "batch": args.batch, "aug": args.aug,
              "seed": args.seed,
              "n_train": len(tr_samples), "n_val": len(val_samples)}
    if args.arm in ("both", "ours"):
        t = time.time()
        f_scores, f_losses = run_ours(sd, tr, val, orders, scorer,
                                      args.epochs, args.batch,
                                      aug_data=aug_data, seed=args.seed)
        result["ours"] = {"scores": f_scores, "losses": f_losses,
                          "best": min(f_scores),
                          "wall_s": round(time.time() - t, 1)}
    if args.arm in ("both", "torch"):
        t = time.time()
        t_scores, t_losses = run_torch(sd, tr, val, orders, scorer,
                                       args.epochs, args.batch,
                                       aug_data=aug_data, seed=args.seed)
        result["torch"] = {"scores": t_scores, "losses": t_losses,
                           "best": min(t_scores),
                           "wall_s": round(time.time() - t, 1)}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    if "ours" in result and "torch" in result:
        print(f"BEST val SPEED score — ours {result['ours']['best']:.4f} "
              f"vs torch reference {result['torch']['best']:.4f} "
              f"(untrained anchor 4.1416)")
    print(f"written {args.out}")


if __name__ == "__main__":
    main()
