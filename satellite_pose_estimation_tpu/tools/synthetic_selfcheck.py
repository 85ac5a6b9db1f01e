"""Synthetic end-to-end self-check: train on rendered keypoint markers.

Generates a SPEED-format dataset whose 11 landmarks are visually marked
(distinct colored gaussian blobs at the projected world-point locations
over a textured background), trains the configured model with the real
solver stack, and reports the final SPEED score. A working system drives
the score far below the 1+pi untrained anchor; this exercises the entire
path (JPEG decode -> pack -> device warp/augment -> model -> Hungarian ->
loss -> optimizer -> EMA -> eval warp -> PnP -> score) with learnable
signal, standing in for the real SPEED data this environment does not ship.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def render_dataset(root: str, n_images: int, seed: int = 0):
    import cv2
    import jax.numpy as jnp
    from PIL import Image

    from ..geometry.camera import Camera, WORLD_POINTS
    from ..geometry.rotations import rotmat_to_quat

    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "annos"), exist_ok=True)
    os.makedirs(os.path.join(root, "images/train"), exist_ok=True)

    colors = (np.asarray(
        [[255, 60, 60], [60, 255, 60], [60, 60, 255], [255, 255, 60],
         [255, 60, 255], [60, 255, 255], [255, 160, 60], [160, 60, 255],
         [60, 160, 120], [200, 200, 200], [120, 80, 40]]
    ))

    anns = []
    for i in range(n_images):
        rvec = rng.randn(3) * 0.6
        tvec = np.array(
            [rng.uniform(-0.6, 0.6), rng.uniform(-0.4, 0.4),
             rng.uniform(14.0, 28.0)]
        )
        pts, _ = cv2.projectPoints(
            WORLD_POINTS, rvec, tvec, Camera.K, np.zeros(5)
        )
        pts = pts.reshape(-1, 2)
        R, _ = cv2.Rodrigues(rvec)
        q = np.asarray(rotmat_to_quat(jnp.asarray(R)))

        small = rng.randint(20, 90, (75, 120, 3)).astype(np.uint8)
        img = cv2.resize(small, (1920, 1200), interpolation=cv2.INTER_CUBIC)
        for k, (x, y) in enumerate(pts):
            if 4 <= x < 1916 and 4 <= y < 1196:
                cv2.circle(img, (int(round(x)), int(round(y))), 7,
                           colors[k].tolist(), -1)
                cv2.circle(img, (int(round(x)), int(round(y))), 3,
                           (255, 255, 255), -1)

        x1, y1 = pts.min(0) - 12
        x2, y2 = pts.max(0) + 12
        filename = f"img{i:06d}.jpg"
        Image.fromarray(img).save(
            os.path.join(root, "images/train", filename), quality=92
        )
        anns.append({
            "filename": filename,
            "landmarks": pts.tolist(),
            "bbox_xxyy": [float(x1), float(y1), float(x2), float(y2)],
            "q_vbs2tango": q.tolist(),
            "r_Vo2To_vbs_true": tvec.tolist(),
        })

    with open(os.path.join(root, "annos/wz_train.json"), "w") as f:
        json.dump(anns, f)
    n_train = int(n_images * 0.9)
    np.savetxt(os.path.join(root, "annos/train_s.txt"),
               np.arange(n_train), fmt="%d")
    np.savetxt(os.path.join(root, "annos/val_s.txt"),
               np.arange(n_train, n_images), fmt="%d")
    print(f"rendered {n_images} images ({n_train} train)")


def main(args):
    from ..core.yaml_config import YAMLConfig
    from ..train.solver import SpeedSolver

    if not os.path.exists(os.path.join(args.root, "annos/wz_train.json")):
        render_dataset(args.root, args.n_images, args.seed)

    aug_overrides = {}
    if getattr(args, "aug", "full") == "r1":
        # round-1 reduced family (A/B control arm): no JPEG/ISO/blur-OneOf
        aug_overrides = {"p_jpeg": 0.0, "p_iso": 0.0, "p_blur_family": 0.0}

    if getattr(args, "preset", "small") == "flagship":
        # R2 headline architecture (configs/speed/rtdetr_r50vd_kl_4.yml,
        # mirroring R2/configs/rtdetr_speed/rtdetr_r50vd_6x_speed_kl_4.yml):
        # PResNet-50-vd + 256-dim HybridEncoder + 3-layer decoder.
        arch = {
            "PResNet": {"depth": 50, "variant": "d", "freeze_norm": False,
                        "return_idx": [1, 2, 3]},
            "HybridEncoder": {"hidden_dim": 256, "nhead": 8,
                              "dim_feedforward": 1024, "expansion": 0.5},
            "RTDETRTransformer": {"num_queries": 30,
                                  "num_decoder_layers": 3},
        }
    else:
        arch = {
            "PResNet": {"depth": 18, "freeze_norm": False},
            "HybridEncoder": {"hidden_dim": 64, "nhead": 4,
                              "dim_feedforward": 128, "expansion": 0.5},
            "RTDETRTransformer": {"num_queries": 30,
                                  "num_decoder_layers": 3},
        }

    cfg = YAMLConfig(cfg={
        **arch,
        "augment": aug_overrides,
        "task": "landmarker",
        "model": "RTDETR",
        "num_classes": 11,
        "epoches": args.epochs,
        "checkpoint_step": 10000,
        "log_step": 5,
        "compute_dtype": args.dtype,
        # shipped speed configs train with ModelEMA on (reference include,
        # R2/configs/rtdetr_speed/include/optimizer.yml:1-5)
        "use_ema": bool(getattr(args, "ema", False)),
        "SetCriterion": {
            "losses": ["labels", "points_uncert"],
            "weight_dict": {"loss_ce": 1, "loss_bbox": 5},
            "matcher": {"weight_dict": {"cost_class": 2, "cost_bbox": 5}},
        },
        "optimizer": {"lr": args.lr},
        "lr_scheduler": {"milestones": [10000]},
        "train_dataloader": {
            "batch_size": args.batch,
            "dataset": {"index_file": "train_s.txt", "resize": args.resize},
        },
        "val_dataloader": {
            "batch_size": args.batch,
            "dataset": {"index_file": "val_s.txt", "resize": args.resize,
                        "train": False},
        },
        "output_dir": args.out,
    })
    solver = SpeedSolver(cfg, data_root=args.root, seed=args.seed)
    solver.fit()

    entries = [json.loads(l) for l in open(os.path.join(args.out, "log.txt"))]
    best = min(e["test_score"] for e in entries)
    last = entries[-1]
    print(f"final: loss {last['train_loss_total']:.3f} "
          f"score {last['test_score']:.3f}; best score {best:.3f} "
          f"(untrained anchor 4.1416)")
    return best


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/synthetic_speed")
    parser.add_argument("--out", default="/tmp/synthetic_speed/out")
    parser.add_argument("--n_images", type=int, default=200)
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--batch", type=int, default=18)
    parser.add_argument("--resize", type=int, default=128)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--dtype", default="float32")
    parser.add_argument("--ema", action="store_true",
                        help="train+eval with ModelEMA (the shipped speed "
                             "configs' setting)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--aug", choices=("full", "r1"), default="full",
                        help="augmentation recipe: full reference family or the round-1 reduced control arm")
    parser.add_argument("--preset", choices=("small", "flagship"),
                        default="small",
                        help="model size: small (r18/64-dim selfcheck) or "
                             "flagship (r50vd/256-dim, the R2 headline arch)")
    main(parser.parse_args())
