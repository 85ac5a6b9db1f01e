"""Checkpoint-ensemble submission (R1/gen_submission_multi.py:122-291).

For each checkpoint: run keypoint inference over both test splits and
accumulate per-filename {probs, points}. Save the raw predictions JSON
(points_logits_{synt,real}_<ts>.json), then solve each image's pose from
the pooled per-label point means (3-sigma outlier filter) with the device
Multi-Mean solver, and export the submission CSV.

TPU-native twist: the reference loops checkpoints serially on one GPU; here
each checkpoint's forward runs batched on device, and the final ensemble
solve is one vmapped program over (images x models x queries).
"""
from __future__ import annotations

import argparse
import json
from collections import defaultdict
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import SpeedSubmissionDataset
from ..geometry.camera import WORLD_POINTS
from ..geometry.multi_mean import solve_pose_multi_mean_batch
from ..ops.image_warp import crop_resize_cubic_mxu as crop_resize_cubic
from ..train.solver import SpeedSolver
from ..utils.submission import SubmissionWriter
from .main import args_to_config, get_args_parser


def gen_prediction(solver, dataset, batch_size, out_size):
    """One checkpoint over one split -> {filename: {points, probs}} with
    points denormalized into original-image coordinates."""
    preds = {}
    for batch in dataset.batches(batch_size):
        pad = batch.pop("pad", 0)
        filenames = batch.pop("filename")
        db = {k: jnp.asarray(v) for k, v in batch.items()}
        images = jax.vmap(
            lambda img, bb: crop_resize_cubic(img, bb, out_size, True)
        )(db["image"], db["clip_bbox_buf"])
        variables = {"params": solver.state.params}
        if solver.state.batch_stats:
            variables["batch_stats"] = solver.state.batch_stats
        outputs = solver.model.apply(variables, images, train=False)
        probs = jax.nn.softmax(outputs["pred_logits"], -1)
        pts = outputs["pred_points"]
        clip = db["clip_bbox"]
        wh = clip[:, 2:4] - clip[:, 0:2]
        pts_pix = pts * wh[:, None, :] + clip[:, None, 0:2]
        probs, pts_pix = jax.device_get((probs, pts_pix))
        for i in range(len(filenames) - pad):
            preds[filenames[i]] = {
                "points": np.asarray(pts_pix[i]),
                "logits": np.asarray(probs[i]),
            }
    return preds


def ensemble_solve(all_preds, writer_fn):
    """all_preds: {filename: [{points, logits} x models]}"""
    filenames = sorted(all_preds.keys())
    pts = np.stack(
        [np.stack([m["points"] for m in all_preds[f]]) for f in filenames]
    )  # (B, M, Q, 2)
    probs = np.stack(
        [np.stack([m["logits"] for m in all_preds[f]]) for f in filenames]
    )
    world = jnp.asarray(WORLD_POINTS, jnp.float32)
    quat, tvec, valid = jax.device_get(
        solve_pose_multi_mean_batch(
            world, jnp.asarray(pts, jnp.float32), jnp.asarray(probs, jnp.float32)
        )
    )
    for i, f in enumerate(filenames):
        writer_fn(f, np.asarray(quat[i]).tolist(), np.asarray(tvec[i]).tolist())


def gen_prediction_parallel(model, variable_trees, dataset, batch_size,
                            out_size, mesh):
    """All checkpoints at once: one-model-per-chip sharded ensemble forward
    (parallel/ensemble.py). Returns {filename: [{points, logits} x models]}."""
    from ..parallel.ensemble import ensemble_apply, stack_variable_trees

    stacked = stack_variable_trees(variable_trees)
    preds = defaultdict(list)
    for batch in dataset.batches(batch_size):
        pad = batch.pop("pad", 0)
        filenames = batch.pop("filename")
        db = {k: jnp.asarray(v) for k, v in batch.items()}
        images = jax.vmap(
            lambda img, bb: crop_resize_cubic(img, bb, out_size, True)
        )(db["image"], db["clip_bbox_buf"])
        outputs = ensemble_apply(model, stacked, images, mesh=mesh,
                                 train=False)
        probs = jax.nn.softmax(outputs["pred_logits"], -1)  # (M, B, Q, C)
        clip = db["clip_bbox"]
        wh = clip[:, 2:4] - clip[:, 0:2]
        pts_pix = (outputs["pred_points"] * wh[None, :, None, :]
                   + clip[None, :, None, 0:2])
        probs, pts_pix = jax.device_get((probs, pts_pix))
        for i in range(len(filenames) - pad):
            for m in range(pts_pix.shape[0]):
                preds[filenames[i]].append({
                    "points": np.asarray(pts_pix[m, i]),
                    "logits": np.asarray(probs[m, i]),
                })
    return preds


def main(args):
    cfg = args_to_config(args)
    ts = datetime.now().strftime("%Y%m%d-%H%M")

    real_ds = SpeedSubmissionDataset(
        args.data_root, args.real_ann_file, args.real_img_dir,
        resize=args.input_size,
    )
    synt_ds = SpeedSubmissionDataset(
        args.data_root, args.synt_ann_file, args.synt_img_dir,
        resize=args.input_size,
    )

    all_real = defaultdict(list)
    all_synt = defaultdict(list)
    if args.parallel_ensemble:
        # one-model-per-chip: load every checkpoint, shard over the mesh
        from ..parallel.mesh import create_mesh

        trees = []
        model = None
        for ckpt in args.checkpoints:
            solver = SpeedSolver(cfg, data_root=args.data_root,
                                 seed=args.seed)
            solver.resume(ckpt)
            solver._build()
            model = solver.model
            variables = {"params": solver.state.params}
            if solver.state.batch_stats:
                variables["batch_stats"] = solver.state.batch_stats
            trees.append(jax.tree_util.tree_map(jnp.asarray, variables))
        n_dev = len(jax.devices())
        mesh = create_mesh(n_dev) if (
            n_dev > 1 and len(trees) % n_dev == 0) else None
        all_real = gen_prediction_parallel(
            model, trees, real_ds, args.batch_size, args.input_size, mesh)
        all_synt = gen_prediction_parallel(
            model, trees, synt_ds, args.batch_size, args.input_size, mesh)
    else:
        for ckpt in args.checkpoints:
            solver = SpeedSolver(cfg, data_root=args.data_root,
                                 seed=args.seed)
            solver.resume(ckpt)
            solver._build()
            for f, p in gen_prediction(
                solver, real_ds, args.batch_size, args.input_size
            ).items():
                all_real[f].append(p)
            for f, p in gen_prediction(
                solver, synt_ds, args.batch_size, args.input_size
            ).items():
                all_synt[f].append(p)

    for name, preds in (("real", all_real), ("synt", all_synt)):
        dump = {
            f: [
                {"points": m["points"].tolist(), "logits": m["logits"].tolist()}
                for m in models
            ]
            for f, models in preds.items()
        }
        with open(f"points_logits_{name}_{ts}.json", "w") as fh:
            json.dump(dump, fh)

    writer = SubmissionWriter()
    ensemble_solve(all_real, writer.append_real_test)
    ensemble_solve(all_synt, writer.append_test)
    writer.export(args.submission_dir, suffix=ts)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        "gen submission (checkpoint ensemble)", parents=[get_args_parser()]
    )
    parser.add_argument("--checkpoints", nargs="+", required=True)
    parser.add_argument("--real_ann_file", default="wz_real_test.json")
    parser.add_argument("--real_img_dir", default="images/real_test")
    parser.add_argument("--synt_ann_file", default="wz_synt_test.json")
    parser.add_argument("--synt_img_dir", default="images/test")
    parser.add_argument("--submission_dir", default="./submission")
    parser.add_argument(
        "--parallel_ensemble", action="store_true",
        help="run all checkpoints as one sharded program "
             "(one model per chip when count divides the mesh)")
    main(parser.parse_args())
