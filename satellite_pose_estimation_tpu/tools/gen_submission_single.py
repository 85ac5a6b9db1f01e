"""Batched submission inference over detector boxes (single checkpoint).

Mirrors R1/gen_submission_single.py:112-251: for each of the two SPEED test
splits (real_test from wz_real_test.json, synthetic test from
wz_synt_test.json), crop around the detector box (pad-to-square canvas),
run the keypoint model, solve PnP per image, and export one submission CSV.
The model forward AND the per-image PnP run as one jitted device program
per batch — the reference's host PnP loop (~0.5 ms/image serial) is gone.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import SpeedSubmissionDataset
from ..train.solver import SpeedSolver
from ..utils.metric_logger import SmoothedValue
from ..utils.submission import SubmissionWriter
from .main import args_to_config, get_args_parser


def gen_submission(solver, dataset, writer, append_fn, batch_size, mesh=None):
    """Batched submission inference; with a device mesh the batch is sharded
    over all chips and the SAME jitted program runs data-parallel (the
    multi-chip gen_submission path — XLA SPMD instead of pmap loops)."""
    from ..parallel.mesh import shard_batch

    model_solver_time = SmoothedValue(fmt="{avg:.4f}")
    for batch in dataset.batches(batch_size):
        pad = batch.pop("pad", 0)
        filenames = batch.pop("filename")
        if mesh is not None:
            device_batch = shard_batch(batch, mesh)
        else:
            device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        t0 = time.perf_counter()
        results = solver.eval_step(solver.state, device_batch)
        results = jax.device_get(results)
        model_solver_time.update(time.perf_counter() - t0)
        n = len(filenames) - pad
        for i in range(n):
            append_fn(
                filenames[i],
                np.asarray(results["quat_pr"][i]).tolist(),
                np.asarray(results["tvec_pr"][i]).tolist(),
            )
    print(f"model+solver time per batch: {model_solver_time}")


def main(args):
    cfg = args_to_config(args)
    solver = SpeedSolver(cfg, data_root=args.data_root, seed=args.seed)
    if args.resume:
        solver.resume(args.resume)
    solver._build()

    mesh = None
    if len(jax.devices()) > 1 and args.batch_size % len(jax.devices()) == 0:
        from ..parallel.mesh import create_mesh, replicate_tree

        mesh = create_mesh()
        solver.state = replicate_tree(solver.state, mesh)
        print(f"data-parallel submission over {len(jax.devices())} devices")

    writer = SubmissionWriter()
    real_ds = SpeedSubmissionDataset(
        args.data_root, args.real_ann_file, args.real_img_dir,
        resize=args.input_size,
    )
    synt_ds = SpeedSubmissionDataset(
        args.data_root, args.synt_ann_file, args.synt_img_dir,
        resize=args.input_size,
    )
    gen_submission(solver, real_ds, writer, writer.append_real_test,
                   args.batch_size, mesh)
    gen_submission(solver, synt_ds, writer, writer.append_test,
                   args.batch_size, mesh)
    writer.export(args.submission_dir)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        "gen submission (single model)", parents=[get_args_parser()]
    )
    parser.add_argument("--real_ann_file", default="wz_real_test.json")
    parser.add_argument("--real_img_dir", default="images/real_test")
    parser.add_argument("--synt_ann_file", default="wz_synt_test.json")
    parser.add_argument("--synt_img_dir", default="images/test")
    parser.add_argument("--submission_dir", default="./submission")
    main(parser.parse_args())
