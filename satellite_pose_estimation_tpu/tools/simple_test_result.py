"""Offline re-scoring of cached predictions (R1/simple_test_result.py:84-169).

Reads a cached predictions JSON ({filename: {points, logits}} over train
images), selects the per-label max-score point, solves P3P-RANSAC (no
iterative refinement, matching the reference script), and averages the
SPEED score against the train ground truth.
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..data.annotations import load_ground_truth
from ..geometry.camera import Camera, WORLD_POINTS
from ..geometry.ransac import ransac_p3p
from ..geometry.rotations import rotmat_to_quat
from ..geometry.scoring import speed_score
from ..geometry.solvers import select_keypoints


def main(args):
    with open(args.ret_file) as f:
        all_ret = json.load(f)
    gt = load_ground_truth(args.gt_file)

    world = jnp.asarray(WORLD_POINTS, jnp.float32)
    K = jnp.asarray(Camera.K, jnp.float32)

    @jax.jit
    def solve(points, probs):
        kp, mask, _ = select_keypoints(points, probs)
        r = ransac_p3p(world, kp, K, mask, float(args.repro))
        quat = rotmat_to_quat(r["R"])
        return quat, r["t"], r["valid"]

    scores = []
    for filename, ret in all_ret.items():
        if filename not in gt:
            continue
        points = jnp.asarray(np.asarray(ret["points"]), jnp.float32)
        probs = jnp.asarray(np.asarray(ret["logits"]), jnp.float32)
        quat, tvec, valid = jax.device_get(solve(points, probs))
        if not valid:
            quat, tvec = np.zeros(4), np.zeros(3)
        s_t, s_q = jax.device_get(
            speed_score(
                jnp.asarray(quat), jnp.asarray(tvec),
                jnp.asarray(gt[filename]["quat"], jnp.float32),
                jnp.asarray(gt[filename]["tvec"], jnp.float32),
            )
        )
        scores.append(float(s_t) + float(s_q))
        if len(scores) % 500 == 0:
            print(f"{len(scores)} images, running mean {np.mean(scores):.6f}")

    print(f"mean speed score over {len(scores)} images: "
          f"{np.mean(scores):.6f}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ret_file", default="./all_ret.json")
    parser.add_argument("--gt_file", default="./data/speed/train.json")
    parser.add_argument("--repro", type=int, default=20)
    main(parser.parse_args())
