"""PnP point-count ablation: re-solve poses from cached eval logs using only
the top-N keypoints, N = 4..11 (R2/utils/val_p_which_p.py:478-495 surface).

Reads an eval_{epoch}_log.json produced by the solver, re-runs the device
PnP with per-image masks keeping the N most confident keypoints, and prints
the mean SPEED score per N.
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import Camera, WORLD_POINTS
from ..geometry.ransac import ransac_p3p
from ..geometry.refine import gauss_newton_pnp
from ..geometry.rotations import inverse_rodrigues, rodrigues, rotmat_to_quat
from ..geometry.scoring import speed_score
from ..geometry.solvers import select_keypoints


def main(args):
    with open(args.eval_log) as f:
        log = json.load(f)

    world = jnp.asarray(WORLD_POINTS, jnp.float32)
    K = jnp.asarray(Camera.K, jnp.float32)

    @jax.jit
    def solve_topn(points, probs, n):
        kp, mask, _ = select_keypoints(points, probs)
        scores = jnp.max(probs, axis=-1)
        # confidence per selected keypoint slot
        labels = jnp.argmax(probs, axis=-1)
        conf = jnp.zeros(11)
        for_label = jnp.where(
            (labels[None, :] == jnp.arange(11)[:, None])
            & (labels[None, :] != 11),
            scores[None, :],
            0.0,
        )
        conf = jnp.max(for_label, axis=-1)
        order = jnp.argsort(-conf)
        keep = jnp.zeros(11, bool).at[order[:n]].set(True)
        mask = mask & keep
        r = ransac_p3p(world, kp, K, mask, float(args.repro))
        rv, tv = gauss_newton_pnp(
            world, kp, K, inverse_rodrigues(r["R"]), r["t"], r["inliers"]
        )
        return rotmat_to_quat(rodrigues(rv)), tv, r["valid"]

    for n in range(4, 12):
        scores = []
        for fn, item in log.items():
            if "quat_gt" not in item:
                continue
            points = jnp.asarray(np.asarray(item["points"]), jnp.float32)
            probs = jnp.asarray(np.asarray(item["logits"]), jnp.float32)
            quat, tvec, valid = jax.device_get(solve_topn(points, probs, n))
            if not valid:
                quat, tvec = np.zeros(4), np.zeros(3)
            s_t, s_q = jax.device_get(
                speed_score(
                    jnp.asarray(quat), jnp.asarray(tvec),
                    jnp.asarray(item["quat_gt"], jnp.float32),
                    jnp.asarray(item["tvec_gt"], jnp.float32),
                )
            )
            scores.append(float(s_t) + float(s_q))
        if scores:
            print(f"top-{n} points: mean score {np.mean(scores):.6f} "
                  f"over {len(scores)} images")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval_log", required=True)
    parser.add_argument("--repro", type=int, default=20)
    main(parser.parse_args())
