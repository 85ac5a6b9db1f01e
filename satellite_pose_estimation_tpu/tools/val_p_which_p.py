"""PnP point-count ablation: re-solve poses from cached eval logs with only
N of the 11 keypoints, N = 4..11 (R2/utils/val_p_which_p.py:361-495).

Two subset policies, matching the reference's experiments:
* ``random`` — the reference's which-p protocol: a random N-subset of the
  11 landmarks per image (R2/utils/val_p_which_p.py:419-424
  ``random.sample(range(11), num_points_PNP)``), sigma-weighted refine when
  the log carries sigmas (SimplePoseSolverSigma), seedable;
* ``topn``  — keep the N most confident keypoints instead (ours).

Reads an eval_{epoch}_log.json produced by the solver, re-runs the device
PnP per subset size and prints the mean SPEED score per N.
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import Camera, WORLD_POINTS
from ..geometry.ransac import ransac_p3p
from ..geometry.refine import gauss_newton_pnp, huber_weighted_pnp
from ..geometry.rotations import inverse_rodrigues, rodrigues, rotmat_to_quat
from ..geometry.scoring import speed_score
from ..geometry.solvers import select_keypoints


def make_solver(repro: float, use_sigma: bool):
    @jax.jit
    def solve(points, probs, sigmas, keep):
        kp, mask, sig = select_keypoints(points, probs, sigmas)
        mask = mask & keep
        r = ransac_p3p(world := jnp.asarray(WORLD_POINTS, jnp.float32),
                       kp, (K := jnp.asarray(Camera.K, jnp.float32)),
                       mask, repro)
        rv0, tv0 = inverse_rodrigues(r["R"]), r["t"]
        if use_sigma:
            rv, tv = huber_weighted_pnp(world, kp, K, sig, rv0, tv0,
                                        r["inliers"])
        else:
            rv, tv = gauss_newton_pnp(world, kp, K, rv0, tv0, r["inliers"])
        return rotmat_to_quat(rodrigues(rv)), tv, r["valid"]

    return solve


def confidence_topn_mask(probs, n):
    scores = jnp.max(probs, axis=-1)
    labels = jnp.argmax(probs, axis=-1)
    per_label = jnp.where(
        (labels[None, :] == jnp.arange(11)[:, None]) & (labels[None, :] != 11),
        scores[None, :], 0.0,
    )
    conf = jnp.max(per_label, axis=-1)
    order = jnp.argsort(-conf)
    return jnp.zeros(11, bool).at[order[:n]].set(True)


def main(args):
    with open(args.eval_log) as f:
        log = json.load(f)
    rng = np.random.RandomState(args.seed)

    items = [(fn, it) for fn, it in log.items() if "quat_gt" in it]
    if not items:
        print("eval log has no ground truth entries")
        return

    has_sigma = "sigma" in items[0][1]
    solve = make_solver(float(args.repro), has_sigma)

    results = {}
    for n in range(4, 12):
        scores = []
        for fn, item in items:
            points = jnp.asarray(np.asarray(item["points"]), jnp.float32)
            probs = jnp.asarray(np.asarray(item["logits"]), jnp.float32)
            sigmas = jnp.asarray(
                np.asarray(item["sigma"]), jnp.float32
            ) if has_sigma else jnp.ones_like(points)
            if args.mode == "random":
                keep = np.zeros(11, bool)
                keep[rng.choice(11, n, replace=False)] = True
                keep = jnp.asarray(keep)
            else:
                keep = confidence_topn_mask(probs, n)
            quat, tvec, valid = jax.device_get(
                solve(points, probs, sigmas, keep))
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
        results[n] = float(np.mean(scores))
        print(f"{args.mode} N={n}: mean score {results[n]:.6f} "
              f"over {len(scores)} images"
              + (" (sigma-weighted)" if has_sigma else ""))
    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval_log", required=True)
    parser.add_argument("--repro", type=int, default=25)
    parser.add_argument("--mode", choices=("random", "topn"),
                        default="random")
    parser.add_argument("--seed", type=int, default=0)
    main(parser.parse_args())
