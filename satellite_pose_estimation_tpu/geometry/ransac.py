"""Fixed-shape, device-resident RANSAC over P3P minimal samples.

TPU-native equivalent of cv2.solvePnPRansac(flags=SOLVEPNP_P3P)
(R1/utils/speed_eval.py:209-218). Instead of sequential random sampling with
early exit (host control flow), we solve EVERY 3-point minimal sample of the
<=11 keypoints in one batched computation (C(11,3)=165 triples x <=4 P3P
solutions = 660 candidate poses), score all candidates by inlier count /
inlier error against the full masked point set, and pick the best. This is
*stronger* than randomized RANSAC (it is exhaustive) and is branch-free, so
it jits and vmaps across the image batch.
"""
from __future__ import annotations

from functools import partial
from itertools import combinations

import jax
import jax.numpy as jnp

from ..ops.precision import highest_precision
import numpy as np

from .p3p import p3p_solutions
from .projection import project_points


def _all_triples(n: int) -> np.ndarray:
    return np.asarray(list(combinations(range(n), 3)), dtype=np.int32)


@partial(jax.jit, static_argnames=("max_points",))
@highest_precision
def ransac_p3p(world, image_pix, K, mask, reproj_threshold, max_points=11):
    """Exhaustive-minimal-sample robust pose.

    Args:
        world: (N, 3) world points (N = max_points, fixed).
        image_pix: (N, 2) observed pixels.
        K: (3, 3) intrinsics.
        mask: (N,) validity of each correspondence.
        reproj_threshold: scalar pixel threshold for inliers.
    Returns:
        rvec0 unused; returns dict with R (3,3), t (3,), inliers (N,) bool,
        valid (bool scalar — False when <4 valid points or no candidate).
    """
    triples = jnp.asarray(_all_triples(max_points))  # (T, 3)
    m = mask.astype(world.dtype)

    w3 = world[triples]  # (T, 3, 3)
    p3 = image_pix[triples]  # (T, 3, 2)
    sample_ok = jnp.all(mask[triples], axis=-1)  # (T,)

    Rs, ts, cand_valid = jax.vmap(lambda w_, p_: p3p_solutions(w_, p_, K))(w3, p3)
    # (T, 4, 3, 3), (T, 4, 3), (T, 4)
    cand_valid = cand_valid & sample_ok[:, None]

    T = Rs.shape[0]
    Rs_f = Rs.reshape(T * 4, 3, 3)
    ts_f = ts.reshape(T * 4, 3)
    valid_f = cand_valid.reshape(T * 4)

    proj, depth = project_points(
        world[None, :, :].repeat(T * 4, axis=0), K, Rs_f, ts_f
    )  # (C, N, 2), (C, N)
    err = jnp.linalg.norm(proj - image_pix[None, :, :], axis=-1)  # (C, N)
    inl = (err < reproj_threshold) & (depth > 0) & (mask[None, :] > 0)
    n_inl = jnp.sum(inl, axis=-1)
    inl_err = jnp.sum(jnp.where(inl, err, 0.0), axis=-1)

    # Rank: maximise inliers, tie-break on low inlier error; invalid -> -1.
    score = jnp.where(valid_f, n_inl.astype(world.dtype) - inl_err * 1e-6, -1.0)
    best = jnp.argmax(score)

    R_best = Rs_f[best]
    t_best = ts_f[best]
    inliers = inl[best]
    ok = valid_f[best] & (n_inl[best] >= 4) & (jnp.sum(m) >= 4)
    return {"R": R_best, "t": t_best, "inliers": inliers, "valid": ok}
