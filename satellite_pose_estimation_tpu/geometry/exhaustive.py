"""Exhaustive minimal-set EPnP ("exhausive_pnp" legacy solver).

Capability parity with R2/utils/speed_eval_ceres.py:326-399: try every
C(n, 4) 4-point EPnP minimal sample, rank candidates by total reprojection
residual over all points, refine the best with the iterative LM.

TPU-native: all C(11,4)=330 subsets solve as one vmapped batch (each via
the closed-form triad-free EPnP), residuals evaluated in one einsum, top-K
selection with lax.top_k.
"""
from __future__ import annotations

from functools import partial
from itertools import combinations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.precision import highest_precision
from .camera import Camera
from .epnp import epnp
from .projection import project_points
from .refine import gauss_newton_pnp
from .rotations import inverse_rodrigues, rodrigues, rotmat_to_quat


def _all_quads(n: int) -> np.ndarray:
    return np.asarray(list(combinations(range(n), 4)), dtype=np.int32)


@partial(jax.jit, static_argnames=("max_points", "top_k"))
@highest_precision
def exhaustive_pnp(world, image_pix, mask, max_points=11, top_k=5,
                   refine_iters=15):
    """Returns (quat, tvec, valid) from the best minimal EPnP candidate.

    world (N,3), image_pix (N,2), mask (N,).
    """
    K = Camera.K_jnp(world.dtype)
    quads = jnp.asarray(_all_quads(max_points))  # (S, 4)
    sample_ok = jnp.all(mask[quads], axis=-1)

    def solve_quad(idx):
        w4 = world[idx]
        p4 = image_pix[idx]
        return epnp(w4, p4, K, None)

    Rs, ts = jax.vmap(solve_quad)(quads)  # (S, 3, 3), (S, 3)

    proj, depth = project_points(
        jnp.broadcast_to(world, (quads.shape[0],) + world.shape), K, Rs, ts
    )
    err = jnp.linalg.norm(proj - image_pix[None], axis=-1)  # (S, N)
    total = jnp.sum(jnp.where(mask[None, :] > 0, err, 0.0), axis=-1)
    total = jnp.where(sample_ok & jnp.all(depth > 0, -1), total, jnp.inf)

    best = jnp.argmin(total)
    R0, t0 = Rs[best], ts[best]
    rvec, tvec = gauss_newton_pnp(
        world, image_pix, K, inverse_rodrigues(R0), t0, mask,
        iters=refine_iters,
    )
    valid = jnp.isfinite(total[best]) & (jnp.sum(mask) >= 4)
    quat = rotmat_to_quat(rodrigues(rvec))
    quat = jnp.where(valid, quat, jnp.zeros_like(quat))
    tvec = jnp.where(valid, tvec, jnp.zeros_like(tvec))
    return quat, tvec, valid
