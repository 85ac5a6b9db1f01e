"""Device LSAP vs scipy oracle."""
import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from satellite_pose_estimation_tpu.ops.hungarian import hungarian, hungarian_batch


def check(cost):
    q4t = np.asarray(hungarian(jnp.asarray(cost, jnp.float32)))
    rows, cols = linear_sum_assignment(cost)
    total_ref = cost[rows, cols].sum()
    total_ours = cost[q4t, np.arange(cost.shape[1])].sum()
    # Assignment must be a valid permutation of targets onto distinct queries
    assert len(set(q4t.tolist())) == cost.shape[1]
    np.testing.assert_allclose(total_ours, total_ref, rtol=1e-5)


def test_square_random(rng):
    for _ in range(30):
        check(rng.rand(11, 11))


def test_rectangular_queries_30(rng):
    for _ in range(30):
        check(rng.rand(30, 11))


def test_rectangular_queries_40(rng):
    for _ in range(10):
        check(rng.rand(40, 11))


def test_detr_like_costs(rng):
    # Cost structure like the matcher: 5*L1 + 1*(-prob)
    for _ in range(10):
        pts_pred = rng.rand(30, 2)
        pts_gt = rng.rand(11, 2)
        prob = rng.dirichlet(np.ones(12), size=30)
        l1 = np.abs(pts_pred[:, None, :] - pts_gt[None, :, :]).sum(-1)
        cost = 5 * l1 - prob[:, :11]
        check(cost)


def test_batched(rng):
    costs = rng.rand(8, 30, 11).astype(np.float32)
    out = np.asarray(hungarian_batch(jnp.asarray(costs)))
    for b in range(8):
        rows, cols = linear_sum_assignment(costs[b])
        total_ref = costs[b][rows, cols].sum()
        total_ours = costs[b][out[b], np.arange(11)].sum()
        np.testing.assert_allclose(total_ours, total_ref, rtol=1e-5)


def test_ties_still_optimal():
    cost = np.zeros((5, 3))
    cost[0, :] = [1, 2, 3]
    cost[1, :] = [1, 2, 3]
    check(cost)
