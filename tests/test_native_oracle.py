"""Device JAX kernels vs the native C++ reference library."""
import numpy as np
import jax.numpy as jnp
import pytest

from satellite_pose_estimation_tpu.utils import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built (native/build.sh)"
)


def test_native_lsap_matches_device(rng):
    from satellite_pose_estimation_tpu.ops.hungarian import hungarian

    for _ in range(10):
        cost = rng.rand(30, 11)
        q4t = np.asarray(hungarian(jnp.asarray(cost, jnp.float32)))
        total_dev = cost[q4t, np.arange(11)].sum()
        # native solves rows<=cols; ours is (Q,T) -> transpose
        col4row, total_nat = native.lsap(cost.T)
        np.testing.assert_allclose(total_dev, total_nat, rtol=1e-5)


def test_native_gn_matches_device_weighted(rng):
    import cv2

    from satellite_pose_estimation_tpu.geometry import (
        Camera,
        WORLD_POINTS,
        huber_weighted_pnp,
        rodrigues,
    )
    from satellite_pose_estimation_tpu.geometry.projection import (
        normalize_points,
    )

    world = WORLD_POINTS.astype(np.float64)
    for _ in range(5):
        rvec = rng.randn(3) * 0.6
        tvec = np.array([0.1, -0.1, rng.uniform(8, 20)])
        img, _ = cv2.projectPoints(world, rvec, tvec, Camera.K, np.zeros(5))
        img = img.reshape(-1, 2) + rng.randn(11, 2) * 2.0
        sigma = np.abs(rng.rand(11, 2)) * 3 + 0.5

        rv_d, tv_d = huber_weighted_pnp(
            jnp.asarray(world),
            jnp.asarray(img),
            jnp.asarray(Camera.K),
            jnp.asarray(sigma),
            jnp.asarray(rvec + 0.02),
            jnp.asarray(tvec + 0.1),
            jnp.ones(11),
            huber_delta=0.005,
            iters=30,
        )

        # Same weight construction as the device solver / reference ceres_pnp
        sq = np.sqrt(sigma)
        w1 = 1.0 / (sq + 1e-6)
        w = w1 / w1.sum(0, keepdims=True)
        obs = np.asarray(
            normalize_points(jnp.asarray(img), jnp.asarray(Camera.K))
        )
        rv_n, tv_n, _ = native.gn_pnp_refine(
            world, obs, rvec + 0.02, tvec + 0.1, weights=w,
            huber_delta=0.005, iters=60,
        )
        # Both minimise the same robust objective; poses agree closely.
        R_d = np.asarray(rodrigues(jnp.asarray(rv_d)))
        R_n = np.asarray(rodrigues(jnp.asarray(rv_n)))
        ang = np.arccos(np.clip((np.trace(R_d @ R_n.T) - 1) / 2, -1, 1))
        assert ang < 2e-3, f"angle between device and native {ang}"
        np.testing.assert_allclose(
            np.asarray(tv_d), tv_n, rtol=0.02, atol=0.02
        )
