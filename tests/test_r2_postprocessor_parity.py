"""Live parity for the R2 eval-tail head: reference RTDETRPostProcessor
(R2/src/zoo/rtdetr/rtdetr_postprocessor.py:44-79, landmarker forward) vs
our models/postprocess.postprocess_sigma.

Contract pinned here:
* probs = softmax(pred_logits), points denormalized by the per-image
  clip_bbox — exact agreement;
* sigmas: the reference emits exp(pred_sigmas) in NORMALIZED units; ours
  deliberately scales to pixel^2 by the squared crop extent so sigmas share
  the points' units. The test asserts the two agree after unit conversion
  AND that the divergence is inert: the sigma-weighted refine
  (geometry/refine.huber_weighted_pnp, the ceres_pnp equivalent) is
  invariant to per-axis sigma rescaling because the reference normalizes
  weights per axis (sigma_w1 / sigma_sum, R2/utils/speed_eval.py:283-291).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from tests._r2_reference import r2_available, load_r2_modules

from satellite_pose_estimation_tpu.geometry.camera import Camera, WORLD_POINTS
from satellite_pose_estimation_tpu.geometry.refine import huber_weighted_pnp
from satellite_pose_estimation_tpu.models.postprocess import postprocess_sigma

pytestmark = pytest.mark.skipif(
    not r2_available(), reason="R2 reference tree not present"
)

B, Q, C = 3, 10, 12


@pytest.fixture(scope="module")
def ref_postprocessor():
    load_r2_modules()  # installs stubs + synthetic packages
    from src.zoo.rtdetr.rtdetr_postprocessor import RTDETRPostProcessor

    return RTDETRPostProcessor(num_classes=11)


def test_postprocessor_sigma_parity(ref_postprocessor):
    rng = np.random.RandomState(11)
    logits = rng.normal(0, 2.0, (B, Q, C))
    pts = rng.uniform(0.1, 0.9, (B, Q, 2))
    sig = rng.normal(-2.0, 1.0, (B, Q, 2))
    clip_bbox = np.stack(
        [
            np.array([x1, y1, x1 + w, y1 + h])
            for x1, y1, w, h in rng.uniform(100, 500, (B, 4))
        ]
    )

    ref = ref_postprocessor(
        {
            "pred_logits": torch.tensor(logits, dtype=torch.float32),
            "pred_pts": torch.tensor(pts, dtype=torch.float32),
            "pred_sigmas": torch.tensor(sig, dtype=torch.float32),
        },
        [row for row in clip_bbox],
    )
    ours = postprocess_sigma(
        {
            "pred_logits": jnp.asarray(logits, jnp.float32),
            "pred_points": jnp.asarray(pts, jnp.float32),
            "pred_sigmas": jnp.asarray(sig, jnp.float32),
        },
        jnp.asarray(clip_bbox, jnp.float32),
    )

    wh = clip_bbox[:, 2:4] - clip_bbox[:, 0:2]
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(ours["probs"])[b], ref[b]["logits"], atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(ours["points"])[b], ref[b]["points"], atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(ours["sigmas"])[b] / wh[b] ** 2,
            ref[b]["sigmas"],
            rtol=2e-4,
        )


def test_sigma_unit_divergence_is_refine_invariant():
    """huber_weighted_pnp(sig) == huber_weighted_pnp(sig * per-axis scale):
    the reference's per-axis weight normalization cancels any per-image
    (w^2, h^2) sigma rescaling, so normalized-unit (reference) and pixel^2
    (ours) sigmas refine to the same pose."""
    rng = np.random.RandomState(5)
    world = jnp.asarray(WORLD_POINTS, jnp.float32)
    R = Rotation.random(random_state=rng).as_matrix()
    t = np.array([0.1, -0.2, 11.0])
    cam = (np.asarray(WORLD_POINTS) @ R.T) + t
    px = (cam @ Camera.K.T)
    px = px[:, :2] / px[:, 2:3] + rng.normal(0, 1.0, (11, 2))

    rv0 = jnp.asarray(Rotation.from_matrix(R).as_rotvec(), jnp.float32)
    tv0 = jnp.asarray(t + [0.05, 0.05, 0.3], jnp.float32)
    K = jnp.asarray(Camera.K, jnp.float32)
    obs = jnp.asarray(px, jnp.float32)
    inliers = jnp.ones(11, bool)
    sig = jnp.asarray(np.exp(rng.normal(-2, 1, (11, 2))), jnp.float32)

    rv_a, tv_a = huber_weighted_pnp(world, obs, K, sig, rv0, tv0, inliers)
    scale = jnp.asarray([[412.3**2, 388.1**2]], jnp.float32)
    rv_b, tv_b = huber_weighted_pnp(world, obs, K, sig * scale, rv0, tv0, inliers)

    np.testing.assert_allclose(
        np.asarray(rv_a), np.asarray(rv_b), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(tv_a), np.asarray(tv_b), atol=1e-4
    )
