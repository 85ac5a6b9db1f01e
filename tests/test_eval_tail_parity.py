"""End-to-end EVAL-TAIL parity vs the LIVE R1 reference: identical raw
model outputs pushed through

  reference:  PostProcess (torch, R1/models/detr_speed.py:264-293)
              -> SimplePoseSolver (cv2 P3P-RANSAC + SOLVEPNP_ITERATIVE
                 refine, R1/utils/speed_eval.py:143-242)
              -> speed_score (:245-262)
  ours:       models/postprocess.postprocess (jit)
              -> geometry/solvers.solve_pose_simple (device RANSAC + GN)
              -> geometry/scoring.speed_score

and the resulting poses/scores compared per image. This is the round-1
VERDICT "weak #8" closure: the whole-model forward parity tests cover
pixels->logits; this covers logits->pose-score, so together the full eval
pipeline is pinned against the reference implementation (cv2's RANSAC and
LM included, not numpy ports of them).

The degenerate case (<4 foreground keypoints) asserts the failure
contract too: the reference raises (caught by SpeedEval into a zero pose,
R1/datasets/speed.py:351-363); our solver returns valid=False + zero pose.

The world-points asset is additionally pinned against the reference's own
all_result.json (R1/utils/speed_eval.py:25-39).
"""
import os
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from tests._r1_reference import load_r1_eval_tail, r1_available

from satellite_pose_estimation_tpu.geometry.camera import Camera, WORLD_POINTS
from satellite_pose_estimation_tpu.geometry.scoring import (
    speed_score as speed_score_jax,
)
from satellite_pose_estimation_tpu.geometry.solvers import (
    SolverConfig,
    solve_pose_simple,
)
from satellite_pose_estimation_tpu.models.postprocess import postprocess

pytestmark = pytest.mark.skipif(
    not r1_available(), reason="R1 reference tree not present"
)

N_IMAGES = 8
N_QUERIES = 16
N_KP = 11
NOISE_PX = 0.3
REPRO = 20.0


@pytest.fixture(scope="module")
def ref_tail(tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("r1_eval_tail"))
    PostProcess, SimplePoseSolver, ref_speed_score, world = load_r1_eval_tail(
        workdir
    )
    import mathutils

    if getattr(mathutils, "__graft_stub__", False):
        pass  # scipy-backed oracle stub, see tests/_r1_reference.py
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        solver = SimplePoseSolver(types.SimpleNamespace(repro=REPRO))
    finally:
        os.chdir(cwd)
    return PostProcess(), solver, ref_speed_score, world


def _synthesize(world, rng, n_images=N_IMAGES, drop_to=None):
    """Random in-view poses -> projected keypoints -> fake DETR outputs.

    Returns (logits (B,Q,12), norm_points (B,Q,2), clip_bbox (B,4),
    quat_gt (B,4), tvec_gt (B,3)). drop_to: if set, every image keeps only
    that many foreground queries (degenerate-case builder).
    """
    B, Q = n_images, N_QUERIES
    logits = rng.normal(0.0, 0.1, (B, Q, N_KP + 1))
    norm_pts = rng.uniform(0.2, 0.8, (B, Q, 2))
    clip_bbox = np.zeros((B, 4))
    quat_gt = np.zeros((B, 4))
    tvec_gt = np.zeros((B, 3))
    n_fg = N_KP if drop_to is None else drop_to

    for b in range(B):
        R = Rotation.random(random_state=rng).as_matrix()
        t = np.array(
            [rng.uniform(-0.4, 0.4), rng.uniform(-0.3, 0.3),
             rng.uniform(8.0, 16.0)]
        )
        cam = (world @ R.T) + t  # (11, 3) camera-frame
        uvw = cam @ Camera.K.T
        px = uvw[:, :2] / uvw[:, 2:3]  # (11, 2) pixels
        assert (px > 0).all() and (px[:, 0] < 1920).all() and (
            px[:, 1] < 1200
        ).all()
        obs = px + rng.normal(0.0, NOISE_PX, px.shape)

        lo, hi = obs.min(0), obs.max(0)
        side = 1.2 * float((hi - lo).max())
        c = (lo + hi) / 2.0
        bbox = np.array(
            [c[0] - side / 2, c[1] - side / 2, c[0] + side / 2,
             c[1] + side / 2]
        )
        clip_bbox[b] = bbox

        order = rng.permutation(Q)
        fg_queries = order[:n_fg]
        labels = rng.permutation(N_KP)[:n_fg]
        for q, lab in zip(fg_queries, labels):
            logits[b, q, lab] += 10.0
            norm_pts[b, q] = (obs[lab] - bbox[:2]) / (bbox[2:] - bbox[:2])
        for q in order[n_fg:]:
            logits[b, q, N_KP] += 10.0

        q_scipy = Rotation.from_matrix(R).as_quat()  # (x,y,z,w)
        quat_gt[b] = [q_scipy[3], q_scipy[0], q_scipy[1], q_scipy[2]]
        tvec_gt[b] = t

    return logits, norm_pts, clip_bbox, quat_gt, tvec_gt


def test_world_points_asset_matches_reference(ref_tail):
    _, _, _, world_ref = ref_tail
    np.testing.assert_allclose(WORLD_POINTS, world_ref, atol=1e-12)


def test_eval_tail_parity(ref_tail):
    PostProcessRef, solver_ref, speed_score_ref, world = ref_tail
    rng = np.random.RandomState(7)
    logits, norm_pts, clip_bbox, quat_gt, tvec_gt = _synthesize(world, rng)

    # --- reference tail (torch + cv2 + mathutils-stub) ---
    out_t = {
        "pred_logits": torch.tensor(logits, dtype=torch.float32),
        "pred_points": torch.tensor(norm_pts, dtype=torch.float32),
    }
    ref_results = PostProcessRef(out_t, [row for row in clip_bbox])

    # --- our tail (jit postprocess + device solver) ---
    ours = postprocess(
        {
            "pred_logits": jnp.asarray(logits, jnp.float32),
            "pred_points": jnp.asarray(norm_pts, jnp.float32),
        },
        jnp.asarray(clip_bbox, jnp.float32),
    )
    probs_ours = np.asarray(ours["probs"])
    points_ours = np.asarray(ours["points"])

    cfg = SolverConfig(reproj_threshold=REPRO)
    world_j = jnp.asarray(world, jnp.float32)

    for b in range(N_IMAGES):
        # postprocess parity (exact contract: softmax + denormalize)
        np.testing.assert_allclose(
            probs_ours[b], ref_results[b]["logits"], atol=2e-5
        )
        np.testing.assert_allclose(
            points_ours[b], ref_results[b]["points"], atol=5e-3
        )

        q_ref, t_ref = solver_ref(
            ref_results[b]["points"], ref_results[b]["logits"]
        )
        q_our, t_our, valid = jax.device_get(
            solve_pose_simple(
                world_j,
                jnp.asarray(points_ours[b]),
                jnp.asarray(probs_ours[b]),
                cfg,
            )
        )
        assert bool(valid)

        # pose agreement (sign-normalized quats; both refines converge to
        # the same reprojection optimum on the same inlier set)
        if q_ref[0] < 0:
            q_ref = -q_ref
        if q_our[0] < 0:
            q_our = -q_our
        assert abs(float(np.dot(q_ref, q_our))) > 1.0 - 1e-6, (b, q_ref, q_our)
        np.testing.assert_allclose(t_our, t_ref, atol=5e-3)

        s_t_ref, s_q_ref = speed_score_ref(q_ref, t_ref, quat_gt[b], tvec_gt[b])
        s_t_our, s_q_our = jax.device_get(
            speed_score_jax(
                jnp.asarray(q_our), jnp.asarray(t_our),
                jnp.asarray(quat_gt[b]), jnp.asarray(tvec_gt[b]),
            )
        )
        assert abs(float(s_t_our) - float(s_t_ref)) < 5e-4
        assert abs(float(s_q_our) - float(s_q_ref)) < 5e-4


def test_summarize_stats_string_live_parity():
    """Identical per-image logs -> the reference SpeedEval.summarize
    (R1/datasets/speed.py:382-421) and our SpeedEvaluator.summarize produce
    the SAME string, verbatim — including the reference quirk where the
    'median tvec/quat' fields repeat the means (the per-image scores are
    reduced to a scalar before np.median)."""
    from tests._r1_reference import load_r1_dataset_module

    from satellite_pose_estimation_tpu.train.evaluator import SpeedEvaluator

    speed_module = load_r1_dataset_module()
    rng = np.random.RandomState(21)

    log = {}
    for i in range(7):
        t_gt = rng.uniform(-1, 12, 3)
        t_pr = t_gt + rng.normal(0, 0.05, 3)
        s_t = rng.uniform(0, 0.1)
        s_q = rng.uniform(0, 0.2)
        log[f"img{i:03d}.jpg"] = {
            "score_tvec": round(float(s_t), 8),
            "score_quat": round(float(s_q), 8),
            "score": round(float(s_t + s_q), 8),
            "tvec_pr": np.around(t_pr, 6).tolist(),
            "tvec_gt": t_gt.tolist(),
        }

    ref_eval = object.__new__(speed_module.SpeedEval)
    ref_eval.log = {k: dict(v) for k, v in log.items()}
    ref_eval.summarize()

    ours = SpeedEvaluator()
    ours.log = {k: dict(v) for k, v in log.items()}
    stats = ours.summarize()

    assert stats == ref_eval.stats


def test_eval_tail_degenerate_failure_contract(ref_tail):
    """<4 foreground keypoints: reference raises (SpeedEval catches
    IndexError/cv2.error into a zero pose); ours returns valid=False."""
    _, solver_ref, _, world = ref_tail
    rng = np.random.RandomState(3)
    logits, norm_pts, clip_bbox, _, _ = _synthesize(
        world, rng, n_images=1, drop_to=3
    )

    ours = postprocess(
        {
            "pred_logits": jnp.asarray(logits, jnp.float32),
            "pred_points": jnp.asarray(norm_pts, jnp.float32),
        },
        jnp.asarray(clip_bbox, jnp.float32),
    )

    # reference: the zero-pose fallback path of SpeedEval.update
    # (R1/datasets/speed.py:351-363)
    probs = np.asarray(ours["probs"])[0]
    points = np.asarray(ours["points"])[0]
    try:
        solver_ref(points, probs)
        ref_failed = False
    except (IndexError, cv2.error):
        ref_failed = True
    assert ref_failed

    q_our, t_our, valid = jax.device_get(
        solve_pose_simple(
            jnp.asarray(world, jnp.float32),
            jnp.asarray(points),
            jnp.asarray(probs),
            SolverConfig(reproj_threshold=REPRO),
        )
    )
    assert not bool(valid)
    np.testing.assert_array_equal(q_our, 0.0)
    np.testing.assert_array_equal(t_our, 0.0)
