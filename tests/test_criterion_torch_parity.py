"""Live loss parity: the reference SetCriterion + HungarianMatcher
(R2/src/zoo/rtdetr/{rtdetr_criterion,matcher}.py) vs our
losses.criterion.set_criterion on identical predictions and targets.

The reference training loop pops class_error and sums every remaining
weighted component (R2/solver/speed_engine.py:63-66); we reproduce that
total here, including auxiliary heads (one with sigmas, one enc-topk-style
without, exercising the reference's src_uncert=0 fallback,
rtdetr_criterion.py:176-189).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tests._r2_reference import load_r2_modules, r2_available

pytestmark = pytest.mark.skipif(
    not r2_available(), reason="R2 reference tree not present"
)

B, Q, T, C = 3, 14, 11, 11


def _random_io(seed):
    rng = np.random.RandomState(seed)
    outputs = {
        "pred_logits": rng.randn(B, Q, C + 1).astype(np.float32),
        "pred_points": rng.rand(B, Q, 2).astype(np.float32),
        "pred_sigmas": rng.randn(B, Q, 2).astype(np.float32) * 0.3,
        "aux_outputs": [
            {
                "pred_logits": rng.randn(B, Q, C + 1).astype(np.float32),
                "pred_points": rng.rand(B, Q, 2).astype(np.float32),
                "pred_sigmas": rng.randn(B, Q, 2).astype(np.float32) * 0.3,
            },
            {   # enc-topk aux: no sigmas -> plain L1 fallback
                "pred_logits": rng.randn(B, Q, C + 1).astype(np.float32),
                "pred_points": rng.rand(B, Q, 2).astype(np.float32),
            },
        ],
    }
    labels = np.tile(np.arange(T, dtype=np.int64), (B, 1))
    landmarks = rng.rand(B, T, 2).astype(np.float32)
    return outputs, labels, landmarks


def _torch_total(outputs, labels, landmarks, use_focal=False):
    import torch

    load_r2_modules()
    from src.zoo.rtdetr.matcher import HungarianMatcher
    from src.zoo.rtdetr.rtdetr_criterion import SetCriterion

    matcher = HungarianMatcher(
        {"cost_class": 2.0, "cost_bbox": 5.0, "cost_giou": 2.0},
        use_focal_loss=use_focal,
    )
    criterion = SetCriterion(
        matcher,
        weight_dict={"loss_ce": 1.0, "loss_bbox": 5.0},
        losses=["labels", "points_uncert"],
        eos_coef=1e-4,
        num_classes=C,
    )

    def to_t(a):
        return torch.from_numpy(np.asarray(a))

    t_out = {
        "pred_logits": to_t(outputs["pred_logits"]),
        "pred_pts": to_t(outputs["pred_points"]),
        "pred_sigmas": to_t(outputs["pred_sigmas"]),
        "aux_outputs": [
            {("pred_pts" if k == "pred_points" else k): to_t(v)
             for k, v in aux.items()}
            for aux in outputs["aux_outputs"]
        ],
    }
    targets = [
        {"labels": to_t(labels[b]), "landmarks": to_t(landmarks[b])}
        for b in range(B)
    ]
    with torch.no_grad():
        loss_dict = criterion(t_out, targets)
    loss_dict.pop("class_error", None)
    return float(sum(v for v in loss_dict.values()))


@pytest.mark.parametrize("seed", [0, 5])
@pytest.mark.parametrize("use_focal", [False, True])
def test_total_loss_matches_reference(seed, use_focal):
    """use_focal=True is the shipped-recipe configuration: every speed
    include sets the use_focal_loss global, shared into the matcher, which
    then scores the class cost on sigmoid probabilities (no alpha/gamma
    weighting in this fork — R2/src/zoo/rtdetr/matcher.py:77-99)."""
    from satellite_pose_estimation_tpu.losses.criterion import (
        CriterionConfig,
        set_criterion,
    )

    outputs, labels, landmarks = _random_io(seed)
    want = _torch_total(outputs, labels, landmarks, use_focal=use_focal)

    cfg = CriterionConfig(
        num_classes=C, eos_coef=1e-4, cost_class=2.0, cost_pts=5.0,
        point_loss="uncert", weight_ce=1.0, weight_points=5.0,
        use_focal=use_focal,
    )
    f_out = {
        k: (jnp.asarray(v) if not isinstance(v, list) else
            [{kk: jnp.asarray(vv) for kk, vv in a.items()} for a in v])
        for k, v in outputs.items()
    }
    targets = {
        "labels": jnp.asarray(labels.astype(np.int32)),
        "landmarks": jnp.asarray(landmarks),
    }
    total, _ = set_criterion(f_out, targets, cfg)
    np.testing.assert_allclose(float(total), want, rtol=2e-5,
                               err_msg="weighted total loss diverges")


def test_r1_total_loss_matches_reference():
    """R1 flavor: live R1 SetCriterion + HungarianMatcher
    (R1/models/{detr_speed,matcher}.py) vs our set_criterion with the R1
    recipe (smooth-l1 beta 1/200, eos 0.1, weights {ce: 1, points: 5} —
    R1/main.py:147-153, detr_speed.py:320-331). The engine sums
    weight_dict-weighted components incl. aux (R1/engine.py:39-42)."""
    import torch

    from tests._r1_reference import load_r1_modules, r1_available

    if not r1_available():
        pytest.skip("R1 reference tree not present")
    load_r1_modules()
    from models.detr_speed import SetCriterion as R1SetCriterion
    from models.matcher import HungarianMatcher as R1Matcher

    from satellite_pose_estimation_tpu.losses.criterion import (
        CriterionConfig,
        set_criterion,
    )

    rng = np.random.RandomState(2)
    outputs = {
        "pred_logits": rng.randn(B, Q, C + 1).astype(np.float32),
        "pred_points": rng.rand(B, Q, 2).astype(np.float32),
        "aux_outputs": [
            {
                "pred_logits": rng.randn(B, Q, C + 1).astype(np.float32),
                "pred_points": rng.rand(B, Q, 2).astype(np.float32),
            }
            for _ in range(2)
        ],
    }
    labels = np.tile(np.arange(T, dtype=np.int64), (B, 1))
    landmarks = rng.rand(B, T, 2).astype(np.float32)

    matcher = R1Matcher(cost_class=1.0, cost_pts=5.0)
    weight_dict = {"loss_ce": 1.0, "loss_points": 5.0}
    for i in range(2):
        weight_dict.update({f"loss_ce_{i}": 1.0, f"loss_points_{i}": 5.0})
    criterion = R1SetCriterion(
        num_classes=C, matcher=matcher, weight_dict=weight_dict,
        eos_coef=0.1, losses=["labels", "points", "cardinality"],
    )

    def to_t(a):
        return torch.from_numpy(np.asarray(a))

    t_out = {
        "pred_logits": to_t(outputs["pred_logits"]),
        "pred_points": to_t(outputs["pred_points"]),
        "aux_outputs": [{k: to_t(v) for k, v in a.items()}
                        for a in outputs["aux_outputs"]],
    }
    targets = [
        {"labels": to_t(labels[b]), "landmarks": to_t(landmarks[b])}
        for b in range(B)
    ]
    with torch.no_grad():
        loss_dict = criterion(t_out, targets)
    want = float(sum(loss_dict[k] * weight_dict[k]
                     for k in loss_dict if k in weight_dict))

    cfg = CriterionConfig(num_classes=C, eos_coef=0.1, cost_class=1.0,
                          cost_pts=5.0, point_loss="smooth_l1",
                          weight_ce=1.0, weight_points=5.0)
    f_out = {
        k: (jnp.asarray(v) if not isinstance(v, list) else
            [{kk: jnp.asarray(vv) for kk, vv in a.items()} for a in v])
        for k, v in outputs.items()
    }
    f_targets = {
        "labels": jnp.asarray(labels.astype(np.int32)),
        "landmarks": jnp.asarray(landmarks),
    }
    total, _ = set_criterion(f_out, f_targets, cfg)
    np.testing.assert_allclose(float(total), want, rtol=2e-5,
                               err_msg="R1 weighted total loss diverges")
