"""Jitted train / eval steps — the whole per-batch pipeline is ONE XLA
program: device warp+augment -> model -> device Hungarian -> loss -> grads ->
optimizer/EMA (train) or model -> postprocess -> batched PnP -> SPEED scores
(eval). No host round-trips inside the loop.

Replaces R1/engine.py:15-135 and R2/solver/speed_engine.py:22-202.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..data.augment import AugmentConfig, augment_batch
from ..geometry.camera import WORLD_POINTS
from ..geometry.scoring import speed_score_batch
from ..geometry.solvers import (
    SolverConfig,
    solve_pose_self_assessed,
    solve_pose_sigma,
    solve_pose_simple,
)
from ..losses.criterion import CriterionConfig, set_criterion
from ..models.postprocess import collect_aux_points
from ..ops.image_warp import crop_resize_cubic_mxu as crop_resize_cubic
from .ema import ema_update
from .state import TrainConfig, TrainState


def make_train_step(
    criterion_cfg: CriterionConfig,
    train_cfg: TrainConfig,
    augment_cfg: AugmentConfig = AugmentConfig(),
    axis_name: Optional[str] = None,
    use_pallas_augment: bool = False,
    denoising: bool = False,
):
    """Build the jitted train step.

    Batch dict (device arrays): image (B,P,P,3) uint8, clip_bbox_buf (B,4),
    landmarks_buf (B,K,2), labels (B,K). ``use_pallas_augment`` routes the
    photometric chain through the fused Pallas kernel (TPU only).
    ``denoising``: pass targets + a "denoising" rng into the model so the
    RT-DETR decoder builds CDN groups (models/denoising.py; requires a
    model whose __call__ accepts ``targets``).
    """

    def train_step(state: TrainState, batch, rng):
        k_aug, k_drop, k_dn = jax.random.split(rng, 3)
        if use_pallas_augment:
            from ..data.augment import augment_batch_pallas

            images, kp_norm = augment_batch_pallas(
                k_aug,
                batch["image"],
                batch["clip_bbox_buf"],
                batch["landmarks_buf"],
                augment_cfg,
            )
        else:
            images, kp_norm = augment_batch(
                k_aug,
                batch["image"],
                batch["clip_bbox_buf"],
                batch["landmarks_buf"],
                augment_cfg,
            )
        targets = {"labels": batch["labels"], "landmarks": kp_norm}

        def _loss(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            kwargs = {}
            rngs = {"dropout": k_drop}
            if denoising:
                kwargs["targets"] = {
                    "labels": batch["labels"],
                    "points": kp_norm,
                }
                rngs["denoising"] = k_dn
            result = state.apply_fn(
                variables,
                images,
                train=True,
                rngs=rngs,
                mutable=mutable,
                **kwargs,
            )
            if mutable:
                outputs, updates = result
                new_stats = updates.get("batch_stats", state.batch_stats)
            else:
                outputs, new_stats = result, state.batch_stats
            total, losses = set_criterion(
                outputs, targets, criterion_cfg, axis_name
            )
            return total, (losses, new_stats)

        grads, (losses, new_stats) = jax.grad(_loss, has_aux=True)(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            losses = jax.tree_util.tree_map(
                lambda x: jax.lax.pmean(x, axis_name), losses
            )

        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_ema = (
            ema_update(state.ema_params, new_params, state.step,
                       train_cfg.ema_decay, tau=train_cfg.ema_warmups)
            if state.ema_params is not None
            else None
        )
        new_ema_stats = (
            ema_update(state.ema_batch_stats, new_stats, state.step,
                       train_cfg.ema_decay, tau=train_cfg.ema_warmups)
            if state.ema_batch_stats is not None
            else None
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            ema_params=new_ema,
            ema_batch_stats=new_ema_stats,
        )
        return new_state, losses

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(
    criterion_cfg: Optional[CriterionConfig] = None,
    solver_cfg: SolverConfig = SolverConfig(),
    out_size: int = 256,
    solver: str = "simple",  # simple | sigma | self_assessed
    use_ema: bool = False,
    quant=None,
):
    """Build the jitted eval step: warp -> model -> postprocess (denormalize
    to original-image pixels via clip_bbox) -> batched device PnP -> scores.

    Batch dict: image (B,P,P,3), clip_bbox_buf (B,4), clip_bbox (B,4) in
    original coords, scale (B,), offset (B,2), plus quat_gt/tvec_gt when
    ground truth is available.

    ``quant``: optional calibrated activation-scale collection
    (utils.calibrate.calibrate_act_scales) for the static-PTQ int8 path —
    QConv/QDense then skip their per-call activation max reductions.
    """
    world = jnp.asarray(WORLD_POINTS, jnp.float32)

    def eval_step(state: TrainState, batch):
        images = jax.vmap(
            lambda img, bb: crop_resize_cubic(img, bb, out_size, True)
        )(batch["image"], batch["clip_bbox_buf"])

        params = state.ema_params if (use_ema and state.ema_params is not None) \
            else state.params
        variables = {"params": params}
        # EMA eval pairs EMA weights with EMA'd BN stats (reference averages
        # buffers too, R2/optim/ema.py:53-63)
        stats = state.ema_batch_stats \
            if (use_ema and state.ema_batch_stats is not None) \
            else state.batch_stats
        if stats:
            variables["batch_stats"] = stats
        if quant is not None:
            variables["quant"] = quant
        outputs = state.apply_fn(variables, images, train=False)

        probs = jax.nn.softmax(outputs["pred_logits"], axis=-1)
        pts = outputs["pred_points"]  # (B, Q, 2) normalized to crop
        clip = batch["clip_bbox"]  # (B, 4) original-image coords
        wh = clip[:, 2:4] - clip[:, 0:2]
        pts_pix = pts * wh[:, None, :] + clip[:, None, 0:2]

        if solver == "simple":
            quat, tvec, valid = jax.vmap(
                lambda p, l: solve_pose_simple(world, p, l, solver_cfg)
            )(pts_pix, probs)
            sigmas_pix = jnp.ones_like(pts_pix)
        else:
            sigmas = jnp.exp(outputs["pred_sigmas"])  # (B, Q, 2)
            # Sigma is predicted in normalized crop units; scale to pixels^2
            # of the original image (variance scales with the square).
            sigmas_pix = sigmas * (wh[:, None, :] ** 2)
            if solver == "sigma":
                quat, tvec, valid = jax.vmap(
                    lambda p, l, s: solve_pose_sigma(world, p, l, s, solver_cfg)
                )(pts_pix, probs, sigmas_pix)
            else:
                areas = batch["bbox_area"]
                quat, tvec, valid = jax.vmap(
                    lambda p, l, s, a: solve_pose_self_assessed(
                        world, p, l, s, a, solver_cfg)
                )(pts_pix, probs, sigmas_pix, areas)

        result = {
            "quat_pr": quat,
            "tvec_pr": tvec,
            "valid": valid,
            "points": pts_pix,
            "probs": probs,
            "sigmas": sigmas_pix,
        }
        # Aux decoder layers for the eval log: raw aux pred_logits under
        # point-named keys — the reference's shipped-behavior quirk,
        # documented at models/postprocess.collect_aux_points.
        for i, logits in collect_aux_points(outputs, None):
            result[f"aux_points_{i}"] = logits
        if "quat_gt" in batch:
            scores = speed_score_batch(
                quat, tvec, batch["quat_gt"], batch["tvec_gt"]
            )
            result.update(scores)
        # Eval-time criterion losses for the epoch log — the reference
        # evaluate() runs the criterion on eval batches purely for logging
        # (R1/engine.py:78-135, R2/solver/speed_engine.py:123-172: the
        # test_loss_* keys of log.txt). Batch-mean scalars, returned under
        # a reserved key the evaluator does not treat as per-image data.
        if criterion_cfg is not None and "landmarks_buf" in batch:
            bb = batch["clip_bbox_buf"]
            kp_norm = (batch["landmarks_buf"] - bb[:, None, 0:2]) / (
                bb[:, None, 2:4] - bb[:, None, 0:2]
            )
            total, losses = set_criterion(
                outputs,
                {"labels": batch["labels"], "landmarks": kp_norm},
                criterion_cfg,
            )
            result["eval_losses"] = {"loss_total": total, **losses}
        return result

    return jax.jit(eval_step)
