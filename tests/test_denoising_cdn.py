"""CDN denoising end-to-end (VERDICT r3 item 5: num_denoising > 0 must
actually train, not silently no-op).

Covers: group-builder parity vs the LIVE reference
get_contrastive_denoising_training_group (attn mask exact, noise-free
layout exact, contrastive noise-magnitude contracts), the decoder's
matching-query invariance under CDN (masked self-attention means the
matching split is bit-for-bit the no-dn program), and a full train step
through make_train_step with dn losses flowing gradients into the
denoising embedding table.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from satellite_pose_estimation_tpu.models.denoising import (
    build_denoising_group,
)

T = 11  # SPEED keypoint count — static per image


def _group_inputs(rng, B=3, box_dim=2):
    labels = jnp.asarray(rng.randint(0, 11, (B, T)), jnp.int32)
    # interior points so noise bounds are unaffected by the [0,1] clip
    pts = jnp.asarray(rng.uniform(0.35, 0.65, (B, T, box_dim)), jnp.float32)
    table = jnp.asarray(rng.randn(12, 16), jnp.float32)
    return labels, pts, table


def test_attn_mask_and_noisefree_layout_match_reference(rng):
    """Noise off -> the group build is deterministic: compare the attention
    mask EXACTLY and the class/point layout against the live torch
    get_contrastive_denoising_training_group (R2 denoising.py:10-146)."""
    torch = pytest.importorskip("torch")
    from tests._r2_reference import r2_available

    if not r2_available():
        pytest.skip("reference tree unavailable")
    import sys

    from tests._r2_reference import load_r2_modules

    load_r2_modules()  # installs the src.* module shims
    from src.zoo.rtdetr.denoising import (
        get_contrastive_denoising_training_group,
    )

    labels, pts, table = _group_inputs(rng)
    B = labels.shape[0]
    num_queries, num_denoising = 30, 44  # G = 4 groups

    dn_embed, dn_pts_unact, mask, meta = build_denoising_group(
        jax.random.PRNGKey(0), labels, pts, table, num_queries,
        num_classes=11, num_denoising=num_denoising,
        label_noise_ratio=0.0, point_noise_scale=0.0,
    )

    # torch arm: per-image target dicts, 4-D boxes (wh chosen so xyxy stays
    # interior); class_embed as an nn.Embedding carrying the same table
    targets = [
        {
            "labels": torch.as_tensor(np.asarray(labels[i]),
                                      dtype=torch.long),
            "boxes": torch.cat(
                [torch.as_tensor(np.asarray(pts[i])),
                 torch.full((T, 2), 0.2)], dim=-1),
        }
        for i in range(B)
    ]
    emb = torch.nn.Embedding(12, 16)
    with torch.no_grad():
        emb.weight.copy_(torch.as_tensor(np.asarray(table)))
    r_cls, r_box, r_mask, r_meta = get_contrastive_denoising_training_group(
        targets, num_classes=11, num_queries=num_queries, class_embed=emb,
        num_denoising=num_denoising, label_noise_ratio=0.0,
        box_noise_scale=0.0,
    )

    assert meta["dn_num_group"] == r_meta["dn_num_group"] == 4
    assert list(meta["dn_num_split"]) == list(r_meta["dn_num_split"])
    np.testing.assert_array_equal(np.asarray(mask), r_mask.numpy())
    # noise-free embeds = table[labels tiled [pos|neg] x G]
    np.testing.assert_allclose(
        np.asarray(dn_embed), r_cls.detach().numpy(), rtol=1e-6)
    # noise-free points = inverse_sigmoid(gt tiled). NB the reference's
    # inverse_sigmoid call sits INSIDE its `if box_noise_scale > 0` branch
    # (denoising.py:90-102), so at scale 0 it returns raw sigmoid-space
    # boxes — a latent bug in its never-exercised config; apply the
    # transform to the oracle output before comparing.
    r_xy = r_box[..., :2].numpy()
    r_unact = np.log(np.clip(r_xy, 1e-5, None)
                     / np.clip(1.0 - r_xy, 1e-5, None))
    np.testing.assert_allclose(
        np.asarray(dn_pts_unact), r_unact, rtol=1e-4, atol=1e-5)


def test_contrastive_noise_magnitude_contract(rng):
    """Positives move < diff, negatives move in [diff, 2*diff) per
    coordinate (reference denoising.py:90-101 rand_part semantics), with
    diff = 0.1 * scale for 2-D points."""
    labels, pts, table = _group_inputs(rng)
    scale = 1.0
    _, dn_pts_unact, _, meta = build_denoising_group(
        jax.random.PRNGKey(1), labels, pts, table, 30, 11,
        num_denoising=44, label_noise_ratio=0.0, point_noise_scale=scale,
    )
    G = meta["dn_num_group"]
    noised = jax.nn.sigmoid(dn_pts_unact)  # undo inverse-sigmoid
    noised = np.asarray(noised).reshape(pts.shape[0], 2 * G, T, 2)
    delta = np.abs(noised - np.asarray(pts)[:, None])
    pos, neg = delta[:, 0::2], delta[:, 1::2]
    diff = 0.1 * scale
    assert pos.max() <= diff + 1e-5
    assert neg.min() >= diff - 1e-5 and neg.max() <= 2 * diff + 1e-5


def test_box_noise_contract_4d(rng):
    """4-D cxcywh path: noise applies in xyxy space with
    diff = 0.5 * wh * scale per corner coordinate (reference-exact)."""
    labels, pts_xy, table = _group_inputs(rng)
    wh = jnp.full_like(pts_xy, 0.3)
    boxes = jnp.concatenate([pts_xy, wh], -1)
    _, dn_unact, _, meta = build_denoising_group(
        jax.random.PRNGKey(2), labels, boxes, table, 30, 11,
        num_denoising=44, label_noise_ratio=0.0, point_noise_scale=1.0,
    )
    G = meta["dn_num_group"]
    noised = np.asarray(jax.nn.sigmoid(dn_unact)).reshape(
        boxes.shape[0], 2 * G, T, 4)
    # convert both to xyxy and compare per-corner deltas (clip-safe:
    # centers are interior and wh=0.3 keeps corners in (0.05, 0.95)
    # pre-noise; noise can clip at the boundary so bound only below 2*diff)
    def to_xyxy(b):
        return np.concatenate([b[..., :2] - b[..., 2:] / 2,
                               b[..., :2] + b[..., 2:] / 2], -1)

    base = to_xyxy(np.asarray(boxes))[:, None]
    delta = np.abs(to_xyxy(noised) - base)
    diff = 0.5 * 0.3  # 0.5 * wh * scale
    pos, neg = delta[:, 0::2], delta[:, 1::2]
    assert pos.max() <= diff + 1e-5
    assert neg.max() <= 2 * diff + 1e-5
    # negatives: at least the un-clipped ones must exceed diff; check the
    # median is above diff to tolerate boundary clipping
    assert np.median(neg) >= diff * 0.9


def test_label_noise_flip_rate(rng):
    labels, pts, table = _group_inputs(rng, B=8)
    ratio = 0.5
    dn_embed, _, _, meta = build_denoising_group(
        jax.random.PRNGKey(3), labels, pts, table, 30, 11,
        num_denoising=440, label_noise_ratio=ratio, point_noise_scale=0.0,
    )
    # recover which labels flipped by matching rows of the embed table
    emb = np.asarray(dn_embed)  # (B, n_dn, C)
    tab = np.asarray(table)
    got = np.argmin(
        np.linalg.norm(emb[..., None, :] - tab[None, None], axis=-1), -1)
    G = meta["dn_num_group"]
    tiled = np.tile(np.asarray(labels)[:, None], (1, 2 * G, 1)).reshape(
        labels.shape[0], -1)
    flip_rate = (got != tiled).mean()
    # flips land on a random class incl. the original ~1/11 of the time
    expect = ratio * 0.5 * (1 - 1 / 11)
    assert abs(flip_rate - expect) < 0.05


def _small_rtdetr(num_denoising):
    from satellite_pose_estimation_tpu.models.rtdetr import (
        RTDETR,
        RTDETRConfig,
    )

    cfg = RTDETRConfig(
        depth=18, freeze_norm=False, hidden_dim=32, num_queries=12,
        num_decoder_layers=2, nhead=4, dim_feedforward=64, expansion=0.5,
        num_denoising=num_denoising,
    )
    return RTDETR(cfg)


def test_matching_queries_invariant_under_cdn(rng):
    """The block mask means matching-query outputs with CDN enabled equal
    a num_denoising=0 twin's outputs on the SAME params (minus the dn
    embedding table, which only dn queries touch)."""
    import pytest

    model = _small_rtdetr(num_denoising=22)
    img = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 11, (2, T)), jnp.int32)
    pts = jnp.asarray(rng.uniform(0.2, 0.8, (2, T, 2)), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0),
            "denoising": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, img, train=True,
                           targets={"labels": labels, "points": pts})

    out_dn, _ = model.apply(
        variables, img, train=True,
        targets={"labels": labels, "points": pts},
        rngs={"denoising": jax.random.PRNGKey(3),
              "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    # a dn-configured model trained WITHOUT targets must fail loudly —
    # the silent no-op was VERDICT r3's complaint (#36)
    with pytest.raises(ValueError, match="num_denoising"):
        model.apply(variables, img, train=True, targets=None,
                    rngs={"dropout": jax.random.PRNGKey(4)},
                    mutable=["batch_stats"])

    # num_denoising=0 twin on the same weights (module tree is identical
    # apart from the dn table, which only dn queries consume)
    model0 = _small_rtdetr(num_denoising=0)
    import copy

    params0 = copy.deepcopy(jax.tree_util.tree_map(lambda x: x,
                                                   dict(variables["params"])))
    params0["decoder"] = dict(params0["decoder"])
    params0["decoder"].pop("denoising_class_embed")
    out_plain, _ = model0.apply(
        {"params": params0, "batch_stats": variables["batch_stats"]},
        img, train=True, targets=None,
        rngs={"dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    assert "dn_aux_outputs" in out_dn and "dn_meta" in out_dn
    assert len(out_dn["dn_aux_outputs"]) == 2  # one per decoder layer
    assert out_dn["pred_logits"].shape == out_plain["pred_logits"].shape
    for k in ("pred_logits", "pred_points", "pred_sigmas"):
        np.testing.assert_allclose(
            np.asarray(out_dn[k]), np.asarray(out_plain[k]),
            rtol=1e-5, atol=1e-5)


def test_cdn_det_task_padded_targets(rng):
    """Detection task (box_dim=4, padded targets with -1 labels): the dn
    branch builds, the det criterion consumes dn_aux_outputs with fixed
    matching, pads stay masked, grads reach the denoising table."""
    from satellite_pose_estimation_tpu.losses.det_criterion import (
        DetCriterionConfig,
        set_criterion_boxes,
    )
    from satellite_pose_estimation_tpu.models.rtdetr import (
        RTDETR,
        RTDETRConfig,
    )

    cfg = RTDETRConfig(
        depth=18, freeze_norm=False, hidden_dim=32, num_queries=12,
        num_decoder_layers=2, nhead=4, dim_feedforward=64, expansion=0.5,
        box_dim=4, num_denoising=16,
    )
    model = RTDETR(cfg)
    B, Tp = 2, 8  # padded target count
    img = jnp.asarray(rng.rand(B, 64, 64, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 11, (B, Tp)), jnp.int32)
    labels = labels.at[:, 5:].set(-1)  # pads
    boxes = jnp.concatenate(
        [jnp.asarray(rng.uniform(0.3, 0.7, (B, Tp, 2)), jnp.float32),
         jnp.full((B, Tp, 2), 0.2, jnp.float32)], -1)
    targets = {"labels": labels, "points": boxes}
    rngs = {"params": jax.random.PRNGKey(0),
            "denoising": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, img, train=True, targets=targets)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            img, train=True, targets=targets,
            rngs={"denoising": jax.random.PRNGKey(3),
                  "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"])
        assert "dn_aux_outputs" in out
        total, losses = set_criterion_boxes(
            out, {"labels": labels, "boxes": boxes},
            DetCriterionConfig(num_classes=11))
        return total, losses

    (total, losses), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["params"])
    assert "loss_vfl_dn_0" in losses
    assert np.isfinite(float(total))
    g = np.asarray(
        grads["decoder"]["denoising_class_embed"]["embedding"])
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


def test_cdn_train_step_end_to_end(rng):
    """make_train_step(denoising=True): dn loss keys appear, everything is
    finite, and the denoising embedding table receives gradient updates."""
    from satellite_pose_estimation_tpu.data.augment import AugmentConfig
    from satellite_pose_estimation_tpu.losses.criterion import (
        CriterionConfig,
    )
    from satellite_pose_estimation_tpu.train.state import (
        TrainConfig,
        create_train_state,
    )
    from satellite_pose_estimation_tpu.train.steps import make_train_step

    model = _small_rtdetr(num_denoising=22)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((2, 64, 64, 3), jnp.float32), TrainConfig())
    assert "denoising_class_embed" in state.params["decoder"]

    B = 2
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (B, 96, 96, 3)), jnp.uint8),
        "clip_bbox_buf": jnp.tile(
            jnp.asarray([8.0, 8.0, 88.0, 88.0], jnp.float32), (B, 1)),
        "landmarks_buf": jnp.asarray(
            rng.rand(B, T, 2) * 60 + 15, jnp.float32),
        "labels": jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1)),
    }
    step = make_train_step(
        CriterionConfig(point_loss="uncert", eos_coef=1e-4),
        TrainConfig(), AugmentConfig(out_size=64), denoising=True)
    table_before = np.asarray(
        state.params["decoder"]["denoising_class_embed"]["embedding"])
    new_state, losses = step(state, batch, jax.random.PRNGKey(5))
    assert "loss_ce_dn_0" in losses and "loss_points_dn_1" in losses
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)).all(), k
    table_after = np.asarray(
        new_state.params["decoder"]["denoising_class_embed"]["embedding"])
    assert not np.allclose(table_before, table_after), (
        "denoising embedding table received no update")
