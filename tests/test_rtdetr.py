"""RT-DETR stack: shapes, deformable attention vs torch grid_sample oracle,
RepVgg deploy fusion equivalence, and a train step."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from satellite_pose_estimation_tpu.ops.deform_attn import (
    deformable_attention_core,
    deformable_attention_core_matmul,
)


@pytest.mark.parametrize("loc_range", ["inside", "overhang"],
                         ids=["in01", "outside"])
@pytest.mark.parametrize(
    "core", [deformable_attention_core, deformable_attention_core_matmul],
    ids=["gather", "matmul"],
)
def test_deform_attn_matches_torch_grid_sample(rng, core, loc_range):
    import torch
    import torch.nn.functional as F

    B, H, C = 2, 4, 8
    shapes = [(8, 8), (4, 4), (2, 2)]
    L = sum(h * w for h, w in shapes)
    Q, P = 5, 4
    n_levels = len(shapes)

    value = rng.randn(B, L, H, C).astype(np.float32)
    loc = rng.rand(B, Q, H, n_levels, P, 2).astype(np.float32)
    if loc_range == "overhang":
        # decoder offsets push sampling points past the map edges; zeros
        # padding must hold in both cores
        loc = loc * 1.6 - 0.3
    attw = rng.rand(B, Q, H, n_levels, P).astype(np.float32)
    attw = attw / attw.sum((-1, -2), keepdims=True)

    # torch oracle (reference core, R2/src/zoo/rtdetr/utils.py:15-64)
    tv = torch.from_numpy(value)
    split = [h * w for h, w in shapes]
    value_list = tv.split(split, dim=1)
    grids = torch.from_numpy(2 * loc - 1)
    sampled = []
    for lvl, (h, w) in enumerate(shapes):
        v_l = value_list[lvl].flatten(2).permute(0, 2, 1).reshape(B * H, C, h, w)
        g_l = grids[:, :, :, lvl].permute(0, 2, 1, 3, 4).flatten(0, 1)
        s = F.grid_sample(v_l, g_l, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
        sampled.append(s)
    aw = torch.from_numpy(attw).permute(0, 2, 1, 3, 4).reshape(
        B * H, 1, Q, n_levels * P
    )
    ref = (
        (torch.stack(sampled, dim=-2).flatten(-2) * aw)
        .sum(-1)
        .reshape(B, H * C, Q)
        .permute(0, 2, 1)
        .numpy()
    )

    ours = np.asarray(
        core(
            jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attw)
        )
    )
    np.testing.assert_allclose(ours, ref, atol=2e-5)


TINY = dict(
    depth=18,
    hidden_dim=32,
    num_queries=12,
    num_decoder_layers=2,
    nhead=4,
    dim_feedforward=64,
    expansion=0.5,
)


def test_rtdetr_forward_shapes(rng):
    from satellite_pose_estimation_tpu.models.rtdetr import (
        RTDETR,
        RTDETRConfig,
    )

    cfg = RTDETRConfig(**TINY)
    model = RTDETR(cfg)
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False,
                      mutable=["batch_stats"])[0]
    assert out["pred_logits"].shape == (2, 12, 12)
    assert out["pred_points"].shape == (2, 12, 2)
    assert out["pred_sigmas"].shape == (2, 12, 2)
    # aux: (num_decoder_layers - 1) decoder aux + 1 enc-topk aux
    assert len(out["aux_outputs"]) == cfg.num_decoder_layers
    assert "pred_sigmas" not in out["aux_outputs"][-1]  # enc aux has no sigma
    pts = np.asarray(out["pred_points"])
    assert pts.min() >= 0 and pts.max() <= 1


def test_repvgg_deploy_fusion(rng):
    from satellite_pose_estimation_tpu.models.hybrid_encoder import (
        RepVggBlock,
        fuse_repvgg_params,
    )

    x = jnp.asarray(rng.rand(1, 8, 8, 16), jnp.float32)
    block = RepVggBlock(ch_out=16, deploy=False)
    variables = block.init(jax.random.PRNGKey(0), x, train=False)
    # randomize batch stats so fusion is non-trivial
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.rand(*a.shape) + 0.5, a.dtype),
        variables["batch_stats"],
    )
    y_train_mode = block.apply(
        {"params": variables["params"], "batch_stats": stats}, x, train=False
    )

    fused = fuse_repvgg_params(variables["params"], stats)
    deploy_block = RepVggBlock(ch_out=16, deploy=True)
    y_deploy = deploy_block.apply({"params": fused}, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_deploy), np.asarray(y_train_mode), atol=1e-5
    )


def test_full_model_deploy_fusion(rng):
    """convert_params_to_deploy on the WHOLE model must only fuse RepVgg
    blocks. Regression: CSPRepLayer nodes also expose conv1/conv2 children
    and were once wrongly collapsed by the fusion walker (the reference
    fuses per-module by type, R2/src/zoo/rtdetr/hybrid_encoder.py:75-100)."""
    import dataclasses

    from satellite_pose_estimation_tpu.models.rtdetr import (
        RTDETR,
        RTDETRConfig,
        convert_params_to_deploy,
    )

    cfg = RTDETRConfig(**TINY, freeze_norm=False)
    model = RTDETR(cfg)
    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.rand(*a.shape) * 0.5 + 0.5, a.dtype),
        variables["batch_stats"],
    )
    y_ref = model.apply(
        {"params": variables["params"], "batch_stats": stats}, x, train=False
    )

    deploy_params = convert_params_to_deploy(variables["params"], stats)
    deploy_model = RTDETR(dataclasses.replace(cfg, deploy=True))
    y_dep = deploy_model.apply(
        {"params": deploy_params, "batch_stats": stats}, x, train=False
    )
    for key in ("pred_logits", "pred_points", "pred_sigmas"):
        np.testing.assert_allclose(
            np.asarray(y_dep[key]), np.asarray(y_ref[key]), atol=1e-4,
            err_msg=key,
        )


def test_rtdetr_train_step(rng):
    from satellite_pose_estimation_tpu.models.rtdetr import (
        RTDETR,
        RTDETRConfig,
    )
    from satellite_pose_estimation_tpu.losses.criterion import (
        CriterionConfig,
        set_criterion,
    )

    cfg = RTDETRConfig(**TINY)
    model = RTDETR(cfg)
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    targets = {
        "labels": jnp.asarray(np.tile(np.arange(11), (2, 1)), jnp.int32),
        "landmarks": jnp.asarray(rng.rand(2, 11, 2), jnp.float32),
    }
    ccfg = CriterionConfig(point_loss="uncert", eos_coef=1e-4, cost_class=2.0)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        total, _ = set_criterion(out, targets, ccfg)
        return total

    val, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(val))
    gnorm = float(
        jnp.sqrt(
            sum(jnp.sum(g ** 2) for g in jax.tree_util.tree_leaves(grads))
        )
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_topk_small_k_matches_lax_top_k(rng):
    """Sort-free small-K selection (ops/topk.py) must match lax.top_k
    exactly — values, indices, order, and tie resolution — on random and
    tie-heavy inputs in f32 and bf16."""
    from satellite_pose_estimation_tpu.ops.topk import topk_small_k

    for dtype in (jnp.float32, jnp.bfloat16):
        s = jnp.asarray(rng.randn(7, 137), dtype)
        v0, i0 = jax.lax.top_k(s, 12)
        v1, i1 = topk_small_k(s, 12)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))

    # heavy ties: quantized scores force the tie-order path
    s = jnp.asarray(rng.randint(0, 4, (5, 97)), jnp.float32)
    v0, i0 = jax.lax.top_k(s, 9)
    v1, i1 = topk_small_k(s, 9)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))

    # large-K fallback routes to lax.top_k
    v0, i0 = jax.lax.top_k(s, 80)
    v1, i1 = topk_small_k(s, 80)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_select_rows_matches_take_along_axis(rng):
    """One-hot-matmul row selection (ops/topk.py::select_rows) must equal
    take_along_axis exactly in f32/bf16/f64, including duplicate indices,
    and route to the fallback above the one-hot size bound."""
    from satellite_pose_estimation_tpu.ops.topk import select_rows

    ind = jnp.asarray(rng.randint(0, 57, (3, 9)), jnp.int32)
    for dtype in (jnp.float32, jnp.bfloat16, jnp.float64):
        arr = jnp.asarray(rng.randn(3, 57, 13), dtype)
        want = jnp.take_along_axis(
            arr, ind[..., None].repeat(13, -1), axis=1)
        got = select_rows(arr, ind)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        got_fb = select_rows(arr, ind, max_onehot_elems=4)  # force fallback
        np.testing.assert_array_equal(np.asarray(got_fb), np.asarray(want))
