"""Whole-model forward parity: live torch R2 reference RT-DETR vs our flax
RTDETR loaded through utils/checkpoint_convert.convert_r2_rtdetr.

This is the strongest pretrained-init evidence: a random-init reference
model (PResNet-18 + HybridEncoder + RTDETRTransformer composite,
R2/src/zoo/rtdetr/rtdetr.py:21-51) with randomized BN running stats is
converted tensor-for-tensor and must produce the same pred_logits /
pred_pts / pred_sigmas on the same input — any drift in layer semantics,
parameter naming, or the converter fails the test.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests._r2_reference import load_r2_modules, r2_available

pytestmark = pytest.mark.skipif(
    not r2_available(), reason="R2 reference tree not present"
)

HIDDEN = 64
NHEAD = 4
QUERIES = 8
DEC_LAYERS = 2


@pytest.fixture(scope="module", params=[18, 50],
                ids=["r18-basic", "r50vd-bottleneck"])
def torch_ref(request):
    import torch

    depth = request.param
    PResNet, HybridEncoder, RTDETRTransformer, TorchRTDETR = load_r2_modules()
    torch.manual_seed(0)
    backbone = PResNet(depth=depth, return_idx=[1, 2, 3], pretrained=False,
                       freeze_at=-1, freeze_norm=False)
    in_ch = [128, 256, 512] if depth == 18 else [512, 1024, 2048]
    encoder = HybridEncoder(in_channels=in_ch, hidden_dim=HIDDEN,
                            dim_feedforward=128, nhead=NHEAD, expansion=0.5)
    # the reference decoder sizes its score heads num_classes+1 like ours
    decoder = RTDETRTransformer(
        num_classes=11, hidden_dim=HIDDEN, num_queries=QUERIES,
        feat_channels=[HIDDEN] * 3, nhead=NHEAD,
        num_decoder_layers=DEC_LAYERS, dim_feedforward=128, num_denoising=0,
    )
    model = TorchRTDETR(backbone=backbone, encoder=encoder, decoder=decoder)
    # randomize BN running stats so batch_stats conversion is non-trivial
    gen = torch.Generator().manual_seed(7)
    for name, buf in model.named_buffers():
        if name.endswith("running_mean"):
            buf.copy_(torch.randn(buf.shape, generator=gen) * 0.1)
        elif name.endswith("running_var"):
            buf.copy_(torch.rand(buf.shape, generator=gen) + 0.5)
    model.eval()
    return model, depth


def _flax_model(depth):
    from satellite_pose_estimation_tpu.models.rtdetr import (
        RTDETR,
        RTDETRConfig,
    )

    cfg = RTDETRConfig(depth=depth, hidden_dim=HIDDEN, num_queries=QUERIES,
                       num_decoder_layers=DEC_LAYERS, dim_feedforward=128,
                       nhead=NHEAD, expansion=0.5, freeze_norm=False,
                       num_classes=11)
    return RTDETR(cfg)


def _tree_paths(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_tree_paths(v, prefix + (k,)))
    else:
        out[prefix] = tuple(np.shape(tree))
    return out


def test_converted_tree_matches_init_structure(torch_ref):
    from satellite_pose_estimation_tpu.utils.checkpoint_convert import (
        convert_r2_rtdetr,
    )

    ref_model, depth = torch_ref
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params, stats = convert_r2_rtdetr(sd, nhead=NHEAD)

    model = _flax_model(depth)
    ref = model.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    for got, want, label in (
        (params, ref["params"], "params"),
        (stats, ref["batch_stats"], "batch_stats"),
    ):
        got_p, want_p = _tree_paths(got), _tree_paths(want)
        assert got_p == want_p, (
            f"{label} mismatch; missing={sorted(set(want_p) - set(got_p))[:5]}"
            f" extra={sorted(set(got_p) - set(want_p))[:5]}"
        )


def test_whole_model_forward_parity(torch_ref):
    import torch

    from satellite_pose_estimation_tpu.utils.checkpoint_convert import (
        convert_r2_rtdetr,
    )

    ref_model, depth = torch_ref
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params, stats = convert_r2_rtdetr(sd, nhead=NHEAD)
    model = _flax_model(depth)

    rng = np.random.RandomState(3)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)

    with torch.no_grad():
        t_out = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    f_out = model.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), train=False)

    for ours, theirs in (("pred_logits", "pred_logits"),
                         ("pred_points", "pred_pts"),
                         ("pred_sigmas", "pred_sigmas")):
        a = np.asarray(f_out[ours], np.float32)
        b = t_out[theirs].numpy()
        np.testing.assert_allclose(
            a, b, atol=5e-4, rtol=1e-3,
            err_msg=f"{ours} diverges from the torch reference",
        )


def test_state_dict_round_trip(torch_ref):
    """convert_rtdetr_to_torch must exactly invert convert_r2_rtdetr, so a
    model trained here loads back into the reference composite."""
    from satellite_pose_estimation_tpu.utils.checkpoint_convert import (
        convert_r2_rtdetr,
        convert_rtdetr_to_torch,
    )

    ref_model, depth = torch_ref
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params, stats = convert_r2_rtdetr(sd, nhead=NHEAD)
    back = convert_rtdetr_to_torch(params, stats, nhead=NHEAD)

    skipped = ("temper_param", "encoder.encoder_fusion_input.weight")
    want = {k for k in sd
            if not k.endswith("num_batches_tracked") and k not in skipped}
    assert set(back) == want, (
        f"missing={sorted(want - set(back))[:5]} "
        f"extra={sorted(set(back) - want)[:5]}"
    )
    for k in sorted(want):
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_cdn_embedding_tables_convert_and_round_trip():
    """ADVICE r4 (medium): a num_denoising>0 + learnt_init_query model
    carries two nn.Embedding tables (denoising_class_embed, tgt_embed,
    reference rtdetr_decoder.py:448,455). Their converted param paths must
    load into our CDN-enabled model (flax mirrors torch attribute names:
    <name>/embedding), forward-match in eval mode, and round-trip back
    through convert_rtdetr_to_torch byte-exact."""
    import torch

    from satellite_pose_estimation_tpu.models.rtdetr import (
        RTDETR,
        RTDETRConfig,
    )
    from satellite_pose_estimation_tpu.utils.checkpoint_convert import (
        convert_r2_rtdetr,
        convert_rtdetr_to_torch,
    )

    PResNet, HybridEncoder, RTDETRTransformer, TorchRTDETR = load_r2_modules()
    torch.manual_seed(11)
    backbone = PResNet(depth=18, return_idx=[1, 2, 3], pretrained=False,
                       freeze_at=-1, freeze_norm=False)
    encoder = HybridEncoder(in_channels=[128, 256, 512], hidden_dim=HIDDEN,
                            dim_feedforward=128, nhead=NHEAD, expansion=0.5)
    decoder = RTDETRTransformer(
        num_classes=11, hidden_dim=HIDDEN, num_queries=QUERIES,
        feat_channels=[HIDDEN] * 3, nhead=NHEAD,
        num_decoder_layers=DEC_LAYERS, dim_feedforward=128,
        num_denoising=16, learnt_init_query=True,
    )
    ref_model = TorchRTDETR(backbone=backbone, encoder=encoder,
                            decoder=decoder)
    ref_model.eval()
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    assert "decoder.denoising_class_embed.weight" in sd
    assert "decoder.tgt_embed.weight" in sd

    params, stats = convert_r2_rtdetr(sd, nhead=NHEAD)
    assert "embedding" in params["decoder"]["denoising_class_embed"]
    assert "embedding" in params["decoder"]["tgt_embed"]

    # structure check against a CDN-enabled flax init (dn branch traced)
    cfg = RTDETRConfig(depth=18, hidden_dim=HIDDEN, num_queries=QUERIES,
                       num_decoder_layers=DEC_LAYERS, dim_feedforward=128,
                       nhead=NHEAD, expansion=0.5, freeze_norm=False,
                       num_classes=11, num_denoising=16,
                       learnt_init_query=True)
    model = RTDETR(cfg)
    targets = {"labels": jnp.zeros((2, 11), jnp.int32),
               "points": jnp.full((2, 11, 2), 0.5, jnp.float32)}
    ref = model.init(
        {"params": jax.random.PRNGKey(0),
         "denoising": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        jnp.zeros((2, 64, 64, 3), jnp.float32), train=True, targets=targets)
    assert _tree_paths(params) == _tree_paths(ref["params"])

    # eval forward parity (exercises the converted tgt_embed numerics; the
    # dn table is train-only and must simply ride along without breaking)
    rng = np.random.RandomState(5)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_out = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    f_out = model.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(f_out["pred_logits"], np.float32),
        t_out["pred_logits"].numpy(), atol=5e-4, rtol=1e-3)

    back = convert_rtdetr_to_torch(params, stats, nhead=NHEAD)
    for k in ("decoder.denoising_class_embed.weight",
              "decoder.tgt_embed.weight"):
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


@pytest.mark.parametrize("mode", ["large", "small", "ghostnetv2"])
def test_mobilenet_forward_parity(mode):
    """Whole-model parity on the reference's CUSTOM alt backbones: the
    modified MobileNetV3 L/S (parameterized block skips, SE-with-BN) and
    GhostNetV2 (DFC attention, pre-BN stem branch) — both with the
    side-branch pyramid and its hardcoded input/4 resize
    (R2/nn/backbone/{mobilenetv3,ghostnetv2}.py). Input is 256 so the
    reference's fixed (64, 64) branch resize equals our input/4."""
    import torch

    from satellite_pose_estimation_tpu.models.rtdetr import (
        RTDETR,
        RTDETRConfig,
    )
    from satellite_pose_estimation_tpu.utils.checkpoint_convert import (
        convert_r2_rtdetr,
    )

    load_r2_modules()
    from nn.backbone.ghostnetv2 import GhostNetV2
    from nn.backbone.mobilenetv3 import MobileNetV3_Large, MobileNetV3_Small
    from src.zoo.rtdetr.hybrid_encoder import HybridEncoder
    from src.zoo.rtdetr.rtdetr import RTDETR as TorchRTDETR
    from src.zoo.rtdetr.rtdetr_decoder import RTDETRTransformer

    torch.manual_seed(1)
    bb_cls = {"large": MobileNetV3_Large, "small": MobileNetV3_Small,
              "ghostnetv2": GhostNetV2}[mode]
    backbone = bb_cls(depth=0, pretrained=False, freeze_norm=False)
    encoder = HybridEncoder(in_channels=[128, 256, 512], hidden_dim=HIDDEN,
                            dim_feedforward=128, nhead=NHEAD, expansion=0.5)
    decoder = RTDETRTransformer(
        num_classes=11, hidden_dim=HIDDEN, num_queries=QUERIES,
        feat_channels=[HIDDEN] * 3, nhead=NHEAD,
        num_decoder_layers=DEC_LAYERS, dim_feedforward=128, num_denoising=0,
    )
    ref_model = TorchRTDETR(backbone=backbone, encoder=encoder,
                            decoder=decoder)
    gen = torch.Generator().manual_seed(9)
    for name, buf in ref_model.named_buffers():
        if name.endswith("running_mean"):
            buf.copy_(torch.randn(buf.shape, generator=gen) * 0.1)
        elif name.endswith("running_var"):
            buf.copy_(torch.rand(buf.shape, generator=gen) + 0.5)
    # f64 both sides: at 256 input (1344 encoder tokens) f32 accumulation
    # noise alone reaches ~0.5% on logits, masking real drift. In f64 the
    # stacks agree to ~1e-7, so the tolerance can be four orders tighter.
    ref_model = ref_model.double().eval()

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params, stats = convert_r2_rtdetr(sd, nhead=NHEAD)

    # exact reverse round-trip (minus dead classifier tail / unused params)
    from satellite_pose_estimation_tpu.utils.checkpoint_convert import (
        convert_rtdetr_to_torch,
    )

    back = convert_rtdetr_to_torch(params, stats, nhead=NHEAD)
    dead = ("temper_param", "encoder.encoder_fusion_input.weight")
    dead_bb = (("backbone.conv_head.", "backbone.classifier.")
               if mode == "ghostnetv2"
               else ("backbone.linear3.", "backbone.bn3."))
    want = {k for k in sd if not k.endswith("num_batches_tracked")
            and k not in dead and not k.startswith(dead_bb)}
    assert set(back) == want, (
        f"missing={sorted(want - set(back))[:5]} "
        f"extra={sorted(set(back) - want)[:5]}"
    )
    for k in want:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)

    flax_backbone = ("ghostnetv2" if mode == "ghostnetv2"
                     else f"mobilenetv3_{mode}")
    cfg = RTDETRConfig(backbone=flax_backbone, hidden_dim=HIDDEN,
                       num_queries=QUERIES, num_decoder_layers=DEC_LAYERS,
                       dim_feedforward=128, nhead=NHEAD, expansion=0.5,
                       freeze_norm=False, num_classes=11,
                       dtype=jnp.float64)
    model = RTDETR(cfg)

    # batch 2: the reference's torch.squeeze(sampling_locations)
    # (rtdetr_decoder.py:168) collapses the batch axis at batch size 1
    rng = np.random.RandomState(17)
    x = rng.rand(2, 256, 256, 3)
    with torch.no_grad():
        t_out = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    f_out = model.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x, jnp.float64), train=False)
    for ours, theirs in (("pred_logits", "pred_logits"),
                         ("pred_points", "pred_pts"),
                         ("pred_sigmas", "pred_sigmas")):
        np.testing.assert_allclose(
            np.asarray(f_out[ours]), t_out[theirs].numpy(),
            atol=1e-5, rtol=1e-5,
            err_msg=f"{ours} diverges from the torch reference ({mode})",
        )


def test_hybrid_encoder_modify_parity():
    """Live parity for the single-resolution fusion encoder variant
    (R2/src/zoo/rtdetr/hybrid_encoder_modify.py:18-109): every level
    resized to the middle level's (square) resolution, AIFI on the resized
    deepest level, FPN/PAN without further resampling."""
    import torch

    from satellite_pose_estimation_tpu.models.hybrid_encoder import (
        HybridEncoderModify,
    )
    from satellite_pose_estimation_tpu.utils.checkpoint_convert import (
        convert_r2_rtdetr,
    )

    load_r2_modules()
    from src.zoo.rtdetr.hybrid_encoder_modify import HybridEncoder_modify

    torch.manual_seed(2)
    enc = HybridEncoder_modify(in_channels=[128, 256, 512], hidden_dim=HIDDEN,
                               dim_feedforward=128, nhead=NHEAD,
                               expansion=0.5).double()
    gen = torch.Generator().manual_seed(5)
    with torch.no_grad():
        for name, buf in enc.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=gen).double() * 0.1)
            elif name.endswith("running_var"):
                buf.copy_((torch.rand(buf.shape, generator=gen) + 0.5)
                          .double())
    enc.eval()

    sd = {"encoder." + k: v.numpy() for k, v in enc.state_dict().items()}
    params, stats = convert_r2_rtdetr(sd, nhead=NHEAD)

    rng = np.random.RandomState(23)
    feats_t = [torch.from_numpy(rng.randn(2, ch, s, s))
               for ch, s in ((128, 32), (256, 16), (512, 8))]
    with torch.no_grad():
        t_outs = enc(feats_t)

    flax_enc = HybridEncoderModify(
        in_channels=(128, 256, 512), hidden_dim=HIDDEN, dim_feedforward=128,
        nhead=NHEAD, expansion=0.5, dtype=jnp.float64,
    )
    feats_f = [jnp.asarray(t.numpy().transpose(0, 2, 3, 1)) for t in feats_t]
    f_outs = flax_enc.apply(
        {"params": params["encoder"], "batch_stats": stats["encoder"]},
        feats_f, train=False,
    )
    for i, (f, t) in enumerate(zip(f_outs, t_outs)):
        np.testing.assert_allclose(
            np.asarray(f).transpose(0, 3, 1, 2), t.numpy(),
            atol=1e-5, rtol=1e-5, err_msg=f"level {i}",
        )
