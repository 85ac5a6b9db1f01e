"""Whole-model forward parity: live R1 torch reference vs our flax
DETRKeypointModel loaded through utils/checkpoint_convert.convert_r1_detr.

The torch side composes the LIVE reference Transformer, sine position
embedding, and MLP head (R1/models/{transformer,position_encoding,
detr_speed}.py) with the test-local torchvision-naming resnet50 trunk and
a Backbone8s mirror (fusion semantics per R1/models/backbone.py:105-142:
s8 lateral on layer2, 3x3 lateral on 2x-bilinear-upsampled layer3
(align_corners=True), concat, 3x3 output conv). Forward glue mirrors
R1/models/detr_speed.py:59-87. Any divergence in transformer semantics
(pos added inside every attention, post-norm layout, intermediate stack),
position encoding, backbone fusion, or the converter fails the test.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from tests._r1_reference import load_r1_modules, r1_available
from tests.test_checkpoint_parity import TorchResNet50Trunk

pytestmark = pytest.mark.skipif(
    not r1_available(), reason="R1 reference tree not present"
)

HIDDEN = 32
NHEAD = 4
QUERIES = 8
ENC_LAYERS = 1
DEC_LAYERS = 2
FFN = 64


class _TorchBackbone8s(tnn.Module):
    """Backbone8s mirror (R1/models/backbone.py:105-142) on the
    torchvision-naming trunk: state_dict keys match the reference's
    ``body.*`` / fusion-conv names exactly."""

    def __init__(self):
        super().__init__()
        self.body = TorchResNet50Trunk()
        self.up16sto8s = tnn.UpsamplingBilinear2d(scale_factor=2)
        self.s8_latern = tnn.Conv2d(512, 256, 1, 1, bias=False)
        self.s16_latern = tnn.Conv2d(1024, 256, 3, 1, 1, bias=False)
        self.output_conv = tnn.Conv2d(512, 512, 3, 1, 1)

    def forward(self, x):
        xs8, xs16 = self.body(x)
        xs8 = self.s8_latern(xs8)
        xs16 = self.s16_latern(self.up16sto8s(xs16))
        return self.output_conv(torch.cat([xs8, xs16], 1))


@pytest.fixture(scope="module")
def torch_r1():
    Transformer, PositionEmbeddingSine, NestedTensor, MLP = load_r1_modules()

    class TorchR1DETR(tnn.Module):
        def __init__(self):
            super().__init__()
            # nn.Sequential gives the reference's backbone.0 / backbone.1
            # key prefixes; the sine embedding holds no parameters.
            self.backbone = tnn.Sequential(_TorchBackbone8s())
            self.posenc = PositionEmbeddingSine(HIDDEN // 2, normalize=True)
            self.input_proj = tnn.Conv2d(512, HIDDEN, 1)
            self.query_embed = tnn.Embedding(QUERIES, HIDDEN)
            self.cls_embed = tnn.Linear(HIDDEN, 12)
            self.point_embed = MLP(HIDDEN, HIDDEN, 2, 3)
            self.transformer = Transformer(
                d_model=HIDDEN, nhead=NHEAD, num_encoder_layers=ENC_LAYERS,
                num_decoder_layers=DEC_LAYERS, dim_feedforward=FFN,
                dropout=0.0, normalize_before=False,
                return_intermediate_dec=True,
            )

        def forward(self, x):
            src = self.input_proj(self.backbone[0](x))
            mask = torch.zeros(src.shape[0], src.shape[2], src.shape[3],
                               dtype=torch.bool)
            pos = self.posenc(NestedTensor(src, mask))
            hs = self.transformer(src, mask, self.query_embed.weight, pos)[0]
            return {
                "pred_logits": self.cls_embed(hs[-1]),
                "pred_points": self.point_embed(hs[-1]).sigmoid(),
            }

    torch.manual_seed(0)
    model = TorchR1DETR()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.3)
                m.weight.normal_(1.0, 0.05)
                m.bias.normal_(0, 0.05)
    model.eval()
    return model


def _flax_model():
    from satellite_pose_estimation_tpu.models.detr import (
        DETRConfig,
        DETRKeypointModel,
    )

    cfg = DETRConfig(backbone="resnet50s8", hidden_dim=HIDDEN, nheads=NHEAD,
                     enc_layers=ENC_LAYERS, dec_layers=DEC_LAYERS,
                     dim_feedforward=FFN, num_queries=QUERIES, dropout=0.0)
    return DETRKeypointModel(cfg)


def _tree_paths(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_tree_paths(v, prefix + (k,)))
    else:
        out[prefix] = tuple(np.shape(tree))
    return out


def _convert(torch_r1):
    from satellite_pose_estimation_tpu.utils.checkpoint_convert import (
        convert_r1_detr,
    )

    sd = {k: v.numpy() for k, v in torch_r1.state_dict().items()
          if not k.startswith("posenc.")}
    return convert_r1_detr(sd, nhead=NHEAD)


def test_converted_tree_matches_init_structure(torch_r1):
    params, stats = _convert(torch_r1)
    model = _flax_model()
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


def test_whole_model_forward_parity(torch_r1):
    params, stats = _convert(torch_r1)
    model = _flax_model()

    rng = np.random.RandomState(11)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)

    with torch.no_grad():
        t_out = torch_r1(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    f_out = model.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), train=False)

    for key in ("pred_logits", "pred_points"):
        np.testing.assert_allclose(
            np.asarray(f_out[key], np.float32), t_out[key].numpy(),
            atol=5e-4, rtol=1e-3,
            err_msg=f"{key} diverges from the torch reference",
        )
