"""Cross-framework weight parity: torch state_dict -> flax forward agreement.

The reference initializes its backbone from torchvision pretrained weights
(R1/models/backbone.py:96-149) and performs checkpoint surgery on the public
DETR-R50 file (R1/main.py:20-87). torchvision is not installed here, so the
torch side is a minimal torchvision-naming-compatible ResNet defined below
(standard bottleneck architecture, state_dict keys identical to
torchvision's). The test converts a randomly initialized torch state_dict
with utils.checkpoint_convert and asserts layer2/layer3 feature maps agree
with live torch to f32 tolerance — failing if the converter or any layer
semantics (conv padding, BN eval form, downsample placement) drift.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from satellite_pose_estimation_tpu.models.resnet import ResNet  # noqa: E402
from satellite_pose_estimation_tpu.utils.checkpoint_convert import (  # noqa: E402
    convert_resnet_to_torchvision,
    convert_torchvision_resnet,
    map_static_dicts,
)


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + identity)


class TorchResNet50Trunk(tnn.Module):
    """conv1..layer3 of torchvision resnet50, with identical state_dict
    keys (fc/avgpool omitted: the reference taps layer2/layer3 only)."""

    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, 3, stride=1)
        self.layer2 = self._make_layer(128, 4, stride=2)
        self.layer3 = self._make_layer(256, 6, stride=2)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                           bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes)
                   for _ in range(1, blocks)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x2 = self.layer2(self.layer1(x))
        x3 = self.layer3(x2)
        return x2, x3


@pytest.fixture(scope="module")
def torch_trunk():
    torch.manual_seed(0)
    model = TorchResNet50Trunk().double().eval()
    # Randomize BN stats too — fresh BN has mean 0 / var 1, which would let
    # a converter that drops running stats pass silently.
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.3)
                m.weight.normal_(1.0, 0.05)
                m.bias.normal_(0, 0.05)
    return model


def test_torchvision_resnet50_forward_parity(torch_trunk):
    sd = {k: v.numpy() for k, v in torch_trunk.state_dict().items()}
    params, stats = convert_torchvision_resnet(sd)

    flax_model = ResNet(arch="resnet50", taps=(2, 3), norm="frozen_bn",
                        dtype=jnp.float64)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 65, 65, 3)  # odd size: exposes padding-parity drift

    init_vars = flax_model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                                train=False)
    # The converted tree must cover the model's full param/stat structure.
    merged_params = map_static_dicts(params, init_vars["params"])
    merged_stats = map_static_dicts(stats, init_vars["batch_stats"])
    f2, f3 = flax_model.apply(
        {"params": merged_params, "batch_stats": merged_stats},
        jnp.asarray(x), train=False,
    )

    with torch.no_grad():
        t2, t3 = torch_trunk(
            torch.tensor(np.transpose(x, (0, 3, 1, 2)), dtype=torch.float64)
        )
    t2 = np.transpose(t2.numpy(), (0, 2, 3, 1))
    t3 = np.transpose(t3.numpy(), (0, 2, 3, 1))

    assert f2.shape == t2.shape and f3.shape == t3.shape
    np.testing.assert_allclose(np.asarray(f2), t2, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(f3), t3, rtol=1e-6, atol=1e-8)


def test_converted_tree_is_complete(torch_trunk):
    """Every torch param/stat must land somewhere in the flax tree (no
    silently dropped keys), and conversely the flax trunk params for the
    tapped layers must all be covered by the conversion."""
    import flax

    sd = {k: v.numpy() for k, v in torch_trunk.state_dict().items()}
    params, stats = convert_torchvision_resnet(sd)

    flax_model = ResNet(arch="resnet50", taps=(2, 3), norm="frozen_bn")
    init_vars = flax_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    flat_conv = flax.traverse_util.flatten_dict(params)
    flat_init = flax.traverse_util.flatten_dict(init_vars["params"])
    missing = set(flat_init) - set(flat_conv)
    assert not missing, f"converter left flax params uninitialized: {missing}"
    n_bn_stats = len(flax.traverse_util.flatten_dict(stats))
    n_torch_stats = sum(1 for k in sd if "running_" in k)
    assert n_bn_stats == n_torch_stats


def test_detr_surgery_slice_adapts_query_embed():
    """R1/main.py:20-87 surgery contract: loading a 100-query DETR checkpoint
    into a 20-query model keeps the first 20 rows; mismatched-rank leaves and
    absent leaves keep the destination init."""
    src = {
        "query_embed": {"embedding": np.arange(100 * 8, dtype=np.float32)
                        .reshape(100, 8)},
        "class_embed": {"kernel": np.ones((8, 92), np.float32)},
        "extra_in_src": {"w": np.zeros((3,), np.float32)},
    }
    dst = {
        "query_embed": {"embedding": np.zeros((20, 8), np.float32)},
        "class_embed": {"kernel": np.zeros((8, 12), np.float32)},
        "only_in_dst": {"w": np.full((2,), 7.0, np.float32)},
    }
    out = map_static_dicts(src, dst)
    np.testing.assert_array_equal(
        out["query_embed"]["embedding"],
        np.arange(100 * 8, dtype=np.float32).reshape(100, 8)[:20],
    )
    np.testing.assert_array_equal(out["class_embed"]["kernel"],
                                  np.ones((8, 12), np.float32))
    np.testing.assert_array_equal(out["only_in_dst"]["w"],
                                  np.full((2,), 7.0, np.float32))


def test_s2d_stem_matches_direct_conv(rng):
    """SpaceToDepthStem must be output-equal to the direct 7x7/2 conv on
    the same (torchvision-shaped) parameters, and keep the param tree."""
    import jax
    import jax.numpy as jnp

    from satellite_pose_estimation_tpu.models.resnet import ResNet

    x = jnp.asarray(rng.randn(2, 96, 96, 3), jnp.float32)
    direct = ResNet(arch="resnet18", taps=(2,), s2d_stem=False)
    s2d = ResNet(arch="resnet18", taps=(2,), s2d_stem=True)
    v = direct.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        s2d.init(jax.random.PRNGKey(0), x, train=False)
    )
    y1 = direct.apply(v, x, train=False)[0]
    y2 = s2d.apply(v, x, train=False)[0]
    import numpy as np

    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)


def test_presnet_s2d_stem_matches_direct(rng):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from satellite_pose_estimation_tpu.models.presnet import PResNet

    x = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    direct = PResNet(depth=18, s2d_stem=False)
    s2d = PResNet(depth=18, s2d_stem=True)
    v = direct.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        s2d.init(jax.random.PRNGKey(0), x, train=False)
    )
    for a, b in zip(direct.apply(v, x, train=False),
                    s2d.apply(v, x, train=False)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_reverse_conversion_roundtrip(torch_trunk):
    """flax -> torch (convert_resnet_to_torchvision) must invert
    torch -> flax exactly, and the emitted state_dict must load strict
    into a live torch trunk and reproduce its forward."""
    sd = {k: v.numpy() for k, v in torch_trunk.state_dict().items()}
    params, stats = convert_torchvision_resnet(sd)
    back = convert_resnet_to_torchvision(params, stats)

    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)

    fresh = TorchResNet50Trunk().double().eval()
    fresh.load_state_dict(
        {k: torch.tensor(np.asarray(v)) for k, v in back.items()}
    )
    x = torch.tensor(
        np.random.RandomState(2).randn(1, 3, 64, 64), dtype=torch.float64
    )
    with torch.no_grad():
        r2, r3 = torch_trunk(x)
        n2, n3 = fresh(x)
    np.testing.assert_allclose(n2.numpy(), r2.numpy())
    np.testing.assert_allclose(n3.numpy(), r3.numpy())
