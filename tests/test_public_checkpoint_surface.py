"""Public pretrained-artifact key-surface fixtures (VERDICT r4 item 7).

The reference consumes two public weight files this environment cannot
download:

* the DETR-R50 COCO checkpoint ``detr-r50-e632da11.pth`` — loaded through
  the surgery path (R1/main.py:20-87 map_static_dicts, triggered at
  R1/main.py:270-271 when the filename matches);
* paddle-converted PResNet-vd classification weights
  (R2/nn/backbone/presnet.py:26-31 donwload_url, loaded with a STRICT
  ``self.load_state_dict(state)``).

The converters are round-trip-tested on live-torch state dicts elsewhere;
these tests pin the exact ON-DISK KEY SURFACE of the public artifacts —
synthesized here from the live reference modules plus the known extra
sections (resnet layer4, COCO heads) — so any key-surface drift in
convert_r1_detr / surgery_detr_pretrained / convert_presnet_pretrained
fails loudly even though the real files are environment-bound.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests._r1_reference import r1_available
from tests._r2_reference import r2_available


def _bn_entries(prefix, n):
    return {
        f"{prefix}.weight": np.random.rand(n).astype(np.float32) + 0.5,
        f"{prefix}.bias": np.random.randn(n).astype(np.float32) * 0.1,
        f"{prefix}.running_mean": np.random.randn(n).astype(np.float32) * 0.1,
        f"{prefix}.running_var": np.random.rand(n).astype(np.float32) + 0.5,
        f"{prefix}.num_batches_tracked": np.asarray(533301, np.int64),
    }


def _layer4_keys():
    """torchvision resnet50 layer4 section of the public file — the trunk
    stage Backbone8s never taps (R1/models/backbone.py:105-142 uses
    layer2/layer3); present on disk, must be tolerated and dropped."""
    sd = {}
    for block in range(3):
        cin = 1024 if block == 0 else 2048
        p = f"layer4.{block}"
        sd[f"{p}.conv1.weight"] = np.random.randn(
            512, cin, 1, 1).astype(np.float32) * 0.02
        sd.update(_bn_entries(f"{p}.bn1", 512))
        sd[f"{p}.conv2.weight"] = np.random.randn(
            512, 512, 3, 3).astype(np.float32) * 0.02
        sd.update(_bn_entries(f"{p}.bn2", 512))
        sd[f"{p}.conv3.weight"] = np.random.randn(
            2048, 512, 1, 1).astype(np.float32) * 0.02
        sd.update(_bn_entries(f"{p}.bn3", 2048))
    sd["layer4.0.downsample.0.weight"] = np.random.randn(
        2048, 1024, 1, 1).astype(np.float32) * 0.02
    sd.update(_bn_entries("layer4.0.downsample.1", 2048))
    return sd


@pytest.fixture(scope="module")
def public_detr_r50_model_dict():
    """Exact ``checkpoint['model']`` key surface of detr-r50-e632da11.pth:
    torchvision resnet50 trunk under backbone.0.body (conv1..layer4, with
    num_batches_tracked buffers), sine embedding (parameter-free
    backbone.1), input_proj 2048->256, query_embed (100, 256), the 6+6
    layer d256/h8/ffn2048 transformer, and the COCO heads class_embed
    (92, 256) / bbox_embed (3-layer MLP -> 4)."""
    if not r1_available():
        pytest.skip("R1 reference tree not present")
    import torch

    from tests._r1_reference import load_r1_modules
    from tests.test_checkpoint_parity import TorchResNet50Trunk

    Transformer, _, _, MLP = load_r1_modules()
    torch.manual_seed(0)
    trunk = TorchResNet50Trunk()
    sd = {}
    for k, v in trunk.state_dict().items():
        sd[f"backbone.0.body.{k}"] = v.numpy()
    for k, v in _layer4_keys().items():
        sd[f"backbone.0.body.{k}"] = v

    transformer = Transformer(
        d_model=256, nhead=8, num_encoder_layers=6, num_decoder_layers=6,
        dim_feedforward=2048, dropout=0.1, return_intermediate_dec=True)
    for k, v in transformer.state_dict().items():
        sd[f"transformer.{k}"] = v.numpy()
    assert "transformer.decoder.norm.weight" in sd
    assert "transformer.encoder.norm.weight" not in sd  # post-norm DETR

    sd["input_proj.weight"] = np.random.randn(
        256, 2048, 1, 1).astype(np.float32) * 0.02
    sd["input_proj.bias"] = np.zeros(256, np.float32)
    sd["query_embed.weight"] = np.random.randn(100, 256).astype(np.float32)
    sd["class_embed.weight"] = np.random.randn(92, 256).astype(
        np.float32) * 0.02
    sd["class_embed.bias"] = np.zeros(92, np.float32)
    for i, (cin, cout) in enumerate(((256, 256), (256, 256), (256, 4))):
        sd[f"bbox_embed.layers.{i}.weight"] = np.random.randn(
            cout, cin).astype(np.float32) * 0.02
        sd[f"bbox_embed.layers.{i}.bias"] = np.zeros(cout, np.float32)
    return sd


def test_detr_r50_surgery_ingests_public_surface(public_detr_r50_model_dict):
    """surgery_detr_pretrained on the flagship (resnet50s8, enc/dec 4,
    20 queries): trunk + transformer + input_proj + query_embed load with
    slice adaptation, the COCO heads and layer4 drop, our keypoint heads
    keep their init — the R1/main.py:20-87 contract."""
    from satellite_pose_estimation_tpu.models.detr import (
        DETRConfig,
        DETRKeypointModel,
    )
    from satellite_pose_estimation_tpu.utils.checkpoint_convert import (
        surgery_detr_pretrained,
    )

    sd = public_detr_r50_model_dict
    model = DETRKeypointModel(DETRConfig(
        backbone="resnet50s8", enc_layers=4, dec_layers=4, num_queries=20,
        dropout=0.0))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           train=False)
    dst_params = jax.tree_util.tree_map(np.asarray, variables["params"])
    dst_stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    params, stats = surgery_detr_pretrained(sd, dst_params, dst_stats)

    # tree structure is unchanged (partial merge, never reshapes the dst)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(dst_params))

    # query_embed: first 20 of the public 100 rows
    np.testing.assert_array_equal(
        np.asarray(params["query_embed"]), sd["query_embed.weight"][:20])
    # transformer weights: exact copy where layers exist (4 < 6)
    np.testing.assert_array_equal(
        np.asarray(params["transformer"]["encoder_layer_0"]["linear1"]
                   ["kernel"]),
        sd["transformer.encoder.layers.0.linear1.weight"].T)
    # trunk conv1 landed (under Backbone8s's body scope)
    np.testing.assert_array_equal(
        np.asarray(params["backbone"]["body"]["conv1"]["kernel"]),
        sd["backbone.0.body.conv1.weight"].transpose(2, 3, 1, 0))
    # input_proj slice-adapted on in-channels (2048 -> dst's trunk width)
    ip = np.asarray(params["input_proj"]["kernel"])
    cin = ip.shape[2]
    assert cin < 2048
    np.testing.assert_array_equal(
        ip, sd["input_proj.weight"].transpose(2, 3, 1, 0)[:, :, :cin, :])
    # COCO heads dropped: our keypoint heads keep their init
    np.testing.assert_array_equal(
        np.asarray(params["cls_embed"]["kernel"]),
        np.asarray(dst_params["cls_embed"]["kernel"]))
    # BN running stats from the file land in batch_stats
    np.testing.assert_array_equal(
        np.asarray(stats["backbone"]["body"]["bn1"]["mean"]),
        sd["backbone.0.body.bn1.running_mean"])


def test_load_torch_checkpoint_pth_roundtrip(tmp_path):
    """The CLI surgery path (tools/main.py --resume *.pth ->
    solver.surgery) goes through load_torch_checkpoint: a torch-saved
    ``{'model': state_dict}`` file must come back as numpy with the same
    keys and values (R1/main.py:269-271 torch.load + checkpoint['model'])."""
    import torch

    from satellite_pose_estimation_tpu.utils.checkpoint_convert import (
        load_torch_checkpoint,
    )

    sd = {"query_embed.weight": np.random.randn(10, 8).astype(np.float32),
          "input_proj.bias": np.zeros(4, np.float32)}
    p = tmp_path / "detr-r50-e632da11.pth"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()},
                "epoch": 300}, str(p))
    back = load_torch_checkpoint(str(p))
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])


@pytest.mark.skipif(not r2_available(), reason="R2 reference tree absent")
@pytest.mark.parametrize("depth", [18, 50])
def test_presnet_paddle_pretrained_surface(depth):
    """The paddle files load with STRICT load_state_dict into PResNet
    (R2/nn/backbone/presnet.py:228-229), so their key surface IS the live
    module's state_dict. convert_presnet_pretrained must ingest exactly
    that surface into our flax backbone subtree."""
    from tests._r2_reference import load_r2_modules

    from satellite_pose_estimation_tpu.models.rtdetr import (
        RTDETR,
        RTDETRConfig,
    )
    from satellite_pose_estimation_tpu.utils.checkpoint_convert import (
        convert_presnet_pretrained,
    )

    import torch

    PResNet, _, _, _ = load_r2_modules()
    torch.manual_seed(1)
    ref = PResNet(depth=depth, return_idx=[1, 2, 3], pretrained=False,
                  freeze_at=-1, freeze_norm=False)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    bb_params, bb_stats = convert_presnet_pretrained(sd)

    cfg = RTDETRConfig(depth=depth, hidden_dim=64, num_queries=8,
                       num_decoder_layers=2, dim_feedforward=128, nhead=4,
                       expansion=0.5, freeze_norm=False, num_classes=11)
    model = RTDETR(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           train=False)

    def paths(tree, prefix=()):
        out = set()
        if isinstance(tree, dict):
            for k, v in tree.items():
                out |= paths(v, prefix + (k,))
        else:
            out.add(prefix + (tuple(np.shape(tree)),))
        return out

    assert paths(bb_params) == paths(dict(variables["params"]["backbone"]))
    assert paths(bb_stats) == paths(
        dict(variables["batch_stats"]["backbone"]))
