"""Import helper for the R2 torch reference model (test oracle only).

The reference package eagerly imports torchvision/timm in its package
__init__ files; neither is installed here and neither is needed by the
model classes themselves (pure torch, R2/src/zoo/rtdetr/*). This shim:

* stubs the single torchvision symbol the zoo references
  (``torchvision.ops.boxes.box_area``) plus the no-op
  ``disable_beta_transforms_warning``;
* installs synthetic ``src`` / ``src.zoo`` / ``nn`` / ``nn.backbone``
  package modules whose __path__ points into the reference tree, so the
  heavyweight package __init__ files never execute.

Used by tests/test_rtdetr_torch_parity.py to build the LIVE reference
RT-DETR as a forward-parity oracle for utils/checkpoint_convert.
"""
import os
import sys
import types

R2_DIR = (
    "/root/reference/Monocular Satellite Pose Estimation Based on "
    "Uncertainty Estimation and Self-Assessment"
)


def r2_available() -> bool:
    return os.path.isdir(R2_DIR)


def load_r2_modules():
    """Returns (PResNet, HybridEncoder, RTDETRTransformer, RTDETR)."""
    if R2_DIR not in sys.path:
        sys.path.insert(0, R2_DIR)

    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        tv.__graft_stub__ = True
        sys.modules["torchvision"] = tv
    if not hasattr(tv, "ops"):
        tv.ops = types.ModuleType("torchvision.ops")
        sys.modules["torchvision.ops"] = tv.ops
    if not hasattr(tv.ops, "boxes"):
        # extend whatever stub is installed (tests/_r1_reference.py's stub
        # creates torchvision.ops without .boxes — load order must not
        # matter when both reference trees import in one pytest process)
        boxes = types.ModuleType("torchvision.ops.boxes")
        boxes.box_area = (
            lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        )
        tv.ops.boxes = boxes
        sys.modules["torchvision.ops.boxes"] = boxes
    if not hasattr(tv, "disable_beta_transforms_warning"):
        tv.disable_beta_transforms_warning = lambda: None

    if "timm" not in sys.modules:
        # ghostnetv2.py uses only the @register_model decorator
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_registry = types.ModuleType("timm.models.registry")
        timm_registry.register_model = lambda fn: fn
        timm_models.registry = timm_registry
        timm.models = timm_models
        sys.modules.update({
            "timm": timm,
            "timm.models": timm_models,
            "timm.models.registry": timm_registry,
        })

    for name, path in (
        ("src", R2_DIR + "/src"),
        ("src.zoo", R2_DIR + "/src/zoo"),
        ("nn", R2_DIR + "/nn"),
        ("nn.backbone", R2_DIR + "/nn/backbone"),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            sys.modules[name] = mod

    from nn.backbone.presnet import PResNet
    from src.zoo.rtdetr.hybrid_encoder import HybridEncoder
    from src.zoo.rtdetr.rtdetr import RTDETR
    from src.zoo.rtdetr.rtdetr_decoder import RTDETRTransformer

    return PResNet, HybridEncoder, RTDETRTransformer, RTDETR
