"""Import helper for the R1 torch reference transformer/heads (test oracle).

R1's model files are pure torch except for ``utils.misc`` (imports
torchvision for a 0.5-era workaround and version-checks it) and the
backbone (torchvision resnet, reimplemented as TorchResNet50Trunk in
tests/test_checkpoint_parity.py). This shim installs a minimal torchvision
stub (shared with tests/_r2_reference.py when both load in one process)
and synthetic ``utils`` / ``models`` packages pointing into the R1 tree so
no package __init__ executes.

Used by tests/test_detr_torch_parity.py to build the LIVE reference DETR
transformer, sine position embedding, and MLP head as forward-parity
oracles for utils/checkpoint_convert.convert_r1_detr.
"""
import os
import sys
import types

R1_DIR = (
    "/root/reference/Revisiting Monocular Satellite Pose Estimation "
    "With Transformer"
)


def r1_available() -> bool:
    return os.path.isdir(R1_DIR)


def _ensure_torchvision_stub():
    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        tv.__graft_stub__ = True
        sys.modules["torchvision"] = tv
    if not hasattr(tv, "__version__"):
        # R1/utils/misc.py version-checks float(__version__[:3]) < 0.7
        tv.__version__ = "0.7.0"
    if not hasattr(tv, "_is_tracing"):
        tv._is_tracing = lambda: False
    if not hasattr(tv, "ops"):
        ops = types.ModuleType("torchvision.ops")
        ops.misc = types.ModuleType("torchvision.ops.misc")
        tv.ops = ops
        sys.modules["torchvision.ops"] = ops
        sys.modules["torchvision.ops.misc"] = ops.misc
    if not hasattr(tv, "disable_beta_transforms_warning"):
        tv.disable_beta_transforms_warning = lambda: None
    if not hasattr(tv, "models"):
        # R1/models/backbone.py imports IntermediateLayerGetter at module
        # level; it is only ever CALLED through build_backbone, which these
        # oracle tests never invoke.
        tvm = types.ModuleType("torchvision.models")
        tvm_utils = types.ModuleType("torchvision.models._utils")
        tvm_utils.IntermediateLayerGetter = type(
            "IntermediateLayerGetter", (), {}
        )
        tvm._utils = tvm_utils
        tv.models = tvm
        sys.modules["torchvision.models"] = tvm
        sys.modules["torchvision.models._utils"] = tvm_utils


def load_r1_modules():
    """Returns (Transformer, PositionEmbeddingSine, NestedTensor, MLP)."""
    _ensure_torchvision_stub()
    # synthetic packages: sys.modules entries win over sys.path scanning,
    # so these never collide with the R2 tree's same-named directories.
    for name, path in (
        ("utils", R1_DIR + "/utils"),
        ("models", R1_DIR + "/models"),
    ):
        mod = sys.modules.get(name)
        if mod is None or getattr(mod, "__path__", None) != [path]:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            sys.modules[name] = mod

    from models.detr_speed import MLP
    from models.position_encoding import PositionEmbeddingSine
    from models.transformer import Transformer
    from utils.misc import NestedTensor

    return Transformer, PositionEmbeddingSine, NestedTensor, MLP
