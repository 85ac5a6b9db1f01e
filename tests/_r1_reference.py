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


def _ensure_mathutils_stub():
    """R1/utils/speed_eval.py converts rotation matrices to quaternions via
    Blender's mathutils C library, absent here. The stub backs
    Matrix.to_quaternion with scipy.spatial.transform (an independent
    implementation from our geometry/rotations.py Shepperd code, so the
    oracle stays a genuine oracle). Scalar-first order, matching mathutils;
    sign is irrelevant downstream (speed_score flips on q0<0)."""
    if "mathutils" in sys.modules:
        return
    try:
        import mathutils  # noqa: F401  (real library, if ever present)

        return
    except ImportError:
        pass
    import numpy as np
    from scipy.spatial.transform import Rotation

    mod = types.ModuleType("mathutils")
    mod.__graft_stub__ = True

    class Matrix:
        def __init__(self, rows):
            self._m = np.asarray(rows, dtype=np.float64)

        def to_quaternion(self):
            q = Rotation.from_matrix(self._m).as_quat()  # (x, y, z, w)
            return np.array([q[3], q[0], q[1], q[2]])

    class Quaternion:  # imported by name in R1/utils/utils.py; never
        def __init__(self, *args):  # called on the eval-tail path
            raise NotImplementedError("__graft_stub__ mathutils.Quaternion")

    mod.Matrix = Matrix
    mod.Quaternion = Quaternion
    sys.modules["mathutils"] = mod


def _ensure_dataset_stubs():
    """Extra stubs for importing R1/datasets/speed.py live:

    * ``albumentations`` — module-level ``import albumentations as A``; only
      referenced inside make_transforms, which crop-parity tests never call,
      so an empty marked stub suffices;
    * ``torchvision.transforms.functional.to_tensor`` — standard torchvision
      semantics (uint8 HWC -> float32 CHW / 255), needed by
      SpeedSubmission.__getitem__ (R1/datasets/speed.py:150).
    """
    if "albumentations" not in sys.modules:
        alb = types.ModuleType("albumentations")
        alb.__graft_stub__ = True
        sys.modules["albumentations"] = alb

    _ensure_torchvision_stub()
    tv = sys.modules["torchvision"]
    if not hasattr(tv, "transforms"):
        import numpy as np
        import torch

        transforms = types.ModuleType("torchvision.transforms")
        functional = types.ModuleType("torchvision.transforms.functional")
        functional.__graft_stub__ = True

        def to_tensor(pic):
            arr = np.asarray(pic)
            t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
            return t.float().div(255.0)

        functional.to_tensor = to_tensor
        transforms.functional = functional
        tv.transforms = transforms
        sys.modules["torchvision.transforms"] = transforms
        sys.modules["torchvision.transforms.functional"] = functional


def load_r1_dataset_module():
    """Import R1/datasets/speed.py live (SpeedTrain / SpeedSubmission crop
    and canvas code) and return the module. make_transforms is NOT usable
    (albumentations is a marked empty stub)."""
    _ensure_mathutils_stub()
    _ensure_dataset_stubs()
    _ensure_r1_packages()
    for name, path in (("datasets", R1_DIR + "/datasets"),):
        mod = sys.modules.get(name)
        if mod is None or getattr(mod, "__path__", None) != [path]:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            sys.modules[name] = mod

    import datasets.speed as speed_module

    return speed_module


def _ensure_r1_packages():
    """Install synthetic ``utils``/``models`` packages pointing into the R1
    tree: sys.modules entries win over sys.path scanning, so these never
    collide with the R2 tree's same-named directories."""
    for name, path in (
        ("utils", R1_DIR + "/utils"),
        ("models", R1_DIR + "/models"),
    ):
        mod = sys.modules.get(name)
        if mod is None or getattr(mod, "__path__", None) != [path]:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            sys.modules[name] = mod


def load_r1_modules():
    """Returns (Transformer, PositionEmbeddingSine, NestedTensor, MLP)."""
    _ensure_torchvision_stub()
    _ensure_r1_packages()

    from models.detr_speed import MLP
    from models.position_encoding import PositionEmbeddingSine
    from models.transformer import Transformer
    from utils.misc import NestedTensor

    return Transformer, PositionEmbeddingSine, NestedTensor, MLP


def load_r1_eval_tail(workdir):
    """Load the LIVE reference eval tail: PostProcess
    (R1/models/detr_speed.py:264-293), SimplePoseSolver
    (R1/utils/speed_eval.py:143-242, cv2 P3P-RANSAC + ITERATIVE refine),
    and speed_score (:245-262).

    PoseSolver.__init__ reads the world points from the relative path
    ``./data/annos/all_result.json`` (R1/utils/speed_eval.py:25,34); this
    creates that layout under ``workdir`` (symlinked to the reference's own
    file) — the caller must chdir(workdir) before constructing a solver.

    Returns (PostProcess, SimplePoseSolver, speed_score, world_points).
    """
    import json

    import numpy as np

    _ensure_torchvision_stub()
    _ensure_mathutils_stub()
    _ensure_r1_packages()

    annos_dir = os.path.join(workdir, "data", "annos")
    os.makedirs(annos_dir, exist_ok=True)
    link = os.path.join(annos_dir, "all_result.json")
    src = os.path.join(R1_DIR, "all_result.json")
    if not os.path.exists(link):
        os.symlink(src, link)

    from models.detr_speed import PostProcess
    from utils.speed_eval import SimplePoseSolver, speed_score

    with open(src) as f:
        world = np.asarray([item["pt"] for item in json.load(f)], np.float64)
    return PostProcess, SimplePoseSolver, speed_score, world
