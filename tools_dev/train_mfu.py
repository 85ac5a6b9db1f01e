"""Train-step MFU statement (PERF.md): FLOPs of the full train step from
XLA cost analysis vs the measured step time and the practical roofline.

The FLOP count comes from the lowered train-step HLO (CPU compile — the
count is a property of the program, not the backend); the step time is
bench.py's hardware measurement (BENCH_MODE=train). MFU here is quoted
against BOTH the practical roofline measured on this chip via chained
dispatches (111-164 TF/s bf16, PERF.md) and the v5e paper number (197T).

    python tools_dev/train_mfu.py --batch 128 --input 224 --ms 182
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--input", type=int, default=224)
    ap.add_argument("--ms", type=float, default=None,
                    help="measured hardware step time (ms) to convert to MFU")
    ap.add_argument("--flash", action="store_true")
    args = ap.parse_args()

    from satellite_pose_estimation_tpu.data.augment import AugmentConfig
    from satellite_pose_estimation_tpu.losses.criterion import CriterionConfig
    from satellite_pose_estimation_tpu.models.detr import (
        DETRConfig,
        DETRKeypointModel,
    )
    from satellite_pose_estimation_tpu.train.state import (
        TrainConfig,
        create_train_state,
    )
    from satellite_pose_estimation_tpu.train.steps import make_train_step

    cfg = DETRConfig(backbone="resnet50s8", enc_layers=4, dec_layers=4,
                     num_queries=20, dropout=0.0,
                     use_flash_attention=args.flash, dtype=jnp.bfloat16)
    model = DETRKeypointModel(cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((2, args.input, args.input, 3), jnp.float32), TrainConfig())

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(
            rng.randint(0, 255, (args.batch, 256, 256, 3)), jnp.uint8),
        "clip_bbox_buf": jnp.tile(
            jnp.asarray([8.0, 8.0, 248.0, 248.0], jnp.float32),
            (args.batch, 1)),
        "landmarks_buf": jnp.asarray(
            rng.rand(args.batch, 11, 2) * 200 + 20, jnp.float32),
        "labels": jnp.tile(jnp.arange(11, dtype=jnp.int32)[None],
                           (args.batch, 1)),
    }
    step = make_train_step(CriterionConfig(), TrainConfig(),
                           AugmentConfig(out_size=args.input))
    lowered = step.lower(state, batch, jax.random.PRNGKey(1))
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    flops = float(analysis.get("flops", 0.0))
    print(f"train step FLOPs (batch {args.batch} @ {args.input}): "
          f"{flops/1e12:.3f} TFLOP  ({flops/args.batch/1e9:.2f} GFLOP/img)")
    if args.ms:
        tfs = flops / (args.ms / 1e3) / 1e12
        print(f"at {args.ms} ms/step: {tfs:.1f} TFLOP/s")
        for name, roof in (("practical-low", 111.0), ("practical-high", 164.0),
                           ("paper", 197.0)):
            print(f"  MFU vs {name} ({roof:.0f} TF/s): {tfs/roof*100:.1f}%")


if __name__ == "__main__":
    main()
