"""End-to-end throughput benchmark (driver contract: ONE JSON line).

Measures the metric from BASELINE.md: end-to-end images/sec of the
device-resident eval pipeline crop -> keypoint model -> batched PnP ->
quaternion, on the flagship R1 config (resnet50s8 DETR, input 224, matching
the reference's measured ~125 img/s single-GPU eval, gen_single.sh /
R1/get_inference_time.py:20-35).

Scope note (honest-baseline framing): the headline starts from packed
DEVICE buffers — JPEG decode and host pack are excluded. The reference's
125 img/s INCLUDES its host dataloader: `time: 0.1606`/batch-20 decomposes
as model 0.102 + solver 0.009 + data 0.045 (R1/get_inference_time.py:20-35,
the columns sum). So the default vs_baseline is device-pipeline vs
host-inclusive. ``BENCH_HOST=1`` (with a rendered dataset at
BENCH_DATA_ROOT) additionally measures the sustained HOST-INCLUSIVE
pipeline — threaded JPEG decode -> pack -> prefetch -> device eval,
steady-state, decode-cache cold AND warm — and reports all three numbers
in the same JSON line (PERF.md round-4 table). Mind the host: this box has
1 core (~22 ms/frame decode); the reference machine ran a full CPU.
"""
import json
import os
import sys
import time

import numpy as np


def _host_pipeline_rates(root, eval_step, state, batch_size, jax):
    """Sustained host-inclusive throughput: threaded JPEG decode ->
    pack_crop -> collate -> prefetch -> device eval, chained dispatches,
    one block at the end (CLAUDE.md timing rules). Returns decode-cache
    cold and warm rates. The val-mode crop path is used (deterministic
    boxes); batches carry exactly the headline's keys so the device
    program matches the device-only measurement."""
    import os as _os

    from satellite_pose_estimation_tpu.data.dataset import SpeedTrainDataset
    from satellite_pose_estimation_tpu.data.prefetch import (
        prefetch_to_device,
    )

    pack = int(_os.environ.get("BENCH_PACK", "256"))

    def run_pass(ds, timed_images):
        n, outs = 0, []
        t0 = time.perf_counter()
        it = ds.batches(batch_size, shuffle=False, drop_last=True,
                        prefetch=4)
        keep = ("image", "clip_bbox_buf", "clip_bbox")
        slim = ({k: b[k] for k in keep} for b in it)
        for dev_batch in prefetch_to_device(slim, size=2):
            outs.append(eval_step(state, dev_batch)["quat_pr"])
            n += batch_size
            if n >= timed_images:
                break
        jax.block_until_ready(outs)
        return n / (time.perf_counter() - t0)

    results = {}
    n_timed = int(_os.environ.get("BENCH_HOST_IMAGES", "512"))
    saved_cache_env = _os.environ.get("SPE_DECODE_CACHE")
    try:
        # Untimed warm-up on one batch: the slimmed 3-key batch structure
        # retraces eval_step once; that compile must not be billed to the
        # decode-cold pass.
        _os.environ["SPE_DECODE_CACHE"] = "0"
        ds_warmup = SpeedTrainDataset(
            root, ann_file="wz_train.json", index_file="train_s.txt",
            train=False, pack_size=pack)
        run_pass(ds_warmup, batch_size)

        # cold: decode cache disabled — every frame decodes on the host
        ds_cold = SpeedTrainDataset(
            root, ann_file="wz_train.json", index_file="train_s.txt",
            train=False, pack_size=pack)
        results["host_cold_imgs_per_sec"] = round(
            run_pass(ds_cold, n_timed), 2)

        # warm: fill the cache with one untimed pass, then measure
        _os.environ["SPE_DECODE_CACHE"] = "2048"
        ds_warm = SpeedTrainDataset(
            root, ann_file="wz_train.json", index_file="train_s.txt",
            train=False, pack_size=pack)
        run_pass(ds_warm, n_timed)
        results["host_warm_imgs_per_sec"] = round(
            run_pass(ds_warm, n_timed), 2)
    finally:
        if saved_cache_env is None:
            _os.environ.pop("SPE_DECODE_CACHE", None)
        else:
            _os.environ["SPE_DECODE_CACHE"] = saved_cache_env
    return results


def main():
    import jax
    import jax.numpy as jnp

    from satellite_pose_estimation_tpu.models.detr import (
        DETRConfig,
        DETRKeypointModel,
    )
    from satellite_pose_estimation_tpu.train.state import (
        TrainConfig,
        create_train_state,
    )
    from satellite_pose_estimation_tpu.train.steps import make_eval_step

    batch_size = int(os.environ.get("BENCH_BATCH", "256"))
    input_size = int(os.environ.get("BENCH_INPUT", "224"))
    pack = int(os.environ.get("BENCH_PACK", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    mode = os.environ.get("BENCH_MODE", "eval")  # eval | train
    arch = os.environ.get("BENCH_ARCH", "detr")  # detr (R1) | rtdetr (R2)
    compute_dtype = jnp.bfloat16
    # BENCH_INT8: 0 (bf16) | 1 (dynamic int8) | static (calibrated PTQ).
    # The eval DEFAULT is the static-PTQ deployment path — the fastest
    # measured configuration (PERF.md int8-scope ablation; accuracy drift
    # vs float on a trained flagship: +0.0038 SPEED score). Training is
    # never quantized.
    int8_mode = os.environ.get(
        "BENCH_INT8", "static" if mode == "eval" else "0"
    )

    if arch == "rtdetr":
        from satellite_pose_estimation_tpu.models.rtdetr import (
            RTDETR,
            RTDETRConfig,
        )

        input_size = int(os.environ.get("BENCH_INPUT", "256"))
        model = RTDETR(RTDETRConfig(depth=50, expansion=0.5,
                                    dtype=compute_dtype))
    else:
        cfg = DETRConfig(
            backbone="resnet50s8",
            enc_layers=4,
            dec_layers=4,
            num_queries=20,
            dropout=0.0,
            use_flash_attention=os.environ.get("BENCH_FLASH", "0") == "1",
            quantize_int8=int8_mode in ("1", "static"),
            dtype=compute_dtype,
        )
        model = DETRKeypointModel(cfg)
    # Init at batch 2: parameter shapes are batch-independent, and a
    # batch-256 init program would peak ~5 GB (dynamic-int8 attention
    # materializes int32 scores) while the batch pool is being staged —
    # enough to OOM the chip before timing even starts.
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        jnp.zeros((2, input_size, input_size, 3), jnp.float32),
        TrainConfig(),
    )

    # A pool of DISTINCT device-resident batches, cycled during timing: the
    # remote runtime may shortcut repeated executions on identical buffers,
    # which would overstate throughput.
    rng = np.random.RandomState(0)
    n_pool = max(4, iters)  # fully distinct batches: repeated (fn, args)
    # executions can be deduped by the remote runtime, overstating throughput
    pool = []
    for _ in range(n_pool):
        pool.append({
            "image": jnp.asarray(
                rng.randint(0, 255, (batch_size, pack, pack, 3)), jnp.uint8
            ),
            "clip_bbox_buf": jnp.tile(
                jnp.asarray([8.0, 8.0, 248.0, 248.0], jnp.float32),
                (batch_size, 1),
            ),
            "clip_bbox": jnp.tile(
                jnp.asarray([700.0, 400.0, 1100.0, 800.0], jnp.float32),
                (batch_size, 1),
            ),
        })
    batch = pool[0]
    extra = {}

    if mode == "train":
        import jax.random as jrandom

        from satellite_pose_estimation_tpu.data.augment import AugmentConfig
        from satellite_pose_estimation_tpu.losses.criterion import (
            CriterionConfig,
        )
        from satellite_pose_estimation_tpu.train.steps import make_train_step

        rng2 = np.random.RandomState(1)
        train_batch = {
            "image": batch["image"],
            "clip_bbox_buf": batch["clip_bbox_buf"],
            "landmarks_buf": jnp.asarray(
                rng2.rand(batch_size, 11, 2) * 200 + 20, jnp.float32
            ),
            "labels": jnp.tile(
                jnp.arange(11, dtype=jnp.int32)[None], (batch_size, 1)
            ),
        }
        # R2 arch trains with its shipped recipe's criterion shape
        # (sigmoid matcher cost via the shared use_focal_loss global, CE
        # labels + Laplace-KL point loss, eos 1e-4 — mirrors
        # R2/configs/rtdetr_speed/include/rtdetr_r50vd.yml).
        crit = (
            CriterionConfig(point_loss="uncert", use_focal=True,
                            eos_coef=1e-4)
            if arch == "rtdetr" else CriterionConfig()
        )
        step = make_train_step(
            crit, TrainConfig(),
            AugmentConfig(out_size=input_size),
            # BENCH_PALLAS_AUG=1 routes the photometric chain through the
            # fused Pallas kernel (ops/pallas_augment.py, TPU only)
            use_pallas_augment=os.environ.get("BENCH_PALLAS_AUG", "0") == "1",
        )
        state, losses = step(state, train_batch, jrandom.PRNGKey(0))
        jax.block_until_ready(losses)
        t0 = time.perf_counter()
        for i in range(iters):
            # distinct RNG keys already vary the computation per step
            state, losses = step(state, train_batch, jrandom.PRNGKey(i + 1))
        jax.block_until_ready(losses)
        dt = time.perf_counter() - t0
        imgs_per_sec = batch_size * iters / dt
        metric = ("end-to-end train images/sec/chip "
                  "(aug->model->match->loss->opt"
                  + (", RT-DETR r50vd" if arch == "rtdetr" else "") + ")")
        baseline = 125.0
    else:
        solver_kind = "sigma" if arch == "rtdetr" else "simple"
        # int8 modes: DETR quantizes via its config flag; RT-DETR via the
        # trace-time quantized_inference() context (active during calibration
        # and the first -- tracing -- eval_step call).
        import contextlib

        if arch == "rtdetr" and int8_mode in ("1", "static"):
            from satellite_pose_estimation_tpu.ops.quantize import (
                quantized_inference as qctx,
            )
        else:
            qctx = contextlib.nullcontext
        quant = None
        if int8_mode == "static":
            try:
                from satellite_pose_estimation_tpu.ops.image_warp import (
                    crop_resize_cubic_mxu as crop_resize_cubic,
                )
                from satellite_pose_estimation_tpu.utils.calibrate import (
                    calibrate_act_scales,
                )

                with qctx():
                    warp = jax.jit(jax.vmap(
                        lambda img, bb: crop_resize_cubic(
                            img, bb, input_size, True)
                    ))
                    calib_imgs = [
                        warp(pool[i]["image"], pool[i]["clip_bbox_buf"])
                        for i in range(2)
                    ]
                    variables = {"params": state.params}
                    if state.batch_stats:
                        variables["batch_stats"] = state.batch_stats
                    quant = calibrate_act_scales(
                        model, variables, calib_imgs, train=False
                    )
            except Exception as e:  # robust headline: fall back to bf16
                print(f"calibration failed ({e!r}); falling back to bf16",
                      file=sys.stderr)
                int8_mode = "0"
                if arch == "rtdetr":
                    qctx = contextlib.nullcontext
                else:
                    import dataclasses

                    model = DETRKeypointModel(
                        dataclasses.replace(cfg, quantize_int8=False)
                    )
                    # eval_step runs state.apply_fn — rebind it to the
                    # float model or the "bf16" fallback would silently
                    # measure the dynamic-int8 program.
                    state = state.replace(apply_fn=model.apply)
        def time_eval(step_fn, st):
            res = step_fn(st, batch)
            jax.block_until_ready(res)
            t0 = time.perf_counter()
            outs = []
            for i in range(iters):
                outs.append(step_fn(st, pool[i % n_pool])["quat_pr"])
            jax.block_until_ready(outs)
            return batch_size * iters / (time.perf_counter() - t0)

        with qctx():
            eval_step = make_eval_step(
                out_size=input_size, solver=solver_kind, quant=quant
            )
            imgs_per_sec = time_eval(eval_step, state)
        if int8_mode == "static":
            # Companion bf16 number in the same artifact (the int8 headline
            # should not hide the float baseline): same state, float model.
            extra["int8_static_imgs_per_sec"] = round(imgs_per_sec, 2)
            if arch == "detr":
                import dataclasses

                model_f = DETRKeypointModel(
                    dataclasses.replace(cfg, quantize_int8=False)
                )
                state_f = state.replace(apply_fn=model_f.apply)
            else:
                state_f = state  # RT-DETR quantizes via the trace context
            eval_f = make_eval_step(out_size=input_size, solver=solver_kind)
            extra["bf16_imgs_per_sec"] = round(time_eval(eval_f, state_f), 2)
        metric = ("end-to-end eval images/sec/chip (crop->keypoints->PnP)"
                  if arch == "detr" else
                  "end-to-end eval images/sec/chip (crop->keypoints->"
                  "sigma-PnP, RT-DETR r50vd)")
        baseline = 125.0  # reference single-GPU eval throughput
        # (NB: the reference number is HOST-INCLUSIVE — see module
        # docstring; BENCH_HOST=1 measures the comparable pipeline here.)

        # Host-inclusive pipeline keys ride in the SAME artifact whenever a
        # rendered dataset is present (VERDICT r4 item 6: the headline JSON
        # should self-contain its host-side caveat numbers instead of
        # leaving them in PERF.md prose). BENCH_HOST=0 disables; =1 forces
        # (warning if the dataset is missing); unset = auto.
        host_mode = os.environ.get("BENCH_HOST", "auto")
        if host_mode != "0":
            root = os.environ.get("BENCH_DATA_ROOT", "/tmp/synth_r4")
            ann = os.path.join(root, "annos/wz_train.json")
            if not os.path.exists(ann):
                if host_mode == "1":
                    print(f"BENCH_HOST: no dataset at {root}; skipping",
                          file=sys.stderr)
            else:
                with qctx():
                    host = _host_pipeline_rates(
                        root, eval_step, state, batch_size, jax
                    )
                extra.update(host)

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(imgs_per_sec / baseline, 3),
                "mode": ({"0": "bf16", "1": "int8-dynamic",
                          "static": "int8-static-ptq"}[int8_mode]
                         if mode == "eval" else "bf16-train"),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
