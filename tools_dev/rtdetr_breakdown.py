"""Dev-only: stage-level timing breakdown of the RT-DETR r50vd eval on TPU.

Explains the gap between the R2 flagship eval throughput (1084 img/s int8
@256, PERF.md Round 3) and the R1 DETR r50s8's 2844 img/s: which of
backbone / hybrid-encoder / decoder / crop / PnP-tail carries the time.

Methodology per CLAUDE.md: pool of distinct inputs, chained scalar
accumulation across dispatches, ONE host sync at the end.

Env: RB_BATCH (256), RB_ITERS (10), RB_INPUT (256), RB_STAGES (csv filter).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("RB_BATCH", "256"))
ITERS = int(os.environ.get("RB_ITERS", "10"))
INPUT = int(os.environ.get("RB_INPUT", "256"))
STAGES = os.environ.get("RB_STAGES", "").split(",") if os.environ.get("RB_STAGES") else None


def _scalarize(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in leaves[:2])


def timeit(name, fn, pool):
    acc = _scalarize(fn(pool[0])) + _scalarize(fn(pool[1 % len(pool)]))
    float(acc)  # true host sync over the tunnel
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(ITERS):
        acc = acc + _scalarize(fn(pool[i % len(pool)]))
    _ = float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:40s} {dt*1e3:9.2f} ms/iter  {B/dt:9.0f} img/s", flush=True)
    return dt


def want(name):
    return STAGES is None or name in STAGES


def main():
    from satellite_pose_estimation_tpu.models.rtdetr import RTDETR, RTDETRConfig
    from satellite_pose_estimation_tpu.models.presnet import PResNet
    from satellite_pose_estimation_tpu.models.hybrid_encoder import HybridEncoder
    from satellite_pose_estimation_tpu.models.rtdetr_decoder import RTDETRTransformer
    from satellite_pose_estimation_tpu.train.state import TrainConfig, create_train_state
    from satellite_pose_estimation_tpu.train.steps import make_eval_step

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    def pool_of(shape, n=4, dtype=jnp.bfloat16):
        return [jnp.asarray(rng.randn(*shape), dtype) for _ in range(n)]

    # --- full eval step (crop -> model -> sigma-PnP), bf16 path.
    # The model/int8 stages reuse this block's state, so wanting either
    # implies the setup (RB_STAGES=int8 alone still works).
    if want("eval") or want("model") or want("int8"):
        model = RTDETR(RTDETRConfig(depth=50, expansion=0.5, dtype=dt))
        state = create_train_state(
            model, key, jnp.zeros((2, INPUT, INPUT, 3), jnp.float32),
            TrainConfig())
        if want("eval"):
            step = make_eval_step(out_size=INPUT, solver="sigma")
            epool = []
            for _ in range(4):
                epool.append({
                    "image": jnp.asarray(
                        rng.randint(0, 255, (B, 256, 256, 3)), jnp.uint8),
                    "clip_bbox_buf": jnp.tile(
                        jnp.float32([8, 8, 248, 248]), (B, 1)),
                    "clip_bbox": jnp.tile(
                        jnp.float32([700, 400, 1100, 800]), (B, 1)),
                })
            timeit("full eval step (bf16)",
                   lambda b: step(state, b)["quat_pr"], epool)

        # model forward only (same params, pre-cropped input)
        fpool = pool_of((B, INPUT, INPUT, 3), dtype=jnp.float32)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        fwd = jax.jit(lambda x: model.apply(variables, x, train=False))
        if want("model"):
            timeit("model fwd (bf16, pre-cropped)", fwd, fpool)

        # int8 static-PTQ forward, same methodology as bench.py
        if want("int8"):
            from satellite_pose_estimation_tpu.ops.quantize import (
                quantized_inference)
            from satellite_pose_estimation_tpu.utils.calibrate import (
                calibrate_act_scales)

            with quantized_inference():
                quant = calibrate_act_scales(
                    model, variables, fpool[:2], train=False)
                vq = dict(variables)
                vq["quant"] = quant
                fwd_q = jax.jit(
                    lambda x: model.apply(vq, x, train=False))
                timeit("model fwd (int8 static-PTQ)", fwd_q, fpool)

    # --- backbone alone
    if want("backbone"):
        bb = PResNet(depth=50, freeze_norm=True, dtype=dt)
        v = bb.init(key, jnp.zeros((2, INPUT, INPUT, 3), jnp.float32))
        f = jax.jit(lambda x: bb.apply(v, x, train=False))
        timeit("backbone PResNet50vd", f, pool_of((B, INPUT, INPUT, 3),
                                                  dtype=jnp.float32))

    # --- hybrid encoder alone (feats for 256 input: 32/16/8 maps)
    if want("encoder"):
        s8 = INPUT // 8
        enc = HybridEncoder(in_channels=(512, 1024, 2048), expansion=0.5,
                            dtype=dt)
        feats0 = [jnp.zeros((2, s8, s8, 512), dt),
                  jnp.zeros((2, s8 // 2, s8 // 2, 1024), dt),
                  jnp.zeros((2, s8 // 4, s8 // 4, 2048), dt)]
        v = enc.init(key, feats0)
        f = jax.jit(lambda xs: enc.apply(v, xs, train=False))
        pools = list(zip(pool_of((B, s8, s8, 512)),
                         pool_of((B, s8 // 2, s8 // 2, 1024)),
                         pool_of((B, s8 // 4, s8 // 4, 2048))))
        pools = [list(t) for t in pools]
        timeit("hybrid encoder (AIFI+CCFM)", f, pools)

    # --- decoder alone (3 hidden-256 maps)
    if want("decoder"):
        s8 = INPUT // 8
        dec = RTDETRTransformer(num_classes=11, dtype=dt)
        feats0 = [jnp.zeros((2, s8, s8, 256), dt),
                  jnp.zeros((2, s8 // 2, s8 // 2, 256), dt),
                  jnp.zeros((2, s8 // 4, s8 // 4, 256), dt)]
        v = dec.init(key, feats0)
        f = jax.jit(lambda xs: dec.apply(v, xs, train=False))
        pools = list(zip(pool_of((B, s8, s8, 256)),
                         pool_of((B, s8 // 2, s8 // 2, 256)),
                         pool_of((B, s8 // 4, s8 // 4, 256))))
        pools = [list(t) for t in pools]
        timeit("decoder (topk+deform-attn x3)", f, pools)

    # --- crop warp alone
    if want("crop"):
        from satellite_pose_estimation_tpu.ops.image_warp import (
            crop_resize_cubic_mxu)
        warp = jax.jit(jax.vmap(
            lambda img, bb: crop_resize_cubic_mxu(img, bb, INPUT, True)))
        cpool = [(jnp.asarray(rng.randint(0, 255, (B, 256, 256, 3)),
                              jnp.uint8),
                  jnp.tile(jnp.float32([8, 8, 248, 248]), (B, 1)))
                 for _ in range(4)]
        timeit("crop+cubic resize", lambda t: warp(*t), cpool)

    # --- sigma-PnP tail alone (the R2 headline self-assessed solver)
    if want("pnp"):
        from satellite_pose_estimation_tpu.geometry.solvers import (
            solve_pose_self_assessed_batch)
        from satellite_pose_estimation_tpu.geometry.camera import (
            load_world_points)

        world = jnp.asarray(load_world_points(), jnp.float32)
        nw, Q = world.shape[0], 30

        def tail(t):
            pts, probs, sig, areas = t
            return solve_pose_self_assessed_batch(world, pts, probs, sig,
                                                  areas)

        tail_j = jax.jit(tail)
        ppool = [(jnp.asarray(rng.rand(B, Q, 2) * 1000, jnp.float32),
                  jnp.asarray(rng.rand(B, Q, nw + 1), jnp.float32),
                  jnp.asarray(rng.rand(B, Q, 2) * 4 + 1, jnp.float32),
                  jnp.asarray(rng.rand(B) * 5e4 + 1e4, jnp.float32))
                 for _ in range(4)]
        try:
            timeit("sigma-PnP tail (self-assessed)", tail_j, ppool)
        except Exception as e:
            print(f"pnp stage skipped: {e!r}")


if __name__ == "__main__":
    main()
