"""End-to-end inference timing breakdown (R1/get_inference_time.py
equivalent — but measured live instead of parsing a pasted log): reports
model / solver / total per-batch times and images/sec for the flagship
pipeline at the reference's measurement point (batch 20, input 224).
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(args):
    from ..geometry.camera import WORLD_POINTS
    from ..geometry.solvers import SolverConfig, solve_pose_simple
    from ..models.detr import DETRConfig, DETRKeypointModel
    from ..ops.image_warp import crop_resize_cubic
    from ..train.state import TrainConfig, create_train_state

    B = args.batch_size
    S = args.input_size
    cfg = DETRConfig(
        backbone="resnet50s8", enc_layers=4, dec_layers=4, num_queries=20,
        dropout=0.0,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    model = DETRKeypointModel(cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((B, S, S, 3), jnp.float32),
        TrainConfig(),
    )
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (B, 256, 256, 3)), jnp.uint8)
    bbs = jnp.tile(jnp.float32([8, 8, 248, 248]), (B, 1))

    warp = jax.jit(jax.vmap(lambda i, b: crop_resize_cubic(i, b, S, True)))
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))
    world = jnp.asarray(WORLD_POINTS, jnp.float32)
    solver = jax.jit(
        jax.vmap(lambda p, l: solve_pose_simple(world, p, l, SolverConfig()))
    )

    def timeit(fn, *a, iters=args.test_num):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters, out

    t_warp, x = timeit(warp, imgs, bbs)
    t_model, out = timeit(fwd, state.params, x)
    probs = jax.nn.softmax(out["pred_logits"], -1)
    pts = (out["pred_points"] * 400 + 700).astype(jnp.float32)
    t_solver, _ = timeit(solver, pts, probs)

    total = t_warp + t_model + t_solver
    print(f"batch {B} input {S}:")
    print(f"  data/warp: {t_warp * 1000:.2f} ms")
    print(f"  model:     {t_model * 1000:.2f} ms")
    print(f"  solver:    {t_solver * 1000:.2f} ms")
    print(f"  total:     {total * 1000:.2f} ms -> {B / total:.0f} img/s")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=20)
    parser.add_argument("--input_size", type=int, default=224)
    parser.add_argument("--test_num", type=int, default=20)
    parser.add_argument("--bf16", action="store_true")
    main(parser.parse_args())
