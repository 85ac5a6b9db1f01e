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
    # DISTINCT inputs per iteration + a scalar host fetch as the sync: on
    # the remote-TPU tunnel, repeating identical (fn, args) pairs and
    # trusting block_until_ready both overstate throughput (see PERF.md).
    n_pool = 4
    img_pool = [
        jnp.asarray(rng.randint(0, 255, (B, 256, 256, 3)), jnp.uint8)
        for _ in range(n_pool)
    ]
    bbs = jnp.tile(jnp.float32([8, 8, 248, 248]), (B, 1))

    warp = jax.jit(jax.vmap(lambda i, b: crop_resize_cubic(i, b, S, True)))
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats  # FrozenBN stats
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    world = jnp.asarray(WORLD_POINTS, jnp.float32)
    solver = jax.jit(
        jax.vmap(lambda p, l: solve_pose_simple(world, p, l, SolverConfig()))
    )

    def scalarize(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.sum(jnp.asarray(leaf, jnp.float32))

    def timeit(fn, arg_pool, iters=args.test_num):
        out = fn(*arg_pool[0])
        float(scalarize(out))  # compile + true host sync
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for i in range(iters):
            out = fn(*arg_pool[i % len(arg_pool)])
            acc = acc + scalarize(out)
        float(acc)
        return (time.perf_counter() - t0) / iters, out

    t_warp, x = timeit(warp, [(im, bbs) for im in img_pool])
    x_pool = [warp(im, bbs) for im in img_pool]
    t_model, out = timeit(fwd, [(variables, xx) for xx in x_pool])
    solver_pool = []
    for xx in x_pool:
        o = fwd(variables, xx)
        solver_pool.append((
            (o["pred_points"] * 400 + 700).astype(jnp.float32),
            jax.nn.softmax(o["pred_logits"], -1),
        ))
    t_solver, _ = timeit(solver, solver_pool)

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
