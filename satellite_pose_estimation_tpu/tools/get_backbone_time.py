"""Backbone latency micro-benchmark (R1/get_backbone_time.py surface):
compares resnet50 s16 tap vs the s8 fusion backbone over --test_num iters.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_backbone(name, module, x, iters):
    """Distinct inputs per iteration + a scalar host fetch as the sync —
    repeated identical dispatches and bare block_until_ready both overstate
    throughput on the remote-TPU tunnel (PERF.md methodology)."""
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    fwd = jax.jit(lambda v, x_: module.apply(v, x_, train=False))
    rng = np.random.RandomState(1)
    pool = [x] + [
        jnp.asarray(rng.rand(*x.shape), x.dtype) for _ in range(3)
    ]

    def scalarize(out):
        return jnp.sum(
            jnp.asarray(jax.tree_util.tree_leaves(out)[0], jnp.float32)
        )

    float(scalarize(fwd(variables, pool[0])))  # compile + true sync
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(iters):
        acc = acc + scalarize(fwd(variables, pool[i % len(pool)]))
    float(acc)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt * 1000:.2f} ms/batch "
          f"({x.shape[0] / dt:.0f} img/s)")


def main(args):
    from ..models.resnet import Backbone8s, ResNet

    x = jnp.asarray(
        np.random.RandomState(0).rand(
            args.batch_size, args.input_size, args.input_size, 3
        ),
        jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    bench_backbone(
        "resnet50 s16", ResNet(arch="resnet50", taps=(3,), dtype=dtype),
        x, args.test_num,
    )
    bench_backbone(
        "resnet50 s8 (Backbone8s)", Backbone8s(dtype=dtype), x, args.test_num
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=20)
    parser.add_argument("--input_size", type=int, default=224)
    parser.add_argument("--test_num", type=int, default=200)
    parser.add_argument("--bf16", action="store_true")
    main(parser.parse_args())
