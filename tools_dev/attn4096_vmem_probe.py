"""Probe: which q-row strip heights actually compile on the real chip at
T=4096 (512-input DETR encoder), for the fused attention forward and
backward Pallas kernels. The Mosaic scoped-vmem accounting is opaque (the
bwd kernel holds ~5.5 score-strip f32 equivalents live, not the naive 2),
so the shipped strip picker is calibrated against THIS probe's results.

Run on the axon TPU: python tools_dev/attn4096_vmem_probe.py fwd 512
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from satellite_pose_estimation_tpu.ops import fused_attention as fa


def probe(which: str, rows: int, B=2, H=8, T=4096, D=32):
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(k[0], (B, H, T, D), jnp.bfloat16)
    kk = jax.random.normal(k[1], (B, H, T, D), jnp.bfloat16)
    v = jax.random.normal(k[2], (B, H, T, D), jnp.bfloat16)
    g = jax.random.normal(k[3], (B, H, T, D), jnp.bfloat16)
    sm = 1.0 / np.sqrt(D)

    if rows == 0:
        # rows=0 sentinel: exercise the SHIPPED wrappers (strip picker +
        # input_output_aliases) exactly as the train/eval programs do.
        if which == "fwd":
            fn = jax.jit(lambda q, k, v: fa._fused_tpu(q, k, v, sm))
            args = (q, kk, v)
        else:
            fn = jax.jit(lambda q, k, v, g: fa._bwd_tpu(q, k, v, g, sm))
            args = (q, kk, v, g)
        t0 = time.time()
        try:
            out = fn(*args)
            o = out[0] if isinstance(out, (tuple, list)) else out
            s = float(jnp.sum(o.astype(jnp.float32)))
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(f"{which} shipped: FAIL {msg}", flush=True)
            return False
        print(f"{which} shipped: OK sum={s:.3f}", flush=True)
        return True

    qspec = pl.BlockSpec((1, 1, rows, D), lambda b, h, i: (b, h, i, 0))
    kvspec = pl.BlockSpec((1, 1, T, D), lambda b, h, i: (b, h, 0, 0))
    if which == "fwd":
        fn = jax.jit(lambda q, k, v: pl.pallas_call(
            fa._attn_kernel,
            grid=(B, H, T // rows),
            in_specs=[qspec, kvspec, kvspec],
            out_specs=qspec,
            out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        )(q, k, v))
        args = (q, kk, v)
    else:
        fn = jax.jit(lambda q, k, v, g: pl.pallas_call(
            fa._attn_bwd_kernel,
            grid=(B, H, T // rows),
            in_specs=[qspec, kvspec, kvspec, qspec],
            out_specs=[qspec, kvspec, kvspec],
            out_shape=[
                jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
                jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
                jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
            ],
        )(q, k, v, g))
        args = (q, kk, v, g)

    try:
        out = fn(*args)
        o = out[0] if isinstance(out, (tuple, list)) else out
        # TRUE host sync — compile/dispatch errors through the axon tunnel
        # only surface at a host read (block_until_ready is not enough).
        s = float(jnp.sum(o.astype(jnp.float32)))
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{which} rows={rows}: FAIL {msg}", flush=True)
        return False
    t0 = time.time()
    for _ in range(5):
        r = fn(*args)
        o = r[0] if isinstance(r, (tuple, list)) else r
    _ = float(jnp.sum(o.astype(jnp.float32)))
    dt = (time.time() - t0) / 5 * 1000
    print(f"{which} rows={rows}: OK sum={s:.3f} ~{dt:.1f} ms/call", flush=True)
    return True


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    B = int(os.environ.get("PROBE_B", "2"))
    rows_list = [int(r) for r in sys.argv[2:]] or [512, 256, 128, 64]
    print("backend:", jax.default_backend(), "B:", B, flush=True)
    for rows in rows_list:
        probe(which, rows, B=B)
