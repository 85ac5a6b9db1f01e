"""Dev-only: validate the shipped fused-attention wrapper on the real chip
at the previously-failing 512-input config (T=4096), forward + backward,
across the batch sizes the train path actually uses. Prior failure mode:
compile-time "Scoped allocation with size 22.14M and limit 16.00M" at B=8
(XLA VMEM-pins the dq output). Fix under test: 128-row bwd strips +
input_output_aliases={0:0} on both directions.

Run: python tools_dev/attn4096_validate.py [batches...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from satellite_pose_estimation_tpu.ops.fused_attention import fused_self_attention as fused_attention

H, T, D = 8, 4096, 32
sm = 1.0 / np.sqrt(D)


def run(B: int):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (B, H, T, D), jnp.bfloat16)
    k = jax.random.normal(keys[1], (B, H, T, D), jnp.bfloat16)
    v = jax.random.normal(keys[2], (B, H, T, D), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(fused_attention(q, k, v, sm).astype(jnp.float32))

    fwd = jax.jit(loss)
    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    try:
        f = float(fwd(q, k, v))
        print(f"B={B} fwd OK sum={f:.2f}", flush=True)
    except Exception as e:
        head = str(e).split("\n")[0][:200]
        print(f"B={B} fwd FAIL {head}", flush=True)
        return
    try:
        g = grad(q, k, v)
        s = [float(jnp.sum(x.astype(jnp.float32) ** 2)) for x in g]
        print(f"B={B} bwd OK |dq|^2={s[0]:.2f} |dk|^2={s[1]:.2f} |dv|^2={s[2]:.2f}",
              flush=True)
    except Exception as e:
        head = str(e).split("\n")[0][:200]
        print(f"B={B} bwd FAIL {head}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for b in [int(x) for x in sys.argv[1:]] or [8, 16]:
        run(b)
