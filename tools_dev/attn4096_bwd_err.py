import os, sys, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from satellite_pose_estimation_tpu.ops.fused_attention import fused_self_attention
B, H, T, D = 8, 8, 4096, 32
keys = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(keys[0], (B, H, T, D), jnp.bfloat16)
k = jax.random.normal(keys[1], (B, H, T, D), jnp.bfloat16)
v = jax.random.normal(keys[2], (B, H, T, D), jnp.bfloat16)
sm = 1.0 / np.sqrt(D)
def loss(q, k, v):
    return jnp.sum(fused_self_attention(q, k, v, sm).astype(jnp.float32))
try:
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    print("OK", float(jnp.sum(g[0].astype(jnp.float32)**2)))
except Exception:
    traceback.print_exc()
