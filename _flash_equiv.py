import jax, numpy as np, jax.numpy as jnp
from satellite_pose_estimation_tpu.ops.flash_attention import flash_self_attention
rng = np.random.RandomState(0)
B, H, T, D = 2, 8, 784, 32
q = jnp.asarray(rng.randn(B,H,T,D), jnp.float32)
k = jnp.asarray(rng.randn(B,H,T,D), jnp.float32)
v = jnp.asarray(rng.randn(B,H,T,D), jnp.float32)
scale = 1.0/np.sqrt(D)
ref = jax.nn.softmax((q @ k.transpose(0,1,3,2)) * scale, axis=-1) @ v
out = flash_self_attention(q, k, v, sm_scale=scale)
ref, out = jax.device_get((ref, out))
print("flash vs plain max abs diff:", np.abs(ref-out).max())
