import jax, numpy as np
import jax.numpy as jnp
from satellite_pose_estimation_tpu.ops.pallas_augment import fused_photometric_pallas, IMAGENET_MEAN, IMAGENET_STD
rng = np.random.RandomState(0)
B, S = 4, 256
imgs = jnp.asarray(rng.rand(B, S, S, 3) * 255, jnp.float32)
scalars = np.zeros((B, 8), np.float32)
scalars[:, 2] = 1.0; scalars[:, 1] = 10.0  # noise on
scalars[:, 3] = 1.0                         # cutout on
holes = np.zeros((B, 10, 4), np.int32); holes[:, 0] = [30, 30, 40, 40]
out = np.asarray(fused_photometric_pallas(imgs, jnp.asarray(scalars), jnp.asarray(holes), 7))
ref = (np.asarray(imgs)/255.0 - IMAGENET_MEAN)/IMAGENET_STD
resid = (out - ref) * IMAGENET_STD * 255.0
zero_norm = (0.0 - IMAGENET_MEAN)/IMAGENET_STD
print("TPU pallas: noise std", resid[:, 150:, 150:].std(), "cutout ok:", np.allclose(out[0, 40, 40], zero_norm, atol=1e-5))
import time
jitted = jax.jit(lambda i: fused_photometric_pallas(i, jnp.asarray(scalars), jnp.asarray(holes), 7))
o = jitted(imgs); jax.block_until_ready(o)
t0=time.perf_counter()
for _ in range(20): o = jitted(imgs)
jax.block_until_ready(o)
print("pallas photometric:", (time.perf_counter()-t0)/20*1000, "ms for batch", B)
