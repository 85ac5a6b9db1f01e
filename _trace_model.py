import jax, numpy as np, jax.numpy as jnp, time, glob
from satellite_pose_estimation_tpu.models.detr import DETRConfig, DETRKeypointModel
from satellite_pose_estimation_tpu.train.state import TrainConfig, create_train_state
B = 256
cfg = DETRConfig(backbone="resnet50s8", enc_layers=4, dec_layers=4,
                 num_queries=20, dropout=0.0, dtype=jnp.bfloat16)
model = DETRKeypointModel(cfg)
rng = np.random.RandomState(0)
state = create_train_state(model, jax.random.PRNGKey(0),
                           jnp.zeros((B,224,224,3), jnp.float32), TrainConfig())
vars_ = {"params": state.params}
if state.batch_stats: vars_["batch_stats"] = state.batch_stats
fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
x = jnp.asarray(rng.rand(B,224,224,3), jnp.float32)
o = fwd(vars_, x); jax.block_until_ready(o)
jax.profiler.start_trace("/tmp/model_trace")
for _ in range(3):
    o = fwd(vars_, x)
jax.block_until_ready(o)
jax.profiler.stop_trace()
print("files:", glob.glob("/tmp/model_trace/**/*", recursive=True)[:10])
