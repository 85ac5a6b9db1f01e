import jax, numpy as np, jax.numpy as jnp, time
from satellite_pose_estimation_tpu.models.detr import DETRConfig, DETRKeypointModel
from satellite_pose_estimation_tpu.train.state import TrainConfig, create_train_state
B = 256
rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(B,224,224,3), jnp.float32)
for flash in (False, True):
    cfg = DETRConfig(backbone="resnet50s8", enc_layers=4, dec_layers=4,
                     num_queries=20, dropout=0.0, dtype=jnp.bfloat16,
                     use_flash_attention=flash)
    model = DETRKeypointModel(cfg)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((2,224,224,3), jnp.float32), TrainConfig())
    vars_ = {"params": state.params}
    if state.batch_stats: vars_["batch_stats"] = state.batch_stats
    fwd = jax.jit(lambda v, xx: model.apply(v, xx, train=False))
    o = fwd(vars_, x); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(10): o = fwd(vars_, x)
    jax.block_until_ready(o)
    dt=(time.perf_counter()-t0)/10
    print(f"flash={flash}: {dt*1000:.1f} ms -> {B/dt:.0f} img/s", flush=True)
