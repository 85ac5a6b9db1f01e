import time, numpy as np, jax, jax.numpy as jnp
from satellite_pose_estimation_tpu.models.detr import DETRConfig, DETRKeypointModel
from satellite_pose_estimation_tpu.train.state import TrainConfig, create_train_state
from satellite_pose_estimation_tpu.ops.image_warp import crop_resize_cubic
from satellite_pose_estimation_tpu.geometry.camera import WORLD_POINTS
from satellite_pose_estimation_tpu.geometry.solvers import solve_pose_simple, SolverConfig

B = 128
cfg = DETRConfig(backbone="resnet50s8", enc_layers=4, dec_layers=4,
                 num_queries=20, dropout=0.0, dtype=jnp.bfloat16)
model = DETRKeypointModel(cfg)
state = create_train_state(model, jax.random.PRNGKey(0),
                           jnp.zeros((B,224,224,3), jnp.float32), TrainConfig())
rng = np.random.RandomState(0)
imgs = jnp.asarray(rng.randint(0,255,(B,256,256,3)), jnp.uint8)
bbs = jnp.tile(jnp.float32([8,8,248,248]), (B,1))

warp = jax.jit(jax.vmap(lambda i,b: crop_resize_cubic(i,b,224,True)))
vars_ = {"params": state.params}
if state.batch_stats: vars_["batch_stats"] = state.batch_stats
fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

world = jnp.asarray(WORLD_POINTS, jnp.float32)
solver = jax.jit(jax.vmap(lambda p,l: solve_pose_simple(world,p,l,SolverConfig())))

def bench(name, fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    dt=(time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1000:.1f} ms/batch -> {B/dt:.0f} img/s", flush=True)
    return out

x = bench("warp", warp, imgs, bbs)
out = bench("model", fwd, vars_, x)
probs = jax.nn.softmax(out["pred_logits"], -1)
pts = out["pred_points"]*400 + 700
pts = pts.astype(jnp.float32)
bench("solver", solver, pts, probs)
