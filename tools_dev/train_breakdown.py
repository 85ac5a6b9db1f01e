"""Dev-only: stage-level timing breakdown of the flagship TRAIN step on TPU.

Dissects the 182 ms @128 train step (PERF.md) into augment / forward+loss /
grad / full-step components, and A/Bs the XLA augment chain against the
fused Pallas kernel (ops/pallas_augment.py). Methodology per CLAUDE.md:
pool of distinct inputs, chain dispatches, block once at the end.

    TB_BATCH=128 TB_INPUT=224 python tools_dev/train_breakdown.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("TB_BATCH", "128"))
INPUT = int(os.environ.get("TB_INPUT", "224"))
ITERS = int(os.environ.get("TB_ITERS", "10"))


def timeit(name, fn, args_pool):
    outs = fn(*args_pool[0])
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    res = []
    for i in range(ITERS):
        res.append(jax.tree_util.tree_leaves(fn(*args_pool[i % len(args_pool)]))[0])
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt*1e3:9.2f} ms/iter  {B/dt:9.0f} img/s", flush=True)
    return dt


def timeit_step(name, step, state, pools, keys):
    """Like timeit, but threads the (donated) train state through the
    chain — make_train_step donates argnum 0, so reusing one state
    object across calls raises 'Buffer has been deleted or donated'."""
    st, losses = step(state, pools[0], keys[0])
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    last = None
    for i in range(ITERS):
        st, last = step(st, pools[i % len(pools)], keys[i % len(keys)])
    jax.block_until_ready(last)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt*1e3:9.2f} ms/iter  {B/dt:9.0f} img/s", flush=True)
    return dt


def main():
    from satellite_pose_estimation_tpu.data.augment import (
        AugmentConfig,
        augment_batch,
        augment_batch_pallas,
    )
    from satellite_pose_estimation_tpu.losses.criterion import (
        CriterionConfig,
        set_criterion,
    )
    from satellite_pose_estimation_tpu.models.detr import (
        DETRConfig,
        DETRKeypointModel,
    )
    from satellite_pose_estimation_tpu.train.state import (
        TrainConfig,
        create_train_state,
    )
    from satellite_pose_estimation_tpu.train.steps import make_train_step

    cfg = DETRConfig(backbone="resnet50s8", enc_layers=4, dec_layers=4,
                     num_queries=20, dropout=0.0, dtype=jnp.bfloat16)
    model = DETRKeypointModel(cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((2, INPUT, INPUT, 3), jnp.float32), TrainConfig())

    rng = np.random.RandomState(0)
    n_pool = max(4, ITERS)
    pools = []
    for _ in range(n_pool):
        pools.append({
            "image": jnp.asarray(
                rng.randint(0, 255, (B, 256, 256, 3)), jnp.uint8),
            "clip_bbox_buf": jnp.tile(
                jnp.asarray([8.0, 8.0, 248.0, 248.0], jnp.float32), (B, 1)),
            "landmarks_buf": jnp.asarray(
                rng.rand(B, 11, 2) * 200 + 20, jnp.float32),
            "labels": jnp.tile(jnp.arange(11, dtype=jnp.int32)[None], (B, 1)),
        })
    keys = [jax.random.PRNGKey(i) for i in range(n_pool)]
    aug_cfg = AugmentConfig(out_size=INPUT)
    crit_cfg = CriterionConfig()

    # --- augment alone, both impls
    aug_x = jax.jit(lambda k, b: augment_batch(
        k, b["image"], b["clip_bbox_buf"], b["landmarks_buf"], aug_cfg))
    t_aug = timeit("augment_batch (XLA shear3)", aug_x,
                   [(keys[i], pools[i]) for i in range(n_pool)])
    try:
        aug_p = jax.jit(lambda k, b: augment_batch_pallas(
            k, b["image"], b["clip_bbox_buf"], b["landmarks_buf"], aug_cfg))
        t_aug_p = timeit("augment_batch_pallas (fused kernel)", aug_p,
                         [(keys[i], pools[i]) for i in range(n_pool)])
    except Exception as e:
        print(f"pallas augment failed: {e!r}", flush=True)
        t_aug_p = None

    # --- forward + loss (no grad), on pre-augmented images
    pre = [aug_x(keys[i], pools[i]) for i in range(n_pool)]
    pre = [(jax.block_until_ready(img), kp) for img, kp in pre]

    def loss_only(st, img, kp, labels, k_drop):
        variables = {"params": st.params}
        mutable = []
        if st.batch_stats:
            variables["batch_stats"] = st.batch_stats
            mutable = ["batch_stats"]
        res = st.apply_fn(variables, img, train=True,
                          rngs={"dropout": k_drop}, mutable=mutable)
        out = res[0] if mutable else res
        total, _ = set_criterion(out, {"labels": labels, "landmarks": kp},
                                 crit_cfg, None)
        return total

    fwd = jax.jit(loss_only)
    timeit("forward + matcher + loss (no grad)", fwd,
           [(state, pre[i][0], pre[i][1], pools[i]["labels"], keys[i])
            for i in range(n_pool)])

    grad = jax.jit(lambda st, img, kp, lb, k: jax.grad(
        lambda p: loss_only(st.replace(params=p), img, kp, lb, k))(st.params))
    timeit("grad(forward+loss) (no aug, no opt)", grad,
           [(state, pre[i][0], pre[i][1], pools[i]["labels"], keys[i])
            for i in range(n_pool)])

    # --- full train step, both augment impls (state is DONATED: thread it)
    step = make_train_step(crit_cfg, TrainConfig(), aug_cfg)
    state2 = jax.tree_util.tree_map(jnp.copy, state)
    timeit_step("FULL train step (XLA augment)", step, state, pools, keys)
    if t_aug_p is not None:
        step_p = make_train_step(crit_cfg, TrainConfig(), aug_cfg,
                                 use_pallas_augment=True)
        timeit_step("FULL train step (Pallas augment)", step_p, state2,
                    pools, keys)


if __name__ == "__main__":
    main()
