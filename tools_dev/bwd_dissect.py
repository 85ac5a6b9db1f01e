"""Dev-only: per-component forward vs backward timing of the flagship
train step on TPU (VERDICT r3 item 1 — the backward runs at ~52% MFU vs
the forward's ~90%; find where the 102 ms of backward @128 actually goes).

Times fwd and grad(sum(out)) for: the full model+criterion, the Backbone8s
trunk, progressive ResNet prefixes (stem / +layer1 / +layer2 / +layer3),
the transformer on frozen features, and the criterion alone. The bwd/fwd
ratio per component localizes the inefficiency (ideal ratio ~2.0 at equal
MXU efficiency).

    BD_BATCH=128 BD_INPUT=224 python tools_dev/bwd_dissect.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("BD_BATCH", "128"))
INPUT = int(os.environ.get("BD_INPUT", "224"))
ITERS = int(os.environ.get("BD_ITERS", "10"))


def timeit(name, fn, pool):
    out = fn(*pool[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    res = []
    for i in range(ITERS):
        res.append(jax.tree_util.tree_leaves(fn(*pool[i % len(pool)]))[0])
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:52s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def fwd_and_grad(name, apply_fn, variables, pool):
    """Time apply_fn fwd and grad wrt params of sum(out); returns times."""
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def scalar(p, *args):
        out = apply_fn({"params": p, **rest}, *args)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(out))

    f = jax.jit(lambda *a: scalar(params, *a))
    g = jax.jit(jax.grad(scalar))
    tf = timeit(f"{name} fwd", f, pool)
    tg = timeit(f"{name} grad(fwd)", g, [(params, *a) for a in pool])
    bwd = tg - tf
    print(f"{'':52s} bwd-only {bwd*1e3:8.2f} ms  bwd/fwd {bwd/tf:5.2f}",
          flush=True)
    return tf, tg


def main():
    from satellite_pose_estimation_tpu.models.detr import (
        DETRConfig,
        DETRKeypointModel,
    )
    from satellite_pose_estimation_tpu.models.resnet import Backbone8s, ResNet
    from satellite_pose_estimation_tpu.losses.criterion import (
        CriterionConfig,
        set_criterion,
    )

    rng = np.random.RandomState(0)
    n_pool = max(4, ITERS)
    imgs = [jnp.asarray(rng.rand(B, INPUT, INPUT, 3), jnp.float32)
            for _ in range(n_pool)]

    dtype = jnp.bfloat16

    # --- full model + criterion (the train-loss program minus augment/opt)
    cfg = DETRConfig(backbone="resnet50s8", enc_layers=4, dec_layers=4,
                     num_queries=20, dropout=0.0, dtype=dtype)
    model = DETRKeypointModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), imgs[0][:2], train=True)
    crit_cfg = CriterionConfig()
    labels = jnp.tile(jnp.arange(11, dtype=jnp.int32)[None], (B, 1))
    kp = jnp.asarray(rng.rand(B, 11, 2), jnp.float32)

    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def model_loss(p, img):
        out = model.apply({"params": p, **rest}, img, train=True,
                          rngs={"dropout": jax.random.PRNGKey(0)},
                          mutable=list(rest.keys()))[0] if rest else \
              model.apply({"params": p}, img, train=True,
                          rngs={"dropout": jax.random.PRNGKey(0)})
        total, _ = set_criterion(out, {"labels": labels, "landmarks": kp},
                                 crit_cfg, None)
        return total

    f = jax.jit(lambda img: model_loss(params, img))
    g = jax.jit(jax.grad(model_loss))
    tf_full = timeit("model+criterion fwd", f, [(im,) for im in imgs])
    tg_full = timeit("model+criterion grad", g,
                     [(params, im) for im in imgs])
    print(f"{'':52s} bwd-only {(tg_full-tf_full)*1e3:8.2f} ms  "
          f"bwd/fwd {(tg_full-tf_full)/tf_full:5.2f}", flush=True)

    # --- model fwd WITHOUT criterion (isolate matcher+loss cost)
    def model_only(p, img):
        out = model.apply({"params": p, **rest}, img, train=True,
                          rngs={"dropout": jax.random.PRNGKey(0)},
                          mutable=list(rest.keys()))[0] if rest else \
              model.apply({"params": p}, img, train=True,
                          rngs={"dropout": jax.random.PRNGKey(0)})
        return (jnp.sum(out["pred_points"].astype(jnp.float32))
                + jnp.sum(out["pred_logits"].astype(jnp.float32))
                + sum(jnp.sum(a["pred_points"].astype(jnp.float32))
                      + jnp.sum(a["pred_logits"].astype(jnp.float32))
                      for a in out.get("aux_outputs", [])))

    f = jax.jit(lambda img: model_only(params, img))
    g = jax.jit(jax.grad(model_only))
    tf = timeit("model-only fwd", f, [(im,) for im in imgs])
    tg = timeit("model-only grad", g, [(params, im) for im in imgs])
    print(f"{'':52s} bwd-only {(tg-tf)*1e3:8.2f} ms  "
          f"bwd/fwd {(tg-tf)/tf:5.2f}", flush=True)

    # --- Backbone8s trunk
    bb = Backbone8s(norm="bn", dtype=dtype)
    vb = bb.init(jax.random.PRNGKey(0), imgs[0][:2], train=True)
    fwd_and_grad("backbone8s (r50 s8 fusion)",
                 lambda v, img: bb.apply(v, img, train=True,
                                         mutable=["batch_stats"])[0],
                 vb, [(im,) for im in imgs])

    # --- progressive ResNet prefixes
    for taps, label in (((1,), "resnet50[stem+L1]"),
                        ((2,), "resnet50[..L2]"),
                        ((3,), "resnet50[..L3]")):
        m = ResNet(arch="resnet50", taps=taps, norm="bn", dtype=dtype)
        v = m.init(jax.random.PRNGKey(0), imgs[0][:2], train=True)
        fwd_and_grad(f"{label}",
                     lambda v_, img, m_=m: m_.apply(
                         v_, img, train=True, mutable=["batch_stats"])[0],
                     v, [(im,) for im in imgs])

    # --- criterion alone on synthetic outputs (transformer cost falls out
    # of the model-only minus backbone difference)
    Q = cfg.num_queries
    outs = [{"pred_logits": jnp.asarray(rng.rand(B, Q, 12), jnp.float32),
             "pred_points": jnp.asarray(rng.rand(B, Q, 2), jnp.float32)}
            for _ in range(n_pool)]

    def crit(o):
        total, _ = set_criterion(o, {"labels": labels, "landmarks": kp},
                                 crit_cfg, None)
        return total

    f = jax.jit(crit)
    g = jax.jit(jax.grad(lambda o: crit(o)))
    timeit("criterion (matcher+loss) fwd", f, [(o,) for o in outs])
    timeit("criterion grad", g, [(o,) for o in outs])


if __name__ == "__main__":
    main()
