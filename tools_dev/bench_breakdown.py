"""Dev-only: stage-level timing breakdown of the flagship forward on TPU.

Methodology per CLAUDE.md: pool of distinct inputs, chain dispatches,
block on all outputs at the end. Prints ms/iter and img/s per stage.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B = int(os.environ.get("BB_BATCH", "256"))
ITERS = int(os.environ.get("BB_ITERS", "10"))
STAGES = os.environ.get("BB_STAGES", "").split(",") if os.environ.get("BB_STAGES") else None


def _scalarize(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in leaves[:1])


def timeit(name, fn, pool):
    # warmup/compile (also compiles the scalarize-add chain)
    acc = _scalarize(fn(pool[0]))
    acc = acc + _scalarize(fn(pool[1 % len(pool)]))
    float(acc)  # true host sync (block_until_ready lies over the tunnel)
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(ITERS):
        acc = acc + _scalarize(fn(pool[i % len(pool)]))
    _ = float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:36s} {dt*1e3:9.2f} ms/iter  {B/dt:9.0f} img/s", flush=True)
    return dt


def main():
    from satellite_pose_estimation_tpu.models.detr import DETRConfig, DETRKeypointModel
    from satellite_pose_estimation_tpu.models.resnet import Backbone8s
    from satellite_pose_estimation_tpu.models.transformer import (
        EncoderLayer, DecoderLayer, Transformer)
    from flax import linen as nn

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    def pool_of(shape, n=4, dtype=jnp.bfloat16):
        return [jnp.asarray(rng.randn(*shape), dtype) for _ in range(n)]

    def want(name):
        return STAGES is None or name in STAGES

    # --- full model forward
    if want("full"):
        cfg = DETRConfig(backbone="resnet50s8", enc_layers=4, dec_layers=4,
                         num_queries=20, dropout=0.0, dtype=dt)
        model = DETRKeypointModel(cfg)
        variables = model.init(key, jnp.zeros((2, 224, 224, 3)), train=False)
        f = jax.jit(lambda v, x: model.apply(v, x, train=False))
        xs = pool_of((B, 224, 224, 3), 4, jnp.float32)
        timeit("full model fwd @224", lambda x: f(variables, x), xs)

    # --- backbone only
    if want("backbone"):
        bb = Backbone8s(dtype=dt)
        vb = bb.init(key, jnp.zeros((2, 224, 224, 3)), train=False)
        fb = jax.jit(lambda v, x: bb.apply(v, x, train=False))
        xs = pool_of((B, 224, 224, 3), 4, jnp.float32)
        timeit("Backbone8s fwd @224", lambda x: fb(vb, x), xs)

    if want("backbone_nos2d"):
        bb2 = Backbone8s(dtype=dt, s2d_stem=False)
        vb2 = bb2.init(key, jnp.zeros((2, 224, 224, 3)), train=False)
        fb2 = jax.jit(lambda v, x: bb2.apply(v, x, train=False))
        xs = pool_of((B, 224, 224, 3), 4, jnp.float32)
        timeit("Backbone8s fwd @224 (no s2d)", lambda x: fb2(vb2, x), xs)

    # --- single encoder layer (T=784, d=256, ffn=2048)
    if want("enc"):
        enc = EncoderLayer(256, 8, 2048, 0.0, "relu", False, dt)
        src = jnp.zeros((B, 784, 256), dt)
        pos = jnp.zeros((1, 784, 256), dt)
        ve = enc.init(key, src, pos, True)
        fe = jax.jit(lambda v, s, p: enc.apply(v, s, p, True))
        srcs = pool_of((B, 784, 256))
        timeit("1 encoder layer (T784 d256)", lambda s: fe(ve, s, pos), srcs)

    # --- attention core only (flax MHA, q=k=v)
    if want("attn"):
        mha = nn.MultiHeadDotProductAttention(num_heads=8, qkv_features=256,
                                              out_features=256, dtype=dt)
        x0 = jnp.zeros((B, 784, 256), dt)
        vm = mha.init(key, x0, x0, x0)
        fm = jax.jit(lambda v, x: mha.apply(v, x, x, x))
        xs = pool_of((B, 784, 256))
        timeit("MHA core (T784 h8 d32)", lambda x: fm(vm, x), xs)

    # --- fused attention kernel core (Pallas) at flagship shape
    if want("fusedcore"):
        from satellite_pose_estimation_tpu.ops.fused_attention import (
            fused_self_attention)
        scale = 1.0 / (32 ** 0.5)
        fc = jax.jit(lambda q, k, v: fused_self_attention(q, k, v, scale))
        qs = pool_of((B, 8, 784, 32))
        ks = pool_of((B, 8, 784, 32))
        vs = pool_of((B, 8, 784, 32))
        timeit("fused attn core (B,8,784,32)",
               lambda i: fc(qs[i], ks[i], vs[i]),
               list(range(4)))

    # --- FFN only
    if want("ffn"):
        class FFN(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Dense(2048, dtype=dt)(x)
                x = nn.relu(x)
                return nn.Dense(256, dtype=dt)(x)
        ffn = FFN()
        vf = ffn.init(key, jnp.zeros((B, 784, 256), dt))
        ff = jax.jit(lambda v, x: ffn.apply(v, x))
        xs = pool_of((B, 784, 256))
        timeit("FFN (256->2048->256)", lambda x: ff(vf, x), xs)

    # --- decoder stack (4 layers, 20 queries)
    if want("dec"):
        tr = Transformer(256, 8, 0, 4, 2048, 0.0, "relu", False, dt)
        src = jnp.zeros((B, 28, 28, 256), dt)
        qe = jnp.zeros((20, 256), dt)
        pe = jnp.zeros((28, 28, 256), dt)
        vt = tr.init(key, src, qe, pe, True)
        ft = jax.jit(lambda v, s: tr.apply(v, s, qe, pe, True))
        srcs = pool_of((B, 28, 28, 256))
        timeit("decoder stack (enc0 dec4 q20)", lambda s: ft(vt, s), srcs)

    # --- int8 MXU probes
    if want("int8probe"):
        a8 = jnp.asarray(rng.randint(-127, 127, (8192, 8192)), jnp.int8)
        w8 = jnp.asarray(rng.randint(-127, 127, (8192, 8192)), jnp.int8)
        fi = jax.jit(lambda x: jax.lax.dot_general(
            x, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
        pool8 = [jnp.asarray(rng.randint(-127, 127, (8192, 8192)), jnp.int8)
                 for _ in range(4)]
        dtm = timeit("int8 matmul 8192^3", fi, pool8)
        print(f"  -> {2*8192**3/dtm/1e12:.1f} TOP/s", flush=True)
        # int8 conv support probe (3x3, NHWC)
        try:
            x8 = jnp.asarray(rng.randint(-127, 127, (B, 28, 28, 512)),
                             jnp.int8)
            k8 = jnp.asarray(rng.randint(-127, 127, (3, 3, 512, 512)),
                             jnp.int8)
            fc8 = jax.jit(lambda x: jax.lax.conv_general_dilated(
                x, k8, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32))
            pool_c = [jnp.asarray(
                rng.randint(-127, 127, (B, 28, 28, 512)), jnp.int8)
                for _ in range(4)]
            dtc = timeit("int8 conv3x3 28x28x512", fc8, pool_c)
            fl = 2 * B * 28 * 28 * 9 * 512 * 512
            print(f"  -> {fl/dtc/1e12:.1f} TOP/s", flush=True)
        except Exception as e:
            print(f"int8 conv UNSUPPORTED: {type(e).__name__}: {e}",
                  flush=True)
        # bf16 conv same shape for comparison
        xb = pool_of((B, 28, 28, 512))
        kb = jnp.asarray(rng.randn(3, 3, 512, 512), dt)
        fcb = jax.jit(lambda x: jax.lax.conv_general_dilated(
            x, kb, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        dtb = timeit("bf16 conv3x3 28x28x512", fcb, xb)
        fl = 2 * B * 28 * 28 * 9 * 512 * 512
        print(f"  -> {fl/dtb/1e12:.1f} TFLOP/s", flush=True)

    # --- practical roofline: big square bf16 matmul
    if want("roofline"):
        w = jnp.asarray(rng.randn(8192, 8192), dt)
        fr = jax.jit(lambda x: x @ w)
        xs = pool_of((8192, 8192))
        dtm = timeit("roofline (8192^3 bf16 matmul)", fr, xs)
        print(f"  -> {2*8192**3/dtm/1e12:.1f} TFLOP/s", flush=True)

    # --- dispatch overhead: trivial elementwise op
    if want("overhead"):
        fo = jax.jit(lambda x: x + 1.0)
        xs = pool_of((128, 128))
        timeit("dispatch overhead (tiny add)", fo, xs)

    # --- attention core variants
    if want("attnvar"):
        # f32 scores, bf16 everything, explicit einsum formulation
        def attn_manual(q, k, v):
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s * (1.0 / (32 ** 0.5)), axis=-1)
            return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                              preferred_element_type=jnp.float32
                              ).astype(v.dtype)
        fa = jax.jit(attn_manual)
        qs = pool_of((B, 8, 784, 32))
        ks = pool_of((B, 8, 784, 32))
        vs = pool_of((B, 8, 784, 32))
        timeit("attn core einsum-xla (B,8,784,32)",
               lambda i: fa(qs[i], ks[i], vs[i]), list(range(4)))

        # all-bf16 softmax variant
        def attn_bf16(q, k, v):
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k)
            p = jax.nn.softmax(s * (1.0 / (32 ** 0.5)), axis=-1)
            return jnp.einsum("bhqk,bhkd->bhqd", p, v)
        fb = jax.jit(attn_bf16)
        timeit("attn core bf16-softmax",
               lambda i: fb(qs[i], ks[i], vs[i]), list(range(4)))

    # --- raw matmul ceiling probe: same FLOPs as one FFN pass
    if want("matmul"):
        w1 = jnp.asarray(rng.randn(256, 2048), dt)
        w2 = jnp.asarray(rng.randn(2048, 256), dt)
        fmm = jax.jit(lambda x: jnp.maximum(x @ w1, 0) @ w2)
        xs = pool_of((B * 784, 256))
        timeit("raw matmul pair (BT,256)x(256,2048)", fmm, xs)

    # ================= train-side dissection =================
    if any(want(s) for s in ("trainstep", "gradonly", "gradcrit", "augb",
                             "warponly", "photonly", "rotprobe")):
        from satellite_pose_estimation_tpu.data.augment import (
            AugmentConfig, augment_batch)
        from satellite_pose_estimation_tpu.losses.criterion import (
            CriterionConfig, set_criterion)
        from satellite_pose_estimation_tpu.train.state import (
            TrainConfig, create_train_state)
        from satellite_pose_estimation_tpu.train.steps import make_train_step

        cfg = DETRConfig(backbone="resnet50s8", enc_layers=4, dec_layers=4,
                         num_queries=20, dropout=0.0, dtype=dt)
        model = DETRKeypointModel(cfg)
        tc = TrainConfig(use_ema=True)
        state = create_train_state(
            model, key, jnp.zeros((2, 224, 224, 3)), tc)

        def make_batch(i):
            r = np.random.RandomState(i)
            return {
                "image": jnp.asarray(
                    r.randint(0, 255, (B, 256, 256, 3)), jnp.uint8),
                "clip_bbox_buf": jnp.tile(
                    jnp.float32([8, 8, 248, 248]), (B, 1)),
                "landmarks_buf": jnp.asarray(
                    r.rand(B, 11, 2) * 200 + 20, jnp.float32),
                "labels": jnp.tile(jnp.arange(11, dtype=jnp.int32)[None],
                                   (B, 1)),
            }
        batches = [make_batch(i) for i in range(4)]

        if want("trainstep"):
            step = make_train_step(CriterionConfig(), tc,
                                   AugmentConfig(out_size=224))
            # stateful: time by stepping with rotating batches.
            # donate_argnums invalidates the input state — give the loop its
            # own copy so later stages can still read `state`.
            st = jax.tree_util.tree_map(
                lambda x: jnp.copy(x) if hasattr(x, "dtype") else x, state)
            st, losses = step(st, batches[0], jax.random.PRNGKey(9))
            float(losses["loss_total"])
            import time as _t
            t0 = _t.perf_counter()
            for i in range(ITERS):
                st, losses = step(st, batches[i % 4],
                                  jax.random.PRNGKey(i))
            float(losses["loss_total"])
            dtt = (_t.perf_counter() - t0) / ITERS
            print(f"{'full train step':36s} {dtt*1e3:9.2f} ms/iter "
                  f"{B/dtt:9.0f} img/s", flush=True)

        if want("rotprobe"):
            from satellite_pose_estimation_tpu.ops.image_warp import (
                affine_warp_bilinear)
            n_rot, S = max(int(round(0.4 * B)), 1), 224
            crops = [jnp.asarray(
                np.random.RandomState(i).rand(n_rot, S, S, 3) * 255,
                jnp.float32) for i in range(4)]
            thetas = jnp.linspace(-1.0, 1.0, n_rot)
            c = (S - 1.0) / 2.0

            def rot_m(th):
                cos, sin = jnp.cos(th), jnp.sin(th)
                return jnp.asarray([
                    [cos, sin, c - cos * c - sin * c],
                    [-sin, cos, c + sin * c - cos * c]])

            fa = jax.jit(lambda x: jax.vmap(
                lambda im, th: affine_warp_bilinear(im, rot_m(th), S, False)
            )(x, thetas))
            timeit(f"rotation flat-gather f32 (n={n_rot})",
                   lambda i: fa(crops[i]), list(range(4)))

            crops16 = [x.astype(jnp.bfloat16) for x in crops]
            timeit(f"rotation flat-gather bf16 in",
                   lambda i: fa(crops16[i]), list(range(4)))

            # 2D advanced-indexing formulation (img[yc, xc] directly)
            def rot2d(im, th):
                M = rot_m(th)
                d = jnp.arange(S, dtype=jnp.float32)
                dx, dy = jnp.meshgrid(d, d, indexing="xy")
                sx = M[0, 0] * dx + M[0, 1] * dy + M[0, 2]
                sy = M[1, 0] * dx + M[1, 1] * dy + M[1, 2]
                x0, y0 = jnp.floor(sx), jnp.floor(sy)
                tx, ty = sx - x0, sy - y0
                def samp(xi, yi):
                    inside = ((xi >= 0) & (xi <= S - 1)
                              & (yi >= 0) & (yi <= S - 1))
                    xc = jnp.clip(xi, 0, S - 1).astype(jnp.int32)
                    yc = jnp.clip(yi, 0, S - 1).astype(jnp.int32)
                    return im[yc, xc] * inside[..., None]
                out = (samp(x0, y0) * ((1 - tx) * (1 - ty))[..., None]
                       + samp(x0 + 1, y0) * (tx * (1 - ty))[..., None]
                       + samp(x0, y0 + 1) * ((1 - tx) * ty)[..., None]
                       + samp(x0 + 1, y0 + 1) * (tx * ty)[..., None])
                return out
            f2 = jax.jit(lambda x: jax.vmap(rot2d)(x, thetas))
            timeit("rotation 2d-index gather",
                   lambda i: f2(crops[i]), list(range(4)))

            # row-band formulation: gather whole rows (y taps), then
            # take_along_axis within rows (x taps)
            def rot_rows(im, th):
                M = rot_m(th)
                d = jnp.arange(S, dtype=jnp.float32)
                dx, dy = jnp.meshgrid(d, d, indexing="xy")
                sx = M[0, 0] * dx + M[0, 1] * dy + M[0, 2]
                sy = M[1, 0] * dx + M[1, 1] * dy + M[1, 2]
                x0, y0 = jnp.floor(sx), jnp.floor(sy)
                tx, ty = sx - x0, sy - y0
                def samp(xi, yi):
                    inside = ((xi >= 0) & (xi <= S - 1)
                              & (yi >= 0) & (yi <= S - 1))
                    xc = jnp.clip(xi, 0, S - 1).astype(jnp.int32)
                    yc = jnp.clip(yi, 0, S - 1).astype(jnp.int32)
                    rows = jnp.take_along_axis(
                        im, yc[..., None, None].repeat(S, -2), axis=0
                    ) if False else im[yc]  # (S,S,S,3)? too big — use direct
                    return im[yc, xc] * inside[..., None]
                return (samp(x0, y0) * ((1 - tx) * (1 - ty))[..., None]
                        + samp(x0 + 1, y0 + 1) * (tx * ty)[..., None])
            del rot_rows  # row-band variant shelved (memory blowup)

        if want("shearprobe"):
            # row-structured gather: out[y,x] = in[y, x + k[y]] via
            # take_along_axis — if this beats the random 2D gather, rotation
            # can be decomposed into 3 shears (6 taps vs 4, but structured)
            n_rot, S = max(int(round(0.4 * B)), 1), 224
            crops = [jnp.asarray(
                np.random.RandomState(i).rand(n_rot, S, S, 3) * 255,
                jnp.float32) for i in range(4)]
            offs = jnp.asarray(
                np.random.RandomState(9).randint(-80, 80, (n_rot, S)))

            def shear_x(im, k):  # (S,S,3), (S,) int offsets per row
                idx = (jnp.arange(S)[None, :] + k[:, None]) % S  # (S,S)
                return jnp.take_along_axis(im, idx[..., None], axis=1)
            fs = jax.jit(lambda x: jax.vmap(shear_x)(x, offs))
            timeit(f"shear take_along_axis (n={n_rot})",
                   lambda i: fs(crops[i]), list(range(4)))

        if want("warponly"):
            from satellite_pose_estimation_tpu.data.augment import (
                _sample_affine)
            from satellite_pose_estimation_tpu.ops.image_warp import (
                affine_warp_bilinear)
            aug = AugmentConfig(out_size=224)

            def warp_batch(r, b):
                def one(rr, img, bb):
                    M, _ = _sample_affine(rr, bb, aug)
                    return affine_warp_bilinear(img, M, 224, False)
                return jax.vmap(one)(
                    jax.random.split(r, B), b["image"], b["clip_bbox_buf"])
            fw = jax.jit(warp_batch)
            timeit("warp only (bilinear gather)",
                   lambda i: fw(jax.random.PRNGKey(i), batches[i % 4]),
                   list(range(4)))

        if want("photonly"):
            from satellite_pose_estimation_tpu.data.augment import (
                _photometric_batch)
            aug = AugmentConfig(out_size=224)
            imgs224 = [jnp.asarray(
                np.random.RandomState(i).rand(B, 224, 224, 3) * 255,
                jnp.float32) for i in range(4)]
            fp = jax.jit(lambda r, x: _photometric_batch(r, x, aug))
            timeit("photometric_batch only",
                   lambda i: fp(jax.random.PRNGKey(i), imgs224[i]),
                   list(range(4)))

        if want("augb"):
            aug = AugmentConfig(out_size=224)
            fa = jax.jit(lambda r, b: augment_batch(
                r, b["image"], b["clip_bbox_buf"], b["landmarks_buf"], aug))
            timeit("augment_batch (full family)",
                   lambda i: fa(jax.random.PRNGKey(i), batches[i % 4]),
                   list(range(4)))

        if want("gradonly"):
            def loss_model(params, images, k):
                out = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images, train=True, rngs={"dropout": k},
                    mutable=["batch_stats"])[0]
                return (jnp.sum(out["pred_points"].astype(jnp.float32)) +
                        jnp.sum(out["pred_logits"].astype(jnp.float32)))
            g = jax.jit(jax.grad(loss_model))
            imgs = pool_of((B, 224, 224, 3), 4, jnp.float32)
            timeit("grad(model fwd+bwd only)",
                   lambda i: g(state.params, imgs[i], jax.random.PRNGKey(0)),
                   list(range(4)))

        if want("gradcrit"):
            r = np.random.RandomState(7)
            kp_norm = jnp.asarray(r.rand(B, 11, 2), jnp.float32)
            labels = jnp.tile(jnp.arange(11, dtype=jnp.int32)[None], (B, 1))
            ccfg = CriterionConfig()

            def loss_crit(params, images, k):
                out = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images, train=True, rngs={"dropout": k},
                    mutable=["batch_stats"])[0]
                total, _ = set_criterion(
                    out, {"labels": labels, "landmarks": kp_norm}, ccfg)
                return total
            g2 = jax.jit(jax.grad(loss_crit))
            imgs = pool_of((B, 224, 224, 3), 4, jnp.float32)
            timeit("grad(model+criterion)",
                   lambda i: g2(state.params, imgs[i], jax.random.PRNGKey(0)),
                   list(range(4)))

    def device_pool(shape, n=3, dtype=jnp.bfloat16):
        # generated ON device: avoids multi-GB host->device tunnel transfers
        mk = jax.jit(lambda k: jax.random.normal(k, shape, dtype))
        return [mk(jax.random.PRNGKey(i)) for i in range(n)]

    # --- ResNet stem: conv1 7x7/2 (3ch input) + maxpool, vs space-to-depth
    if want("stem"):
        k7 = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, dt)

        def stem(x):
            y = jax.lax.conv_general_dilated(
                x.astype(dt), k7, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = nn.relu(y)
            return nn.max_pool(y, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))

        xs = device_pool((B, 224, 224, 3), 3, jnp.float32)
        timeit("stem conv7x7/2 + maxpool", jax.jit(stem), xs)

        # space-to-depth(2) equivalent: pad to 232, s2d -> (116,116,12),
        # 4x4/1 conv with remapped weights, crop to 112.
        k8 = jnp.zeros((8, 8, 3, 64), dt).at[1:, 1:].set(k7)
        ks2d = k8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
        ks2d = ks2d.reshape(4, 4, 12, 64)

        def stem_s2d(x):
            xp = jnp.pad(x.astype(dt), ((0, 0), (4, 4), (4, 4), (0, 0)))
            xs2 = xp.reshape(B, 116, 2, 116, 2, 3).transpose(
                0, 1, 3, 2, 4, 5).reshape(B, 116, 116, 12)
            y = jax.lax.conv_general_dilated(
                xs2, ks2d, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[:, :112, :112]
            y = nn.relu(y)
            return nn.max_pool(y, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))

        timeit("stem space-to-depth", jax.jit(stem_s2d), xs)

    # --- softmax cost at encoder score shape
    if want("softmax"):
        fs = jax.jit(lambda x: jax.nn.softmax(x, axis=-1))
        xs = device_pool((B, 8, 784, 784), 2)
        timeit("softmax (B,8,784,784) bf16", fs, xs)

    print("done", flush=True)


if __name__ == "__main__":
    main()
