"""Dev-only: sub-stage timing of the sigma-PnP eval tail + solver A/Bs.

The gather-free deform core (round 3) collapsed the decoder cost, so the
PnP tail (~20 ms @ B=256 per the round-3 breakdown) is now a visible
fraction of the eval step. This tool answers which sub-stage carries it:

  * select_keypoints (argmax table)
  * epnp init        (12x12 eigh + 2x 3x3 svd + 3x3 eigh + 6x3 lstsq)
  * huber refine     (20 LM iters, each one 6x6 jnp.linalg.solve)
  * full self-assessed tail

and A/Bs an unrolled-Cholesky 6x6 solve (pure elementwise ops, fully
batch-vectorized under vmap) against the stock batched LU.

Methodology per CLAUDE.md: pool of distinct inputs, chained scalar
accumulation, ONE host sync. Env: PB_BATCH (256), PB_ITERS (20).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("PB_CPU"):  # container force-registers axon; opt out
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

B = int(os.environ.get("PB_BATCH", "256"))
ITERS = int(os.environ.get("PB_ITERS", "20"))


def _scalarize(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in leaves[:3])


def timeit(name, fn, pool):
    acc = _scalarize(fn(pool[0])) + _scalarize(fn(pool[1 % len(pool)]))
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(ITERS):
        acc = acc + _scalarize(fn(pool[i % len(pool)]))
    _ = float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt*1e3:9.2f} ms/iter  {B/dt:9.0f} img/s", flush=True)
    return dt


def main():
    from satellite_pose_estimation_tpu.geometry.solvers import (
        SolverConfig, select_keypoints, solve_pose_self_assessed_batch)
    from satellite_pose_estimation_tpu.geometry.epnp import epnp
    from satellite_pose_estimation_tpu.geometry.refine import (
        huber_weighted_pnp)
    from satellite_pose_estimation_tpu.geometry.camera import (
        Camera, load_world_points)

    rng = np.random.RandomState(0)
    world = jnp.asarray(load_world_points(), jnp.float32)
    nw, Q = world.shape[0], 30
    K = Camera.K_jnp(jnp.float32)

    def pool_entry():
        return (jnp.asarray(rng.rand(B, Q, 2) * 1000, jnp.float32),
                jnp.asarray(rng.rand(B, Q, nw + 1), jnp.float32),
                jnp.asarray(rng.rand(B, Q, 2) * 4 + 1, jnp.float32),
                jnp.asarray(rng.rand(B) * 5e4 + 1e4, jnp.float32))

    ppool = [pool_entry() for _ in range(4)]

    # full tail
    tail = jax.jit(lambda t: solve_pose_self_assessed_batch(
        world, t[0], t[1], t[2], t[3]))
    timeit("full self-assessed tail", tail, ppool)

    # sigma tail (the bench RT-DETR eval solver: exhaustive P3P-RANSAC
    # init + huber LM)
    from satellite_pose_estimation_tpu.geometry.solvers import (
        solve_pose_sigma_batch)
    sig_tail = jax.jit(lambda t: solve_pose_sigma_batch(
        world, t[0], t[1], t[2]))
    timeit("full sigma tail (ransac+LM)", sig_tail, ppool)

    # select alone
    sel = jax.jit(jax.vmap(
        lambda p, l, s: select_keypoints(p, l, s, nw)))
    timeit("select_keypoints", lambda t: sel(t[0], t[1], t[2]), ppool)

    # derive kp pools once (host) for the init/refine stages
    kp_pool = []
    for t in ppool:
        kp, mask, sig = sel(t[0], t[1], t[2])
        kp_pool.append((jnp.asarray(kp), jnp.asarray(mask),
                        jnp.asarray(sig)))

    # epnp alone
    ep = jax.jit(jax.vmap(lambda kp, m: epnp(world, kp, K, m)))
    timeit("epnp init (12x12 eigh + svd)",
           lambda t: ep(t[0], t[1]), kp_pool)

    # exhaustive P3P ransac alone (the sigma-tail init)
    from satellite_pose_estimation_tpu.geometry.ransac import ransac_p3p
    ra = jax.jit(jax.vmap(
        lambda kp, m: ransac_p3p(world, kp, K, m, 25.0)))
    timeit("ransac_p3p (165 triples x4 DK)",
           lambda t: ra(t[0], t[1]), kp_pool)

    # refine alone (from a fixed plausible init)
    rvec0 = jnp.tile(jnp.float32([0.1, -0.2, 0.05]), (B, 1))
    tvec0 = jnp.tile(jnp.float32([0.1, 0.1, 10.0]), (B, 1))
    rf = jax.jit(jax.vmap(
        lambda kp, m, s, r0, t0: huber_weighted_pnp(
            world, kp, K, s, r0, t0, m, huber_delta=0.001)))
    timeit("huber refine (20 LM iters)",
           lambda t: rf(t[0], t[1], t[2], rvec0, tvec0), kp_pool)

    # ---- 6x6 solve A/B: stock LU vs unrolled Cholesky ----
    def chol_solve6(A, b):
        """Unrolled Cholesky solve for SPD 6x6; all ops elementwise ->
        fully batched under vmap."""
        n = 6
        L = [[None] * n for _ in range(n)]
        for j in range(n):
            s = A[j, j]
            for k in range(j):
                s = s - L[j][k] * L[j][k]
            L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            inv = 1.0 / L[j][j]
            for i in range(j + 1, n):
                s = A[i, j]
                for k in range(j):
                    s = s - L[i][k] * L[j][k]
                L[i][j] = s * inv
        # forward solve L y = b
        y = [None] * n
        for i in range(n):
            s = b[i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        # back solve L^T x = y
        x = [None] * n
        for i in reversed(range(n)):
            s = y[i]
            for k in range(i + 1, n):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        return jnp.stack(x)

    Amat = jnp.asarray(rng.rand(B, 11 * 2, 6), jnp.float32)
    bvec = jnp.asarray(rng.rand(B, 11 * 2), jnp.float32)

    def spd(t):
        A, b = t
        JtJ = jnp.einsum("bni,bnj->bij", A, A) + 1e-3 * jnp.eye(6)
        Jtr = jnp.einsum("bni,bn->bi", A, b)
        return JtJ, Jtr

    def chained(solver):
        """20 data-dependent solves inside one jit — emulates the LM loop's
        serial chain without the residual/jacobian work."""
        def run(t):
            JtJ, Jtr = spd(t)
            x = -Jtr
            def body(_, x):
                return solver(JtJ + 1e-6 * jnp.sum(x)
                              * jnp.eye(6, dtype=x.dtype), x)
            return jax.lax.fori_loop(0, 20, body, x)
        return run

    def lu_solve(A, b):
        return jnp.linalg.solve(A, b[..., None])[..., 0]

    spool = [(Amat + i, bvec + i) for i in range(4)]
    lu_j = jax.jit(chained(lu_solve))
    ch_j = jax.jit(chained(lambda A, b: jax.vmap(chol_solve6)(A, b)))
    # correctness first (single solve)
    JtJ, Jtr = spd(spool[0])
    ref = np.asarray(lu_solve(JtJ, -Jtr))
    got = np.asarray(jax.vmap(chol_solve6)(JtJ, -Jtr))
    err = np.max(np.abs(ref - got) / (np.abs(ref) + 1e-6))
    print(f"chol-vs-lu max rel err: {err:.3e}", flush=True)
    timeit("6x6 solve x20 chained, LU (stock)", lu_j, spool)
    timeit("6x6 solve x20 chained, chol (unrolled)", ch_j, spool)


if __name__ == "__main__":
    main()
