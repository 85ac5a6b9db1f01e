"""Fused whole-sequence attention kernel: numerics + gradients + model-level
equivalence against the plain XLA formulation."""
import jax
import jax.numpy as jnp
import numpy as np

from satellite_pose_estimation_tpu.ops.fused_attention import (
    _fused_tpu,
    _reference_attention,
    fused_self_attention,
)


def _qkv(rng, B=2, H=4, T=96, D=32, dtype=jnp.float32):
    def r():
        return jnp.asarray(rng.randn(B, H, T, D), dtype)

    return r(), r(), r()


def test_kernel_matches_reference_interpret(rng):
    q, k, v = _qkv(rng)
    scale = 1.0 / np.sqrt(32)
    out_kernel = _fused_tpu(q, k, v, scale, interpret=True)
    out_ref = _reference_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_kernel_interpret_nonsquare_t(rng):
    # T=784 is not a lane multiple; check a deliberately awkward T too.
    q, k, v = _qkv(rng, B=1, H=2, T=49, D=32)
    scale = 0.25
    out_kernel = _fused_tpu(q, k, v, scale, interpret=True)
    out_ref = _reference_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_direct_grad(rng):
    q, k, v = _qkv(rng, B=1, H=2, T=32, D=16)
    scale = 0.25

    def loss_fused(q, k, v):
        return jnp.sum(fused_self_attention(q, k, v, scale) ** 2)

    def loss_direct(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, scale) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_direct, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_detr_forward_impl_equivalence(rng):
    """Model outputs must be identical between the fused (CPU reference
    route) and xla attention cores — same params, dropout 0."""
    from satellite_pose_estimation_tpu.models.transformer import _Attention

    x = jnp.asarray(rng.randn(2, 50, 64), jnp.float32)
    fused = _Attention(64, 4, 0.0, jnp.float32, impl="fused")
    xla = _Attention(64, 4, 0.0, jnp.float32, impl="xla")
    params = fused.init(jax.random.PRNGKey(0), x, x, x)
    out_f = fused.apply(params, x, x, x, deterministic=True)
    out_x = xla.apply(params, x, x, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=1e-5, atol=1e-6)


def test_pallas_backward_kernel_matches_xla_grads(rng):
    from satellite_pose_estimation_tpu.ops.fused_attention import _bwd_tpu

    q, k, v = _qkv(rng, B=2, H=3, T=64, D=32)
    scale = 1.0 / np.sqrt(32)

    def loss(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, scale) ** 2)

    out = _reference_attention(q, k, v, scale)
    g = 2.0 * out  # dL/dout for the squared loss
    dq, dk, dv = _bwd_tpu(q, k, v, g, scale, interpret=True)
    rq, rk, rv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv),
                               rtol=1e-4, atol=1e-5)


def test_vmem_gate_thresholds():
    """Whole-seq kernels hold the full f32 score matrix in VMEM: the
    224/256-input sequences (T=784/1024/1344) run whole-sequence; the
    512-input DETR encoder (T=4096, 64 MB of scores) runs q-row-blocked —
    512-row strips forward (one live score matrix) and 128-row strips
    backward (p and dp live at once, plus headroom for XLA's VMEM-pinned
    dq output — calibrated on the real v5e compiler)."""
    from satellite_pose_estimation_tpu.ops.fused_attention import (
        _bwd_q_block_rows,
        _fits_vmem,
        _q_block_rows,
    )

    assert _fits_vmem(784) and _fits_vmem(1024) and _fits_vmem(1344)
    for t in (784, 1024, 1344):
        assert _q_block_rows(t) == t
        assert _bwd_q_block_rows(t) == t
    assert not _fits_vmem(4096)
    assert _q_block_rows(4096) == 512
    assert _bwd_q_block_rows(4096) == 128  # calibrated on the real v5e compiler


def test_q_blocked_kernel_matches_reference(rng, monkeypatch):
    """Force the q-row-blocked grid on a small shape (budget shrunk so
    T=96 splits into 32-row strips) and check exactness vs plain XLA."""
    import satellite_pose_estimation_tpu.ops.fused_attention as fa

    monkeypatch.setattr(fa, "_VMEM_SCORE_BUDGET_BYTES", 16384)
    assert fa._q_block_rows(96) == 32
    q, k, v = _qkv(rng, B=2, H=2, T=96, D=32)
    scale = 1.0 / np.sqrt(32)
    out_kernel = fa._fused_tpu(q, k, v, scale, interpret=True)
    out_ref = _reference_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_q_blocked_backward_matches_xla_grads(rng, monkeypatch):
    """Force the strip-accumulating backward grid on a small shape (budget
    shrunk so T=96 splits into 8-row strips; dk/dv accumulate across 12
    strips in f32) and check gradient exactness vs plain XLA."""
    import satellite_pose_estimation_tpu.ops.fused_attention as fa

    monkeypatch.setattr(fa, "_VMEM_SCORE_BUDGET_BYTES", 16384)
    assert fa._bwd_q_block_rows(96) == 8
    q, k, v = _qkv(rng, B=2, H=2, T=96, D=32)
    scale = 1.0 / np.sqrt(32)

    def loss(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, scale) ** 2)

    out = _reference_attention(q, k, v, scale)
    g = 2.0 * out
    dq, dk, dv = fa._bwd_tpu(q, k, v, g, scale, interpret=True)
    rq, rk, rv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv),
                               rtol=1e-4, atol=1e-5)
