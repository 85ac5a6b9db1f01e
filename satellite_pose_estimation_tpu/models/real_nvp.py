"""RealNVP normalizing flow over 2D keypoint residuals (flax).

Capability parity with R2/src/zoo/rtdetr/real_nvp.py:5-63 + the nets/nett
coupling networks (R2/src/zoo/rtdetr/rtdetr_criterion.py:27-45): six
alternating-mask affine coupling layers with a standard-normal prior,
providing log_prob/sample. Used by the (config-gated) normalizing-flow
variant of the uncertainty loss.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

_MASKS = [[0.0, 1.0], [1.0, 0.0]] * 3  # alternating 2-D masks


class _CouplingNet(nn.Module):
    out_tanh: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(64, dtype=self.dtype, name="fc1")(x)
        h = nn.leaky_relu(h)
        h = nn.Dense(64, dtype=self.dtype, name="fc2")(h)
        h = nn.leaky_relu(h)
        h = nn.Dense(2, dtype=self.dtype, name="fc3")(h)
        return jnp.tanh(h) if self.out_tanh else h


class RealNVP(nn.Module):
    num_coupling: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, method: str = "log_prob"):
        return self.log_prob(x)

    def _nets(self, i):
        return _CouplingNet(out_tanh=True, dtype=self.dtype, name=f"s_{i}")

    def _nett(self, i):
        return _CouplingNet(out_tanh=False, dtype=self.dtype, name=f"t_{i}")

    @nn.compact
    def log_prob(self, x):
        """x: (..., 2) residuals -> (...) log density under the flow."""
        masks = jnp.asarray(_MASKS, self.dtype)
        log_det = jnp.zeros(x.shape[:-1], self.dtype)
        z = x
        for i in reversed(range(self.num_coupling)):
            m = masks[i]
            z_masked = m * z
            s = _CouplingNet(True, self.dtype, name=f"s_{i}")(z_masked) * (1 - m)
            t = _CouplingNet(False, self.dtype, name=f"t_{i}")(z_masked) * (1 - m)
            z = z_masked + (1 - m) * (z - t) * jnp.exp(-s)
            log_det = log_det - jnp.sum(s, axis=-1)
        prior_logp = -0.5 * jnp.sum(z * z, axis=-1) - jnp.log(2 * jnp.pi)
        return prior_logp + log_det

    @nn.compact
    def sample(self, rng, batch_shape):
        masks = jnp.asarray(_MASKS, self.dtype)
        z = jax.random.normal(rng, batch_shape + (2,), self.dtype)
        x = z
        for i in range(self.num_coupling):
            m = masks[i]
            x_masked = m * x
            s = _CouplingNet(True, self.dtype, name=f"s_{i}")(x_masked) * (1 - m)
            t = _CouplingNet(False, self.dtype, name=f"t_{i}")(x_masked) * (1 - m)
            x = x_masked + (1 - m) * (x * jnp.exp(s) + t)
        return x
