"""Learned Levenberg-Marquardt damping ("lambda") predictor.

Equivalent of the reference's 5-layer conv1d MLP over the per-channel
mean absolute residual (reference bundlenet.py:102-110 ``conv1d`` and
its usage at :165-173/:241-253; legacy variant at legacy/ba.py:266-275):

  avg_r (B, C) -> Dense 2C selu -> 4C selu -> 2C selu -> C selu
               -> 1 tanh =: a
  lambda = || avg_r ||_2 ^ (exponent_base + a)

The reference's conv1d with kernel width 1 over a length-1 sequence is
exactly a Dense layer, so that is what we use.  ``exponent_base`` is 2.0
in the current BundleNet (bundlenet.py:173) and 1.0 in the legacy
tracker (legacy/ba.py:274) — a config knob here.  The reference
instantiates one MLP per pyramid level via variable-scope names
("lambda_<level>_*", bundlenet.py:168); callers here do the same by
creating one module per level.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class DampingNet(nn.Module):
    """Predicts the LM damping scalar from the mean absolute residual."""

    channels: int  # C of the feature residual
    exponent_base: float = 2.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, avg_residual: jnp.ndarray) -> jnp.ndarray:
        """avg_residual: (..., C) mean |residual| per channel -> (...,)."""
        c = self.channels
        h = avg_residual.astype(self.dtype)
        kw = dict(dtype=self.dtype, kernel_init=nn.initializers.he_normal())
        h = nn.selu(nn.Dense(2 * c, **kw)(h))
        h = nn.selu(nn.Dense(4 * c, **kw)(h))
        h = nn.selu(nn.Dense(2 * c, **kw)(h))
        h = nn.selu(nn.Dense(c, **kw)(h))
        a = jnp.tanh(nn.Dense(1, **kw)(h))[..., 0]
        norm = jnp.linalg.norm(avg_residual, axis=-1)
        # Guard the pow against a zero-residual corner (exact convergence).
        return jnp.power(jnp.maximum(norm, 1e-12), self.exponent_base + a)
