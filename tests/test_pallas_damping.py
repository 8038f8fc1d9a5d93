"""Fused Pallas damping MLP vs the Flax module (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.models.damping import DampingNet
from banet_tpu.ops.pallas_damping import damping_pallas


@pytest.mark.parametrize("B,base", [(4, 2.0), (16, 1.0), (3, 2.0)])
def test_matches_flax_module(B, base):
    C = 128
    net = DampingNet(C, exponent_base=base)
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (B, C))) * 0.1
    vars_ = net.init(jax.random.PRNGKey(1), x)
    want = net.apply(vars_, x)
    got = damping_pallas(vars_["params"], x, exponent_base=base,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_zero_residual_guard():
    C = 128
    net = DampingNet(C)
    x = jnp.zeros((2, C))
    vars_ = net.init(jax.random.PRNGKey(0), x)
    got = damping_pallas(vars_["params"], x, interpret=True)
    want = net.apply(vars_, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4)
    assert bool(jnp.all(jnp.isfinite(got)))
