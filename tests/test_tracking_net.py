"""DeepTAM-class tracking network: shapes, finiteness, near-zero motion
at init, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.geometry.camera import Intrinsics
from banet_tpu.models.tracking_net import TrackingNet

B, H, W = 1, 32, 48


@pytest.fixture(scope="module")
def net_and_vars():
    net = TrackingNet(levels=3, num_samples=16)
    key_img = 255.0 * jax.random.uniform(jax.random.PRNGKey(0),
                                         (B, H, W, 3))
    cur_img = 255.0 * jax.random.uniform(jax.random.PRNGKey(1),
                                         (B, H, W, 3))
    depth = jnp.full((B, H, W), 2.0)
    intr = Intrinsics(jnp.full((B,), 40.0), jnp.full((B,), 40.0),
                      jnp.full((B,), W / 2.0), jnp.full((B,), H / 2.0))
    vars_ = net.init(jax.random.PRNGKey(2), key_img, depth, cur_img, intr)
    return net, vars_, (key_img, depth, cur_img, intr)


def test_output_shapes(net_and_vars):
    net, vars_, (ki, d, ci, intr) = net_and_vars
    out = net.apply(vars_, ki, d, ci, intr)
    assert out.R.shape == (B, 3, 3)
    assert out.t.shape == (B, 3)
    assert len(out.motion_samples) == 3
    assert out.motion_samples[0].shape == (B, 16, 6)
    assert out.motion_std.shape == (B, 6)
    assert len(out.flows) == 3
    # coarse level at 1/4 resolution
    assert out.flows[0].shape == (B, H // 4, W // 4, 3)


def test_untrained_predicts_near_identity(net_and_vars):
    net, vars_, (ki, d, ci, intr) = net_and_vars
    out = net.apply(vars_, ki, d, ci, intr)
    # Small-init motion head => pose stays near the initial guess.
    np.testing.assert_allclose(np.asarray(out.R[0]), np.eye(3), atol=0.05)
    assert float(jnp.linalg.norm(out.t)) < 0.05
    assert bool(jnp.all(jnp.isfinite(out.R)))


def test_respects_initial_pose(net_and_vars):
    net, vars_, (ki, d, ci, intr) = net_and_vars
    from banet_tpu.geometry.se3 import exp_so3

    R0 = exp_so3(jnp.array([[0.0, 0.3, 0.0]]))
    t0 = jnp.array([[0.2, 0.0, 0.1]])
    out = net.apply(vars_, ki, d, ci, intr, R0, t0)
    # Near-zero increments keep the pose near (R0, t0).
    np.testing.assert_allclose(np.asarray(out.R), np.asarray(R0),
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(t0),
                               atol=0.05)


def test_gradients_flow(net_and_vars):
    net, vars_, (ki, d, ci, intr) = net_and_vars

    def loss(params):
        out = net.apply({"params": params}, ki, d, ci, intr)
        return jnp.sum(out.t ** 2) + jnp.sum((out.R - jnp.eye(3)) ** 2)

    g = jax.grad(loss)(vars_["params"])
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
    assert sum(float(jnp.abs(x).sum()) for x in leaves) > 0
