"""Fused Pallas GN kernel vs the XLA einsum path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.ba.residuals import warp_residuals
from banet_tpu.data.synthetic import make_two_view_problem
from banet_tpu.geometry.jacobians import camera_jacobian
from banet_tpu.ops.grad2d import append_spatial_gradient
from banet_tpu.ops.normal_eq import build_normal_equations
from banet_tpu.ops.pallas_gn import pose_normal_equations_pallas


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_xla_path(seed):
    B, C, N = 2, 8, 256  # N must be a multiple of TILE=128
    prob = make_two_view_problem(jax.random.PRNGKey(seed), batch=B,
                                 height=64, width=80, channels=C,
                                 num_points=N)
    tgt_fg = append_spatial_gradient(prob["tgt_feats"])
    R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    t = jnp.zeros((B, 3)) + jnp.array([0.02, 0.0, -0.01])

    # XLA reference path.
    wr = warp_residuals(prob["ref_feats"], tgt_fg, prob["rays"],
                        prob["depth"], R, t, prob["intr"])
    J = camera_jacobian(wr.x, wr.y, wr.z, prob["intr"].fx,
                        prob["intr"].fy)
    AtA_ref, Atb_ref = build_normal_equations(J, wr.G, wr.residual)
    absr_ref = jnp.sum(jnp.abs(wr.residual), axis=1)
    count_ref = jnp.sum(wr.mask, axis=1)

    AtA, Atb, absr, count = pose_normal_equations_pallas(
        tgt_fg, prob["ref_feats"], prob["rays"], prob["depth"], R, t,
        prob["intr"], interpret=True)

    np.testing.assert_allclose(np.asarray(count), np.asarray(count_ref),
                               atol=0.5)
    np.testing.assert_allclose(np.asarray(absr), np.asarray(absr_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(Atb), np.asarray(Atb_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(AtA), np.asarray(AtA_ref),
                               rtol=2e-3, atol=2e-2)


def test_out_of_bounds_points_masked():
    B, C, N = 1, 4, 128
    prob = make_two_view_problem(jax.random.PRNGKey(2), batch=B,
                                 height=64, width=80, channels=C,
                                 num_points=N)
    tgt_fg = append_spatial_gradient(prob["tgt_feats"])
    R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    # Huge translation throws every point out of frame.
    t = jnp.array([[50.0, 0.0, 0.0]])
    AtA, Atb, absr, count = pose_normal_equations_pallas(
        tgt_fg, prob["ref_feats"], prob["rays"], prob["depth"], R, t,
        prob["intr"], interpret=True)
    assert float(count[0]) == 0.0
    np.testing.assert_allclose(np.asarray(AtA), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Atb), 0.0, atol=1e-6)
