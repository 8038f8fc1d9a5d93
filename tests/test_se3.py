import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.geometry import se3


def random_w(key, n, scale=1.0):
    return scale * jax.random.normal(key, (n, 3))


class TestExpSO3:
    def test_orthonormal(self):
        w = random_w(jax.random.PRNGKey(0), 32)
        R = se3.exp_so3(w)
        eye = jnp.eye(3)
        err = jnp.abs(R @ jnp.swapaxes(R, -1, -2) - eye).max()
        assert err < 1e-5
        dets = jnp.linalg.det(R)
        np.testing.assert_allclose(dets, 1.0, atol=1e-5)

    def test_matches_scipy_formula(self):
        # Closed form check against numpy Rodrigues.
        w = np.array([0.3, -0.2, 0.5])
        theta = np.linalg.norm(w)
        k = w / theta
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R_np = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K
        R = se3.exp_so3(jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(R), R_np, atol=1e-6)

    def test_small_angle_taylor(self):
        # Tiny and exactly-zero rotations must be finite and ~identity.
        for scale in [0.0, 1e-9, 1e-5]:
            w = jnp.array([[scale, 0.0, 0.0]])
            R = se3.exp_so3(w)
            assert bool(jnp.all(jnp.isfinite(R)))
            np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-4)

    def test_grad_finite_at_zero(self):
        # The reference clamps theta (bundlenet.py:20) which kills
        # gradients at 0; ours must stay finite.
        g = jax.grad(lambda w: se3.exp_so3(w).sum())(jnp.zeros(3))
        assert bool(jnp.all(jnp.isfinite(g)))


class TestLeftJacobian:
    def test_matches_integral_definition(self):
        # V(w) = sum_k (theta K)^k / (k+1)!  -- check against series.
        w = np.array([0.4, 0.1, -0.3])
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        V_np = np.eye(3)
        term = np.eye(3)
        fact = 1.0
        for k in range(1, 20):
            term = term @ K
            fact *= k + 1
            V_np = V_np + term / fact
        V = se3.left_jacobian(jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(V), V_np, atol=1e-6)

    def test_finite_at_zero(self):
        V = se3.left_jacobian(jnp.zeros((1, 3)))
        np.testing.assert_allclose(np.asarray(V[0]), np.eye(3), atol=1e-6)


class TestSE3Update:
    def test_identity_delta(self):
        key = jax.random.PRNGKey(1)
        R = se3.exp_so3(random_w(key, 4))
        t = jax.random.normal(jax.random.PRNGKey(2), (4, 3))
        Rn, tn = se3.se3_update(R, t, jnp.zeros((4, 6)))
        np.testing.assert_allclose(np.asarray(Rn), np.asarray(R), atol=1e-6)
        np.testing.assert_allclose(np.asarray(tn), np.asarray(t), atol=1e-6)

    def test_composition_is_group_action(self):
        # Applying delta then delta_inv must return to start (first order
        # exact since SE(3) exp of +/-xi are exact inverses).
        delta = jnp.array([[0.1, -0.2, 0.05, 0.3, 0.0, -0.1]])
        R0 = se3.exp_so3(jnp.array([[0.2, 0.1, -0.4]]))
        t0 = jnp.array([[1.0, -2.0, 0.5]])
        R1, t1 = se3.se3_update(R0, t0, delta)
        R2, t2 = se3.se3_update(R1, t1, -delta)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t0), atol=1e-5)

    def test_matches_reference_formula(self):
        # Reference update (bundlenet.py:184-190):
        #   R' = exp(w) R ; T' = V(w) u + exp(w) T.
        delta = jnp.array([[0.2, -0.1, 0.3, 0.5, 0.2, -0.7]])
        R = se3.exp_so3(jnp.array([[-0.3, 0.2, 0.1]]))
        t = jnp.array([[0.3, 0.4, -0.2]])
        Rn, tn = se3.se3_update(R, t, delta)
        dR = se3.exp_so3(delta[:, :3])
        V = se3.left_jacobian(delta[:, :3])
        np.testing.assert_allclose(np.asarray(Rn), np.asarray(dR @ R),
                                   atol=1e-6)
        expected_t = (V @ delta[:, 3:, None])[..., 0] + (dR @ t[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(tn), np.asarray(expected_t),
                                   atol=1e-6)


class TestQuaternion:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_roundtrip(self, seed):
        w = random_w(jax.random.PRNGKey(seed), 16, scale=2.0)
        R = se3.exp_so3(w)
        q = se3.rotation_to_quaternion(R)
        R2 = se3.quaternion_to_rotation(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_robust_at_trace_minus_one(self):
        # 180-degree rotation about x: trace = -1 NaNs the reference
        # single-branch form (bundlenet.py:6-15); ours must be exact.
        R = jnp.diag(jnp.array([1.0, -1.0, -1.0]))
        q = se3.rotation_to_quaternion(R)
        assert bool(jnp.all(jnp.isfinite(q)))
        np.testing.assert_allclose(np.asarray(jnp.abs(q)),
                                   [0.0, 1.0, 0.0, 0.0], atol=1e-6)

    def test_w_nonnegative(self):
        w = random_w(jax.random.PRNGKey(7), 64, scale=3.0)
        q = se3.rotation_to_quaternion(se3.exp_so3(w))
        assert bool(jnp.all(q[:, 0] >= -1e-7))


class TestComposeInvert:
    def test_invert(self):
        R = se3.exp_so3(jnp.array([[0.3, -0.2, 0.4]]))
        t = jnp.array([[1.0, 2.0, 3.0]])
        Ri, ti = se3.invert(R, t)
        Rc, tc = se3.compose(Ri, ti, R, t)
        np.testing.assert_allclose(np.asarray(Rc[0]), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(tc[0]), np.zeros(3), atol=1e-6)

    def test_geodesic_angle(self):
        R1 = se3.exp_so3(jnp.array([[0.0, 0.0, 0.0]]))
        R2 = se3.exp_so3(jnp.array([[0.25, 0.0, 0.0]]))
        ang = se3.rotation_geodesic_angle(R1, R2)
        np.testing.assert_allclose(np.asarray(ang), [0.25], atol=1e-6)


class TestLogAndResidual:
    def test_log_so3_roundtrip(self):
        for scale in (1e-8, 1e-4, 0.3, 1.5, 3.0):
            w = random_w(jax.random.PRNGKey(11), 32, scale=scale)
            # Keep ||w|| < pi so the log is the unique inverse.
            n = jnp.linalg.norm(w, axis=-1, keepdims=True)
            w = jnp.where(n > 3.1, w * (3.1 / n), w)
            w_back = se3.log_so3(se3.exp_so3(w))
            np.testing.assert_allclose(np.asarray(w_back), np.asarray(w),
                                       atol=1e-4)

    def test_log_so3_near_pi(self):
        w = jnp.array([[3.14, 0.0, 0.0], [0.0, -3.13, 0.01]])
        w_back = se3.log_so3(se3.exp_so3(w))
        # Sign of the axis may flip only at exactly pi; these are below.
        np.testing.assert_allclose(np.asarray(w_back), np.asarray(w),
                                   atol=1e-3)

    def test_left_jacobian_inverse(self):
        w = random_w(jax.random.PRNGKey(12), 16, scale=1.0)
        V = se3.left_jacobian(w)
        Vi = se3.left_jacobian_inv(w)
        eye = np.broadcast_to(np.eye(3), (16, 3, 3))
        np.testing.assert_allclose(np.asarray(V @ Vi), eye, atol=1e-5)
        w0 = jnp.zeros((2, 3))
        np.testing.assert_allclose(
            np.asarray(se3.left_jacobian_inv(w0)),
            np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)

    def test_residual_increment_reaches_target(self):
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(13), 4)
        R = se3.exp_so3(0.3 * jax.random.normal(k1, (8, 3)))
        t = jax.random.normal(k2, (8, 3))
        Rg = se3.exp_so3(0.3 * jax.random.normal(k3, (8, 3)))
        tg = jax.random.normal(k4, (8, 3))
        delta = se3.se3_residual_increment(R, t, Rg, tg)
        Rn, tn = se3.se3_update(R, t, delta)
        np.testing.assert_allclose(np.asarray(Rn), np.asarray(Rg),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(tn), np.asarray(tg),
                                   atol=1e-4)

    def test_residual_increment_zero_at_target(self):
        R = se3.exp_so3(jnp.array([[0.2, 0.1, -0.3]]))
        t = jnp.array([[0.5, -1.0, 2.0]])
        delta = se3.se3_residual_increment(R, t, R, t)
        np.testing.assert_allclose(np.asarray(delta), 0.0, atol=1e-6)
