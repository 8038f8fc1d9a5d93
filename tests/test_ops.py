import jax
import jax.numpy as jnp
import numpy as np
import pytest

from banet_tpu.ops import (append_spatial_gradient, bilinear_sample,
                           bilinear_sample_with_mask, build_normal_equations,
                           damped_solve, inbounds_mask, spatial_gradient,
                           upsample2x_bilinear)


class TestSpatialGradient:
    def test_matches_manual_central_difference(self):
        key = jax.random.PRNGKey(0)
        f = jax.random.normal(key, (2, 8, 10, 3))
        g = spatial_gradient(f)
        assert g.shape == (2, 8, 10, 6)
        # Interior point check against the definition.
        gx_manual = 0.5 * (f[:, 3, 5, :] - f[:, 3, 3, :])
        gy_manual = 0.5 * (f[:, 4, 4, :] - f[:, 2, 4, :])
        np.testing.assert_allclose(np.asarray(g[:, 3, 4, :3]),
                                   np.asarray(gx_manual), atol=1e-6)
        np.testing.assert_allclose(np.asarray(g[:, 3, 4, 3:]),
                                   np.asarray(gy_manual), atol=1e-6)

    def test_reflect_boundary(self):
        # REFLECT pad => gradient at border uses mirrored neighbor
        # (reference bundlenet.py:97).
        f = jnp.arange(5.0).reshape(1, 1, 5, 1) * jnp.ones((1, 4, 1, 1))
        g = spatial_gradient(f)
        # At x=0: reflect gives f[1] on both sides? No: pad REFLECT makes
        # p[0]=f[1], so gx[0] = 0.5*(f[1]-f[1]) = 0.
        np.testing.assert_allclose(np.asarray(g[0, :, 0, 0]), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g[0, :, 2, 0]), 1.0, atol=1e-6)

    def test_append(self):
        f = jnp.ones((1, 4, 4, 2))
        out = append_spatial_gradient(f)
        assert out.shape == (1, 4, 4, 6)
        np.testing.assert_allclose(np.asarray(out[..., :2]), 1.0)


class TestBilinearSample:
    def _reference_sample(self, feat, px, py):
        """Straightforward numpy bilinear with zero padding."""
        B, H, W, C = feat.shape
        N = px.shape[1]
        out = np.zeros((B, N, C), np.float64)
        for b in range(B):
            for n in range(N):
                x, y = float(px[b, n]), float(py[b, n])
                x0, y0 = int(np.floor(x)), int(np.floor(y))
                wx, wy = x - x0, y - y0
                for (yi, xi, w) in [(y0, x0, (1 - wx) * (1 - wy)),
                                    (y0, x0 + 1, wx * (1 - wy)),
                                    (y0 + 1, x0, (1 - wx) * wy),
                                    (y0 + 1, x0 + 1, wx * wy)]:
                    if 0 <= xi < W and 0 <= yi < H:
                        out[b, n] += w * feat[b, yi, xi]
        return out

    def test_matches_reference(self):
        key = jax.random.PRNGKey(1)
        feat = jax.random.normal(key, (2, 9, 11, 4))
        px = jax.random.uniform(jax.random.PRNGKey(2), (2, 20),
                                minval=-2.0, maxval=12.0)
        py = jax.random.uniform(jax.random.PRNGKey(3), (2, 20),
                                minval=-2.0, maxval=10.0)
        got = bilinear_sample(feat, px, py)
        want = self._reference_sample(np.asarray(feat), np.asarray(px),
                                      np.asarray(py))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_matches_map_coordinates_interior(self):
        # Cross-check with jax.scipy.ndimage.map_coordinates for
        # strictly-interior points (SURVEY.md §4 test strategy).
        from jax.scipy.ndimage import map_coordinates
        key = jax.random.PRNGKey(4)
        feat = jax.random.normal(key, (1, 16, 16, 1))
        px = jax.random.uniform(jax.random.PRNGKey(5), (1, 30),
                                minval=1.0, maxval=14.0)
        py = jax.random.uniform(jax.random.PRNGKey(6), (1, 30),
                                minval=1.0, maxval=14.0)
        got = bilinear_sample(feat, px, py)[0, :, 0]
        want = map_coordinates(feat[0, :, :, 0], [py[0], px[0]], order=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_integer_points_exact(self):
        feat = jnp.arange(24.0).reshape(1, 4, 6, 1)
        px = jnp.array([[0.0, 5.0, 2.0]])
        py = jnp.array([[0.0, 3.0, 1.0]])
        got = bilinear_sample(feat, px, py)[0, :, 0]
        np.testing.assert_allclose(np.asarray(got), [0.0, 23.0, 8.0],
                                   atol=1e-6)

    def test_mask_semantics(self):
        # Strictly inside [0, W-1] x [0, H-1] (reference bundlenet.py:155).
        m = inbounds_mask(jnp.array([[-0.1, 0.0, 4.0, 4.1]]),
                          jnp.array([[1.0, 1.0, 1.0, 1.0]]), 8, 5)
        np.testing.assert_allclose(np.asarray(m[0]), [0, 1, 1, 0])

    def test_differentiable_in_points(self):
        feat = jnp.arange(36.0).reshape(1, 6, 6, 1)

        def f(px):
            return bilinear_sample(feat, px[None, None], jnp.array([[2.3]])).sum()

        g = jax.grad(f)(jnp.asarray(2.5))
        # d/dx of a bilinear interpolant along x = horizontal difference = 1.
        np.testing.assert_allclose(float(g), 1.0, atol=1e-5)

    def test_block_variant_parity(self):
        # Single-gather 2x2-block formulation must match bitwise,
        # including gradients (see ops/resample.bilinear_sample_block).
        from banet_tpu.ops.resample import bilinear_sample_block

        feat = jax.random.normal(jax.random.PRNGKey(7), (2, 9, 11, 4))
        px = jax.random.uniform(jax.random.PRNGKey(8), (2, 40),
                                minval=-3.0, maxval=14.0)
        py = jax.random.uniform(jax.random.PRNGKey(9), (2, 40),
                                minval=-3.0, maxval=12.0)
        a = bilinear_sample(feat, px, py)
        b = bilinear_sample_block(feat, px, py)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
        ga = jax.grad(lambda f: bilinear_sample(f, px, py).sum())(feat)
        gb = jax.grad(lambda f: bilinear_sample_block(f, px, py).sum())(
            feat)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=1e-6)

    def test_with_mask_wrapper(self):
        feat = jnp.ones((1, 4, 4, 2))
        vals, mask = bilinear_sample_with_mask(
            feat, jnp.array([[1.0, 9.0]]), jnp.array([[1.0, 1.0]]))
        assert vals.shape == (1, 2, 2)
        np.testing.assert_allclose(np.asarray(mask[0]), [1.0, 0.0])


class TestNormalEquations:
    def _dense_reference(self, J, G, r, mask=None):
        # Direct definition: M_n = G_n J_n ; AtA = sum M^T M ; Atb = sum M^T r.
        M = np.einsum("bnci,bnip->bncp", G, J)
        if mask is not None:
            M = M * mask[..., None, None]
            r = r * mask[..., None]
        AtA = np.einsum("bncp,bncq->bpq", M, M)
        # With binary mask, mask^2 == mask, matching the single-mask fold.
        Atb = np.einsum("bncp,bnc->bp", M, r)
        return AtA, Atb

    def test_matches_dense_reference(self):
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 3)
        B, N, C, P = 2, 37, 5, 8
        J = jax.random.normal(ks[0], (B, N, 2, P))
        G = jax.random.normal(ks[1], (B, N, C, 2))
        r = jax.random.normal(ks[2], (B, N, C))
        AtA, Atb = build_normal_equations(J, G, r)
        AtA_ref, Atb_ref = self._dense_reference(
            np.asarray(J), np.asarray(G), np.asarray(r))
        np.testing.assert_allclose(np.asarray(AtA), AtA_ref, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(Atb), Atb_ref, rtol=1e-4,
                                   atol=1e-4)

    def test_mask(self):
        key = jax.random.PRNGKey(1)
        ks = jax.random.split(key, 4)
        B, N, C, P = 1, 16, 3, 6
        J = jax.random.normal(ks[0], (B, N, 2, P))
        G = jax.random.normal(ks[1], (B, N, C, 2))
        r = jax.random.normal(ks[2], (B, N, C))
        mask = (jax.random.uniform(ks[3], (B, N)) > 0.5).astype(jnp.float32)
        AtA, Atb = build_normal_equations(J, G, r, mask=mask)
        AtA_ref, Atb_ref = self._dense_reference(
            np.asarray(J), np.asarray(G), np.asarray(r), np.asarray(mask))
        np.testing.assert_allclose(np.asarray(AtA), AtA_ref, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(Atb), Atb_ref, rtol=1e-4,
                                   atol=1e-4)

    def test_gradcheck_vs_dense(self):
        # The autodiff VJP of the einsum formulation must equal the VJP
        # of the dense definition — this is the capability the reference
        # hand-wrote 275 lines of CUDA for (utils.cu:420-694).
        key = jax.random.PRNGKey(2)
        ks = jax.random.split(key, 3)
        B, N, C, P = 1, 9, 4, 7
        J = jax.random.normal(ks[0], (B, N, 2, P))
        G = jax.random.normal(ks[1], (B, N, C, 2))
        r = jax.random.normal(ks[2], (B, N, C))

        def loss_ours(J, G, r):
            AtA, Atb = build_normal_equations(J, G, r)
            return (jnp.sin(AtA).sum() + (Atb ** 2).sum())

        def loss_dense(J, G, r):
            M = jnp.einsum("bnci,bnip->bncp", G, J)
            AtA = jnp.einsum("bncp,bncq->bpq", M, M)
            Atb = jnp.einsum("bncp,bnc->bp", M, r)
            return (jnp.sin(AtA).sum() + (Atb ** 2).sum())

        g1 = jax.grad(loss_ours, argnums=(0, 1, 2))(J, G, r)
        g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(J, G, r)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


class TestDampedSolve:
    def test_solves_spd_system(self):
        key = jax.random.PRNGKey(0)
        A0 = jax.random.normal(key, (3, 6, 6))
        AtA = A0 @ jnp.swapaxes(A0, -1, -2) + 0.1 * jnp.eye(6)
        x_true = jax.random.normal(jax.random.PRNGKey(1), (3, 6))
        Atb = jnp.einsum("bij,bj->bi", AtA, x_true)
        x = damped_solve(AtA, Atb, lam=jnp.zeros((3,)), diag_floor=0.0)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                                   rtol=1e-3, atol=1e-3)

    def test_damping_matches_reference_formula(self):
        # AtA + diag((diag+1e-5)*lam) then solve (bundlenet.py:181-183).
        key = jax.random.PRNGKey(2)
        A0 = jax.random.normal(key, (1, 4, 4))
        AtA = A0 @ jnp.swapaxes(A0, -1, -2) + jnp.eye(4)
        Atb = jnp.ones((1, 4))
        lam = jnp.array([0.7])
        x = damped_solve(AtA, Atb, lam, diag_floor=1e-5)
        d = jnp.diagonal(AtA, axis1=-2, axis2=-1)
        A_damped = AtA[0] + jnp.diag((d[0] + 1e-5) * 0.7)
        x_ref = jnp.linalg.solve(A_damped, Atb[0])
        np.testing.assert_allclose(np.asarray(x[0]), np.asarray(x_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_damp_last_false(self):
        # Reference bundle quirk (bundlenet.py:266).
        AtA = jnp.eye(3)[None] * 2.0
        Atb = jnp.ones((1, 3))
        lam = jnp.array([1.0])
        x = damped_solve(AtA, Atb, lam, diag_floor=0.0, damp_last=False)
        # First two entries: 1/(2+2), last: 1/2.
        np.testing.assert_allclose(np.asarray(x[0]), [0.25, 0.25, 0.5],
                                   atol=1e-5)


class TestUpsample:
    def test_partition_of_unity(self):
        x = jnp.ones((1, 5, 7, 3))
        y = upsample2x_bilinear(x)
        assert y.shape == (1, 10, 14, 3)
        np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-5)

    def test_linear_ramp_interior(self):
        # A linear ramp must upsample to a linear ramp (half the slope)
        # away from borders.
        x = jnp.arange(8.0).reshape(1, 1, 8, 1) * jnp.ones((1, 6, 1, 1))
        y = upsample2x_bilinear(x)
        interior = np.asarray(y[0, 5, 4:12, 0])
        diffs = np.diff(interior)
        np.testing.assert_allclose(diffs, 0.5, atol=1e-5)

    def test_interleave_matches_conv_formulation(self):
        # The production separable-interleave path must match the
        # literal reference construction (symmetric pad + 4x4 stride-2
        # depthwise conv_transpose + crop) to float tolerance, both in
        # values and in gradient (the DLA decoder differentiates it).
        from banet_tpu.ops.upsample import upsample2x_bilinear_conv

        x = jnp.asarray(np.random.RandomState(3).rand(2, 5, 7, 3),
                        jnp.float32)
        np.testing.assert_allclose(np.asarray(upsample2x_bilinear(x)),
                                   np.asarray(upsample2x_bilinear_conv(x)),
                                   atol=1e-6)
        g1 = jax.grad(lambda v: jnp.sum(jnp.sin(upsample2x_bilinear(v))))(x)
        g2 = jax.grad(
            lambda v: jnp.sum(jnp.sin(upsample2x_bilinear_conv(v))))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-5)

    def test_kernel_values_match_reference(self):
        from banet_tpu.ops.upsample import _KERNEL_2D
        expected = np.array([[0.0625, 0.1875, 0.1875, 0.0625],
                             [0.1875, 0.5625, 0.5625, 0.1875],
                             [0.1875, 0.5625, 0.5625, 0.1875],
                             [0.0625, 0.1875, 0.1875, 0.0625]])
        np.testing.assert_allclose(_KERNEL_2D, expected)


class TestFootprintSampler:
    def _setup(self, seed=0, B=2, H=24, W=30, C=5, N=64):
        import jax
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        f = jax.random.normal(ks[0], (B, H, W, C))
        px = jax.random.uniform(ks[1], (B, N), minval=-3.0,
                                maxval=W + 2.0)
        py = jax.random.uniform(ks[2], (B, N), minval=-3.0,
                                maxval=H + 2.0)
        return f, px, py

    def test_value_and_mask_match_four_tap(self):
        from banet_tpu.ops.resample import (bilinear_sample_with_mask,
                                            make_footprint_map,
                                            sample_footprint)
        f, px, py = self._setup()
        H, W = f.shape[1], f.shape[2]
        fp = make_footprint_map(f)
        v, gx, gy, m = sample_footprint(fp, H, W, px, py)
        v_ref, m_ref = bilinear_sample_with_mask(f, px, py)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(m), np.asarray(m_ref))

    def test_gradient_is_interpolant_derivative(self):
        import jax
        from banet_tpu.ops.resample import (bilinear_sample,
                                            make_footprint_map,
                                            sample_footprint)
        f, px, py = self._setup(seed=1)
        H, W = f.shape[1], f.shape[2]
        # Keep strictly inside cells (the interpolant's derivative is
        # discontinuous at integer boundaries, where a central
        # difference would straddle two cells).
        px = jnp.floor(jnp.clip(px, 1.0, W - 3.0)) + 0.4
        py = jnp.floor(jnp.clip(py, 1.0, H - 3.0)) + 0.6
        fp = make_footprint_map(f)
        _, gx, gy, _ = sample_footprint(fp, H, W, px, py)
        # The interpolant is linear within a cell, so a wide central
        # difference (still inside the cell) is exact and avoids f32
        # cancellation noise.
        eps = 0.05
        num_gx = (bilinear_sample(f, px + eps, py) -
                  bilinear_sample(f, px - eps, py)) / (2 * eps)
        num_gy = (bilinear_sample(f, px, py + eps) -
                  bilinear_sample(f, px, py - eps)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(num_gx),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(gy), np.asarray(num_gy),
                                   atol=1e-3)

    def test_out_of_bounds_is_zero(self):
        from banet_tpu.ops.resample import (make_footprint_map,
                                            sample_footprint)
        f, _, _ = self._setup(seed=2)
        H, W = f.shape[1], f.shape[2]
        fp = make_footprint_map(f)
        px = jnp.array([[-50.0, W + 7.0, W - 0.5]])
        py = jnp.array([[5.0, 5.0, H + 0.5]])
        v, gx, gy, m = sample_footprint(fp, H, W, px[:, :],
                                        py[:, :])
        np.testing.assert_allclose(np.asarray(v[0, :2]), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(m[0]), [0.0, 0.0, 0.0])

    def test_direct_mode_matches_footprint(self):
        from banet_tpu.ops.resample import (make_footprint_map,
                                            sample_footprint,
                                            sample_with_gradient)
        f, px, py = self._setup(seed=3)
        H, W = f.shape[1], f.shape[2]
        fp = make_footprint_map(f)
        v1, gx1, gy1, m1 = sample_footprint(fp, H, W, px, py)
        v2, gx2, gy2, m2 = sample_with_gradient(f, px, py)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        # Gradients agree wherever every tap is in-bounds (the modes
        # differ only in how out-of-range taps are zeroed).
        inner = ((px >= 1) & (px <= W - 2) & (py >= 1) &
                 (py <= H - 2)).astype(np.float32)[..., None]
        np.testing.assert_allclose(np.asarray(gx1 * inner),
                                   np.asarray(gx2 * inner), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gy1 * inner),
                                   np.asarray(gy2 * inner), atol=1e-5)
