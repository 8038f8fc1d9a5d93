import jax
import jax.numpy as jnp
import numpy as np

from banet_tpu.geometry.camera import Intrinsics
from banet_tpu.geometry.se3 import exp_so3
from banet_tpu.ops.render import forward_warp_render, replace_nonfinite


def make_scene(B=1, H=24, W=32):
    intr = Intrinsics(jnp.full((B,), 30.0), jnp.full((B,), 30.0),
                      jnp.full((B,), W / 2.0), jnp.full((B,), H / 2.0))
    img = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, 3))
    depth = jnp.full((B, H, W), 2.0)
    return intr, img, depth


class TestReplaceNonfinite:
    def test_scrub(self):
        x = jnp.array([1.0, jnp.nan, jnp.inf, -jnp.inf, 2.0])
        out = replace_nonfinite(x, -1.0)
        np.testing.assert_allclose(np.asarray(out), [1, -1, -1, -1, 2])


class TestForwardWarp:
    def test_identity_pose_is_identity(self):
        intr, img, depth = make_scene()
        R = jnp.eye(3)[None]
        t = jnp.zeros((1, 3))
        wimg, wdepth, mask = forward_warp_render(img, depth, R, t, intr)
        np.testing.assert_allclose(np.asarray(mask), 1.0)
        np.testing.assert_allclose(np.asarray(wimg), np.asarray(img),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(wdepth), 2.0, atol=1e-5)

    def test_x_translation_shifts_image(self):
        intr, img, depth = make_scene()
        R = jnp.eye(3)[None]
        # Camera moves -x => points move +x in camera frame; at depth 2,
        # fx 30, shift = 30*0.4/2 = 6 px.
        t = jnp.array([[0.4, 0.0, 0.0]])
        wimg, wdepth, mask = forward_warp_render(img, depth, R, t, intr)
        got = np.asarray(wimg[0, 10, 10:26])
        want = np.asarray(img[0, 10, 4:20])
        np.testing.assert_allclose(got, want, atol=1e-5)
        # Columns with nothing landing are masked out.
        assert float(mask[0, :, :6].mean()) < 0.1

    def test_zbuffer_keeps_nearest(self):
        # Two layers: left half at depth 1 (near), right half at depth 4.
        # Rotate so halves overlap after warping? Simpler: construct a
        # collision by scaling depth so two source pixels land on one
        # target pixel with different z.
        intr, img, depth = make_scene(H=8, W=8)
        H = W = 8
        img = jnp.arange(H * W, dtype=jnp.float32).reshape(1, H, W, 1)
        # A strong z-translation makes distant pixels converge toward
        # the center -> collisions; nearest (smallest z) must win.
        depth = jnp.where(
            (jnp.arange(W)[None, None, :] < W // 2), 1.0, 3.0
        ) * jnp.ones((1, H, W))
        R = jnp.eye(3)[None]
        t = jnp.array([[0.0, 0.0, 0.5]])
        wimg, wdepth, mask = forward_warp_render(img, depth, R, t, intr)
        # All rendered depths come from the z-warped sources; where both
        # layers collide, depth must be the smaller.
        d = np.asarray(wdepth[0])
        assert d[d > 0].min() >= 1.0 + 0.5 - 1e-5
        assert np.isfinite(np.asarray(wimg)).all()

    def test_depth_scale_variant(self):
        intr, img, depth = make_scene()
        R = jnp.eye(3)[None]
        t = jnp.zeros((1, 3))
        _, wd, _ = forward_warp_render(img, depth, R, t, intr,
                                       depth_scale=1.2)
        np.testing.assert_allclose(np.asarray(wd)[0, 5, 5], 2.4,
                                   atol=1e-5)

    def test_jit_and_vmap(self):
        intr, img, depth = make_scene(B=2)
        R = exp_so3(jnp.array([[0.02, 0, 0], [0, 0.02, 0]]))
        t = jnp.zeros((2, 3))
        f = jax.jit(lambda: forward_warp_render(img, depth, R, t, intr))
        wimg, wdepth, mask = f()
        assert wimg.shape == (2, 24, 32, 3)
        assert bool(jnp.all(jnp.isfinite(wimg)))
