"""Synthetic two-view problems with known ground truth.

The reference has no test suite (SURVEY.md §4); its verification is
eval scripts against dataset ground truth.  For a hermetic test/bench
story we generate problems where the exact solution is known:

- a smooth band-limited random feature map (sum of low-frequency
  sinusoids) stands in for CNN features — smooth enough that bilinear
  resampling and local linearization behave like they do on real
  feature pyramids;
- reference-view point features are *defined* as the target map sampled
  at the ground-truth warp, so the GN residual is exactly zero at the
  true pose and convergence can be asserted to tight tolerances;
- ``make_synthetic_image_pair`` renders an actual RGB pair + depth by
  inverse-warping a procedural texture, for end-to-end model tests and
  training smoke runs (no dataset downloads are possible here).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from banet_tpu.geometry.camera import Intrinsics, backproject, warp_points
from banet_tpu.geometry.se3 import exp_so3
from banet_tpu.ops.resample import bilinear_sample


def smooth_feature_map(key, shape: Tuple[int, int, int, int],
                       num_waves: int = 24,
                       max_freq: float = 0.04) -> jnp.ndarray:
    """Band-limited random field: (B, H, W, C), values O(1), smooth."""
    B, H, W, C = shape
    k1, k2, k3 = jax.random.split(key, 3)
    freqs = max_freq * jax.random.normal(k1, (num_waves, 2))
    phases = 2 * jnp.pi * jax.random.uniform(k2, (B, num_waves, C))
    amps = jax.random.normal(k3, (B, num_waves, C)) / jnp.sqrt(num_waves)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    # (num_waves, H, W)
    carrier = freqs[:, 0:1, None] * yy[None] + freqs[:, 1:2, None] * xx[None]
    waves = jnp.sin(2 * jnp.pi * carrier[None, :, :, :, None]
                    + phases[:, :, None, None, :])
    return jnp.sum(amps[:, :, None, None, :] * waves, axis=1)


def make_two_view_problem(key, batch: int = 1, height: int = 64,
                          width: int = 80, channels: int = 8,
                          num_points: int = 256,
                          rot_magnitude: float = 0.05,
                          trans_magnitude: float = 0.05,
                          normalized_rays: bool = True,
                          basis_channels: int = 0) -> Dict:
    """Build a solvable two-view GN problem with known (R*, t*[, W*]).

    Returns a dict with everything the solvers consume plus the ground
    truth.  When ``basis_channels`` > 0 a depth basis and nonzero true
    coefficients W* are included (init_depth is the true depth *minus*
    basis . W*, so recovering W* fixes the depth).
    """
    ks = jax.random.split(key, 8)
    intr = Intrinsics(
        fx=jnp.full((batch,), 0.8 * width),
        fy=jnp.full((batch,), 0.8 * width),
        cx=jnp.full((batch,), width / 2.0),
        cy=jnp.full((batch,), height / 2.0),
    )
    # Points away from borders so the GT warp stays in-bounds.
    px = jax.random.uniform(ks[0], (batch, num_points), minval=0.2 * width,
                            maxval=0.8 * width)
    py = jax.random.uniform(ks[1], (batch, num_points), minval=0.2 * height,
                            maxval=0.8 * height)
    points = jnp.stack([px, py], axis=-1)
    rays = backproject(points, intr, normalized=normalized_rays)
    depth_true = jax.random.uniform(ks[2], (batch, num_points), minval=2.0,
                                    maxval=4.0)

    w_true = rot_magnitude * jax.random.normal(ks[3], (batch, 3))
    R_true = exp_so3(w_true)
    t_true = trans_magnitude * jax.random.normal(ks[4], (batch, 3))

    tgt = smooth_feature_map(ks[5], (batch, height, width, channels))

    out = dict(intr=intr, points=points, rays=rays, R_true=R_true,
               t_true=t_true, tgt_feats=tgt)

    if basis_channels:
        # Smooth per-point basis values and true coefficients.
        basis = 0.3 * smooth_feature_map(
            ks[6], (batch, height, width, basis_channels))
        b_pts = bilinear_sample(basis, points[..., 0], points[..., 1])
        W_true = 0.5 * jax.random.normal(ks[7], (batch, basis_channels))
        init_depth = depth_true - jnp.einsum("bnk,bk->bn", b_pts, W_true)
        out.update(basis_map=basis, basis_points=b_pts, W_true=W_true,
                   init_depth=init_depth, depth_true=depth_true)
    else:
        out.update(depth=depth_true)

    # Reference features = target features at the GT warp -> zero
    # residual at the true pose.
    gx, gy, *_ = warp_points(rays, depth_true, R_true, t_true, intr)
    out["ref_feats"] = bilinear_sample(tgt, gx, gy)
    return out


def make_synthetic_image_pair(key, batch: int = 1, height: int = 256,
                              width: int = 320,
                              rot_magnitude: float = 0.03,
                              trans_magnitude: float = 0.05) -> Dict:
    """Render an RGB image pair + dense depth with known relative pose.

    image2 is produced by inverse-warping a procedural texture through a
    smooth depth surface, so photometric consistency holds exactly up to
    resampling error.  Values are in [0, 255] like the reference input
    pipeline (the encoder divides by 255, reference enc.py:185).
    """
    ks = jax.random.split(key, 5)
    intr = Intrinsics(
        fx=jnp.full((batch,), 0.9 * width),
        fy=jnp.full((batch,), 0.9 * width),
        cx=jnp.full((batch,), width / 2.0),
        cy=jnp.full((batch,), height / 2.0),
    )
    tex = smooth_feature_map(ks[0], (batch, height, width, 3), num_waves=48,
                             max_freq=0.25)
    image1 = 127.5 + 100.0 * jnp.tanh(tex)

    # Smooth positive depth surface around 3m.
    bump = smooth_feature_map(ks[1], (batch, height, width, 1), num_waves=8,
                              max_freq=0.02)[..., 0]
    depth = 3.0 + jnp.tanh(bump)

    w_true = rot_magnitude * jax.random.normal(ks[2], (batch, 3))
    R = exp_so3(w_true)
    t = trans_magnitude * jax.random.normal(ks[3], (batch, 3))

    yy, xx = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32),
                          indexing="ij")
    grid = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)[None]
    grid = jnp.broadcast_to(grid, (batch, height * width, 2))
    rays = backproject(grid, intr, normalized=False)
    px, py, *_ = warp_points(rays, depth.reshape(batch, -1), R, t, intr)
    image2 = bilinear_sample(image1, px, py).reshape(batch, height, width, 3)

    return dict(image1=image1, image2=image2, depth=depth, intr=intr,
                R_true=R, t_true=t)
