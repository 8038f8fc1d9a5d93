"""Analytic projection Jacobians for the Gauss-Newton BA layer.

Equivalents of reference ``CameraJacobianMatrix`` (bundlenet.py:49-61)
and ``DepthJacobianMatrix`` (bundlenet.py:63-74), in the clean sign
convention documented below and verified against ``jax.jacfwd`` of the
actual warp in tests/test_jacobians.py.

Convention.  Let Y = (R p) d + t be a warped point, (x, y) = (X/Z, Y/Z),
and the projection (px, py) = (fx x + cx, fy y + cy).  Solver updates
perturb the pose on the left, Y' = exp(w) Y + V(w) u  ~  Y + w x Y + u,
so

  d(px,py)/d(w,u)  =  (f/Z) [dx/dY] [-[Y]x | I]

which evaluates to the rows returned here:

  dpx/d(w,u) = fx [ -x y,  1 + x^2,  -y,   1/Z,  0,   -x/Z ]
  dpy/d(w,u) = fy [ -1-y^2,  x y,     x,   0,    1/Z, -y/Z ]

This equals the reference's ``-tf.stack([dx, dy])`` including its global
minus (bundlenet.py:60); the reference's legacy variant omits the minus
and compensates by flipping the residual sign (legacy/ba.py:47 vs
:180) — we keep one convention everywhere: J = +d(proj)/d(params) and
residual r = f_tgt(warp) - f_ref, stepped with delta = -H^{-1} g.

The depth Jacobian is d(px,py)/dd for Y = (R p) d + t:

  dpx/dd = fx (r_x - r_z x) / Z,   dpy/dd = fy (r_y - r_z y) / Z

with r = R p the rotated ray (reference bundlenet.py:63-74).
"""

from __future__ import annotations

import jax.numpy as jnp


def camera_jacobian(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray,
                    fx: jnp.ndarray, fy: jnp.ndarray) -> jnp.ndarray:
    """d(px,py)/d(w,u): (..., N) inputs -> (..., N, 2, 6).

    x, y are normalized target-image coordinates X/Z, Y/Z; z is the
    warped depth Z; fx, fy broadcast over points.
    """
    inv_z = 1.0 / z
    zeros = jnp.zeros_like(x)
    fx = jnp.broadcast_to(fx[..., None] if fx.ndim < x.ndim else fx, x.shape)
    fy = jnp.broadcast_to(fy[..., None] if fy.ndim < x.ndim else fy, x.shape)
    du = fx[..., None] * jnp.stack(
        [-x * y, 1.0 + x * x, -y, inv_z, zeros, -x * inv_z], axis=-1)
    dv = fy[..., None] * jnp.stack(
        [-1.0 - y * y, x * y, x, zeros, inv_z, -y * inv_z], axis=-1)
    return jnp.stack([du, dv], axis=-2)


def depth_jacobian(rotated_rays: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                   z: jnp.ndarray, fx: jnp.ndarray,
                   fy: jnp.ndarray) -> jnp.ndarray:
    """d(px,py)/d(depth): -> (..., N, 2).

    rotated_rays: (..., N, 3) = R p (reference bundlenet.py:209-210 rx,
    ry, rz).  Matches reference ``DepthJacobianMatrix``
    (bundlenet.py:63-74)."""
    rx, ry, rz = (rotated_rays[..., 0], rotated_rays[..., 1],
                  rotated_rays[..., 2])
    fx = jnp.broadcast_to(fx[..., None] if fx.ndim < x.ndim else fx, x.shape)
    fy = jnp.broadcast_to(fy[..., None] if fy.ndim < x.ndim else fy, x.shape)
    du = fx * (rx - rz * x) / z
    dv = fy * (ry - rz * y) / z
    return jnp.stack([du, dv], axis=-1)
