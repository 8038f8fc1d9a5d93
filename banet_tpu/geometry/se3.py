"""SO(3)/SE(3) exponential-map helpers.

Capability parity with the reference math library (reference
bundlenet.py:6-47: ``rotation2quaternion``, ``AngleaAxisRotation``,
``VMatrix``), redesigned for JAX:

- every function is batched over arbitrary leading axes and autodiff-safe
  at theta -> 0 via Taylor series selected with ``jnp.where`` (the
  reference instead clamps theta at 1e-6, reference bundlenet.py:20,
  which biases small rotations and breaks second derivatives);
- ``rotation_to_quaternion`` uses the numerically robust four-branch
  form (the reference's single-branch version, bundlenet.py:6-15, NaNs
  for trace <= -1 — catalogued as a bug not to copy, SURVEY.md §7).

Convention: a pose (R, t) maps reference-frame points to target-frame
points, X_tgt = R X_ref + t.  Solver updates compose on the left with a
full SE(3) exponential: (R, t) <- (exp(w) R, V(w) u + exp(w) t), matching
the reference update rule (reference bundlenet.py:184-190).
"""

from __future__ import annotations

import jax.numpy as jnp

# Below this angle (radians) use Taylor expansions of the trig ratios.
_SMALL_THETA = 1e-4


def _hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [w]x, batched: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    rows = [
        jnp.stack([zero, -wz, wy], axis=-1),
        jnp.stack([wz, zero, -wx], axis=-1),
        jnp.stack([-wy, wx, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def _sin_over_theta(theta_sq: jnp.ndarray) -> jnp.ndarray:
    """sin(theta)/theta with Taylor fallback, given theta^2."""
    small = theta_sq < _SMALL_THETA**2
    # Double-where: sqrt must never see 0 or its grad is NaN even in the
    # untaken branch.
    safe = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    series = 1.0 - theta_sq / 6.0 + theta_sq * theta_sq / 120.0
    return jnp.where(small, series, jnp.sin(safe) / safe)


def _one_minus_cos_over_theta_sq(theta_sq: jnp.ndarray) -> jnp.ndarray:
    """(1 - cos(theta))/theta^2 with Taylor fallback."""
    small = theta_sq < _SMALL_THETA**2
    safe = jnp.where(small, 1.0, theta_sq)
    series = 0.5 - theta_sq / 24.0 + theta_sq * theta_sq / 720.0
    return jnp.where(small, series, (1.0 - jnp.cos(jnp.sqrt(safe))) / safe)


def _theta_minus_sin_over_theta_cubed(theta_sq: jnp.ndarray) -> jnp.ndarray:
    """(theta - sin(theta))/theta^3 with Taylor fallback."""
    small = theta_sq < _SMALL_THETA**2
    safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(safe)
    series = 1.0 / 6.0 - theta_sq / 120.0 + theta_sq * theta_sq / 5040.0
    return jnp.where(small, series, (theta - jnp.sin(theta)) / (theta * safe))


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation: (..., 3) axis-angle -> (..., 3, 3) matrix.

    Equivalent of reference ``AngleaAxisRotation`` (bundlenet.py:17-37)
    without the theta >= 1e-6 clamp.
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    a = _sin_over_theta(theta_sq)[..., None, None]
    b = _one_minus_cos_over_theta_sq(theta_sq)[..., None, None]
    K = _hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a * K + b * (K @ K)


def left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian V of SO(3): (..., 3) -> (..., 3, 3).

    exp_se3(w, u) has translation V(w) u.  Equivalent of reference
    ``VMatrix`` (bundlenet.py:39-46), which divides by theta^2 with no
    small-angle guard (NaN at exactly zero); here Taylor-safe.
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    b = _one_minus_cos_over_theta_sq(theta_sq)[..., None, None]
    c = _theta_minus_sin_over_theta_cubed(theta_sq)[..., None, None]
    K = _hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + b * K + c * (K @ K)


def se3_update(R: jnp.ndarray, t: jnp.ndarray, delta: jnp.ndarray):
    """Left-compose an SE(3) increment onto a pose.

    ``delta`` is (..., 6) = (w, u).  Returns
      R' = exp(w) R,
      t' = V(w) u + exp(w) t,
    the exact update of reference bundlenet.py:184-190 (dr @ R;
    V @ dt + dr @ T).  ``t`` has shape (..., 3).
    """
    w, u = delta[..., :3], delta[..., 3:]
    dR = exp_so3(w)
    V = left_jacobian(w)
    Rn = dR @ R
    tn = jnp.einsum("...ij,...j->...i", V, u) + jnp.einsum(
        "...ij,...j->...i", dR, t
    )
    return Rn, tn


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle vector (inverse of ``exp_so3``).

    Computed through the robust 4-branch quaternion, so it is stable
    over the whole rotation group including angles near pi (where the
    classic trace formula's sin(theta) denominator vanishes).  Returns
    w with ||w|| in [0, pi]."""
    q = rotation_to_quaternion(R)  # (w, x, y, z), w >= 0
    v = q[..., 1:]
    nv = jnp.linalg.norm(v, axis=-1, keepdims=True)
    w = q[..., 0:1]
    # theta = 2 atan2(||v||, w); w >= 0 so theta in [0, pi].
    # factor = theta / ||v||, with the Taylor limit 2/w as ||v|| -> 0.
    small = nv < 1e-6
    factor = jnp.where(
        small, 2.0 / jnp.maximum(w, 1e-12),
        2.0 * jnp.arctan2(nv, w) / jnp.where(small, 1.0, nv))
    return factor * v


def left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the SO(3) left Jacobian V (Taylor-guarded).

    V^{-1} = I - w^/2 + c w^2 with
    c = 1/theta^2 - (1 + cos theta) / (2 theta sin theta),
    c -> 1/12 + theta^2/720 as theta -> 0."""
    W = _hat(w)
    theta_sq = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-24))
    small = theta_sq < 1e-8
    c_exact = (1.0 / jnp.where(small, 1.0, theta_sq) -
               (1.0 + jnp.cos(theta)) /
               jnp.where(small, 1.0, 2.0 * theta * jnp.sin(theta)))
    c = jnp.where(small, 1.0 / 12.0 + theta_sq / 720.0, c_exact)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + c * (W @ W)


def se3_residual_increment(R: jnp.ndarray, t: jnp.ndarray,
                           R_tgt: jnp.ndarray,
                           t_tgt: jnp.ndarray) -> jnp.ndarray:
    """The (w, u) increment with ``se3_update(R, t, .) == (R_tgt, t_tgt)``.

    This is the per-level ground-truth residual target for cascade
    supervision (the increment that moves the running pose exactly onto
    the GT pose under the solver's left-composed update):
      exp(w) = R_tgt R^T,  u = V(w)^{-1} (t_tgt - exp(w) t).
    """
    dR = R_tgt @ jnp.swapaxes(R, -1, -2)
    w = log_so3(dR)
    u = jnp.einsum("...ij,...j->...i", left_jacobian_inv(w),
                   t_tgt - jnp.einsum("...ij,...j->...i", dR, t))
    return jnp.concatenate([w, u], axis=-1)


def compose(R1, t1, R2, t2):
    """(R1,t1) after (R2,t2): X -> R1 (R2 X + t2) + t1.

    Matches the world-frame pose chaining of the sequence driver
    (reference legacy/seq_example.py:170-173: Rg = R Rg_key,
    Tg = R T_key_world + ... expressed there in numpy)."""
    R = R1 @ R2
    t = jnp.einsum("...ij,...j->...i", R1, t2) + t1
    return R, t


def invert(R, t):
    """Inverse pose: X_tgt = R X_ref + t  =>  X_ref = R^T X_tgt - R^T t."""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def rotation_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), batched.

    Robust four-branch Shepperd form.  The reference's single-branch
    version (bundlenet.py:6-15) divides by sqrt(1+trace) and fails for
    trace <= -1; SURVEY.md §7 lists it as a bug not to replicate.  The
    returned quaternion has non-negative w (matching the sign fix-ups in
    reference legacy/eval.py:222-233).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions, each valid where its pivot is largest.
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    sw = safe_sqrt(1.0 + tr)  # 2*w pivot
    qw0 = jnp.stack(
        [0.5 * sw, (m21 - m12) / (2 * sw), (m02 - m20) / (2 * sw),
         (m10 - m01) / (2 * sw)], axis=-1)

    sx = safe_sqrt(1.0 + m00 - m11 - m22)
    qx0 = jnp.stack(
        [(m21 - m12) / (2 * sx), 0.5 * sx, (m01 + m10) / (2 * sx),
         (m02 + m20) / (2 * sx)], axis=-1)

    sy = safe_sqrt(1.0 - m00 + m11 - m22)
    qy0 = jnp.stack(
        [(m02 - m20) / (2 * sy), (m01 + m10) / (2 * sy), 0.5 * sy,
         (m12 + m21) / (2 * sy)], axis=-1)

    sz = safe_sqrt(1.0 - m00 - m11 + m22)
    qz0 = jnp.stack(
        [(m10 - m01) / (2 * sz), (m02 + m20) / (2 * sz),
         (m12 + m21) / (2 * sz), 0.5 * sz], axis=-1)

    # Pick branch by the largest pivot.
    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22,
                        -m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)[..., None]
    cands = jnp.stack([qw0, qx0, qy0, qz0], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None], axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonicalize sign: w >= 0.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q


def quaternion_to_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix, batched."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], axis=-1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], axis=-1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rotation_geodesic_angle(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle (radians) between two rotations, batched.

    Used by eval printouts equivalent to reference legacy/eval.py:234
    (there via quaternion dot products)."""
    Rrel = jnp.swapaxes(R1, -1, -2) @ R2
    tr = Rrel[..., 0, 0] + Rrel[..., 1, 1] + Rrel[..., 2, 2]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.arccos(cos)
