"""Damped dense solves for the (6) / (6+K) GN systems.

Equivalent of the reference's damping + solve step:
  - pose-only: AtA += diag((diag+1e-5) * lambda); tf.matrix_solve
    (reference bundlenet.py:181-183) or QR (legacy/ba.py:292-293);
  - bundle: same but the LAST diagonal entry is left undamped
    (reference bundlenet.py:266: concat([diag[:-1]+1e-5, zeros])).

We solve in float32 via batched LU (``jnp.linalg.solve`` — the same
factorization family as the reference's ``tf.matrix_solve``); the
systems are tiny (<= ~40x40) and batched, so the solve is negligible
next to the feature convs.  Gradients flow through ``jnp.linalg.solve``
natively — the stable-gradient concern SURVEY.md §7 lists as hard part
#3 — with a NaN-safe recompute guard documented on ``damped_solve``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_lm_damping(AtA: jnp.ndarray, lam: jnp.ndarray,
                     diag_floor: float = 1e-5,
                     damp_last: bool = True) -> jnp.ndarray:
    """Levenberg-Marquardt diagonal damping.

    AtA: (..., P, P); lam: (...,) or (..., 1) learned damping.
    Adds diag((diag(AtA) + diag_floor) * lam), optionally excluding the
    last entry (reference bundlenet.py:266 leaves the final basis
    coefficient undamped)."""
    lam = lam.reshape(lam.shape + (1,) * (AtA.ndim - 1 - lam.ndim))
    d = jnp.diagonal(AtA, axis1=-2, axis2=-1)
    add = (d + diag_floor) * lam
    if not damp_last:
        add = add.at[..., -1].set(0.0)
    P = AtA.shape[-1]
    return AtA + add[..., None] * jnp.eye(P, dtype=AtA.dtype)


def damped_solve(AtA: jnp.ndarray, Atb: jnp.ndarray, lam: jnp.ndarray,
                 diag_floor: float = 1e-5, damp_last: bool = True,
                 dtype=jnp.float32) -> jnp.ndarray:
    """Solve (AtA + damping) x = Atb.  Atb: (..., P) -> x: (..., P).

    Singular/degenerate systems (e.g. every point masked out) return a
    zero update instead of non-finite values.  The guard uses the
    "probe then recompute on sanitized operands" pattern: a plain
    ``where`` on the output is not enough because reverse-mode AD
    multiplies the untaken branch's NaN primals by zero cotangents,
    which is still NaN — and gradients must flow through this solve for
    end-to-end training (SURVEY.md §7 hard part #3).
    """
    A = apply_lm_damping(AtA.astype(dtype), lam.astype(dtype), diag_floor,
                         damp_last)
    b = Atb.astype(dtype)[..., None]
    P = A.shape[-1]
    eye = jnp.eye(P, dtype=dtype)
    # Probe solve (non-differentiated) to detect singular systems.
    probe = jnp.linalg.solve(jax.lax.stop_gradient(A),
                             jax.lax.stop_gradient(b))
    ok = jnp.all(jnp.isfinite(probe), axis=(-2, -1), keepdims=True)
    A_safe = jnp.where(ok, A, eye)  # ok: (..., 1, 1) broadcasts over PxP
    x = jnp.linalg.solve(A_safe, b)
    return jnp.where(ok, x, jnp.zeros_like(x))[..., 0]
