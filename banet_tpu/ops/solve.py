"""Damped dense solves for the (6) / (6+K) GN systems.

Equivalent of the reference's damping + solve step:
  - pose-only: AtA += diag((diag+1e-5) * lambda); tf.matrix_solve
    (reference bundlenet.py:181-183) or QR (legacy/ba.py:292-293);
  - bundle: same but the LAST diagonal entry is left undamped
    (reference bundlenet.py:266: concat([diag[:-1]+1e-5, zeros])).

We solve in float32 via Cholesky (the damped system is symmetric
positive definite by construction) with an LU fallback when Cholesky
produces non-finite values; both lower to batched XLA linalg that runs
fine on TPU for these tiny (<= ~40x40) systems.  Gradients flow through
``jax.scipy.linalg.cho_solve`` / ``jnp.linalg.solve`` natively — the
stable-gradient concern SURVEY.md §7 lists as hard part #3.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import jax.scipy.linalg as jsl


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
    """Solve (AtA + damping) x = Atb.  Atb: (..., P) -> x: (..., P)."""
    A = apply_lm_damping(AtA.astype(dtype), lam.astype(dtype), diag_floor,
                         damp_last)
    b = Atb.astype(dtype)[..., None]
    L = jsl.cholesky(A, lower=True)
    x_chol = jsl.cho_solve((L, True), b)
    ok = jnp.all(jnp.isfinite(x_chol), axis=(-2, -1), keepdims=True)
    # LU fallback for indefinite corners (e.g. the undamped last diagonal
    # entry of the bundle system can make A barely non-PD).
    x_lu = jnp.linalg.solve(A, b)
    return jnp.where(ok, x_chol, x_lu)[..., 0]
