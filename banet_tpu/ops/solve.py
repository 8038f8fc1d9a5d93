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


def cholesky_solve_unrolled(A: jnp.ndarray, b: jnp.ndarray,
                            eps: float = 1e-20) -> jnp.ndarray:
    """Solve SPD A x = b with a fully unrolled Cholesky (small static P).

    ``jnp.linalg.solve`` lowers to a sequential LU loop on TPU — dozens
    of tiny kernels per call, which dominates the GN iteration at B=1
    (the 6x6 solve is ~100 flops but costs ~the whole rest of the
    iteration in dispatch).  Unrolling the factorization into scalar
    jnp ops lets XLA fuse the entire solve into the surrounding
    elementwise work: zero extra kernel launches.

    A: (..., P, P) symmetric positive (semi-)definite — the damped GN
    normal matrix; b: (..., P).  The ``eps`` clamp inside the sqrt makes
    the all-masked degenerate case (A = 0, b = 0) return exactly 0
    instead of NaN, replacing damped_solve's probe-and-recompute guard
    on this path.  Differentiable (plain jnp ops).  Use for P <= ~12;
    the unrolled graph grows as O(P^3).
    """
    P = A.shape[-1]
    L = [[None] * P for _ in range(P)]
    for i in range(P):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, eps))
            else:
                L[i][j] = s / L[j][j]
    y = []
    for i in range(P):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y.append(s / L[i][i])
    x = [None] * P
    for i in reversed(range(P)):
        s = y[i]
        for k in range(i + 1, P):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


# Unrolled-Cholesky cutoff: the pose system (P=6) always takes the
# fused path; the bundle system (P=6+K=38) keeps batched LU, whose
# O(P^3) unrolled graph would bloat compile time for a non-hot solve.
_UNROLL_MAX_P = 12


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
    P = A.shape[-1]
    if P <= _UNROLL_MAX_P:
        # Fused unrolled Cholesky: A is SPD by construction (Gram matrix
        # + positive diagonal damping); the eps clamp returns exactly 0
        # for the all-masked A = 0, b = 0 case, so no probe is needed.
        return cholesky_solve_unrolled(A, Atb.astype(dtype))
    b = Atb.astype(dtype)[..., None]
    eye = jnp.eye(P, dtype=dtype)
    # Probe solve (non-differentiated) to detect singular systems.
    probe = jnp.linalg.solve(jax.lax.stop_gradient(A),
                             jax.lax.stop_gradient(b))
    ok = jnp.all(jnp.isfinite(probe), axis=(-2, -1), keepdims=True)
    A_safe = jnp.where(ok, A, eye)  # ok: (..., 1, 1) broadcasts over PxP
    x = jnp.linalg.solve(A_safe, b)
    return jnp.where(ok, x, jnp.zeros_like(x))[..., 0]
