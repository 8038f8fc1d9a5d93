"""Gauss-Newton normal-equation construction.

TPU-native replacement for the reference CUDA op ``EquationConstruction``
(reference utils.cu:150-417) and its hand-written gradient
``EquationConstructionGrad`` (utils.cu:420-694).

Math (identical to the CUDA op): given per-point
  J  (..., N, 2, P)  projection Jacobian (P = 6 or 6+K),
  G  (..., N, C, 2)  sampled spatial feature gradients,
  r  (..., N, C)     feature residuals,
produce the reduced normal system
  AtA = sum_n J_n^T (G_n^T G_n) J_n          (..., P, P)
  Atb = sum_n J_n^T  G_n^T r_n               (..., P)

The reference needed ~290 lines of CUDA (5 batched cuBLAS GEMMs + a
custom column-reduce kernel, utils.cu:331-414) plus ~275 more for the
VJP because TF1 could not differentiate through cuBLAS calls.  Here the
same contraction is three einsums that XLA maps onto the MXU and fuses,
and the VJP falls out of autodiff for free — SURVEY.md §2.4 items 1-4.
The per-pixel (2x2) Gram matrix G^T G is formed first so the large C
axis is contracted once, never materializing the (N, C, P) product.

FLOP count at the reference operating point (B=2, N=4096, C=128, P=38)
is ~3 GFLOP — microseconds on one MXU; the op is bandwidth-bound on
reading G.  A fused Pallas kernel covering the whole GN iteration
(sample + residual + normal equations) lives in ops/pallas_gn.py.

The ordering/shape hazard of the CUDA op's static scratch buffers
(utils.cu:210-296: grad kernel reads the forward's per-GPU buffer, first
call fixes sizes forever — SURVEY.md §5 "race detection") does not exist
here: everything is functional.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def build_normal_equations(
        J: jnp.ndarray, G: jnp.ndarray, r: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assemble (AtA, Atb) from per-point Jacobians/gradients/residuals.

    Args:
      J: (..., N, 2, P) d(px,py)/d(params).
      G: (..., N, C, 2) feature gradients sampled at the warped points.
      r: (..., N, C) residuals f_tgt(warp) - f_ref.
      mask: optional (..., N) point validity; invalid points contribute
        zero (the reference folds the mask into grad/diff before the op,
        bundlenet.py:162-163).
      dtype: accumulation dtype (float32; the solve needs it).

    Returns:
      AtA: (..., P, P) symmetric PSD; Atb: (..., P).
    """
    J = J.astype(dtype)
    G = G.astype(dtype)
    r = r.astype(dtype)
    if mask is not None:
        m = mask.astype(dtype)
        # Binary mask: scaling the (2x2) Gram and the projected residual
        # once each equals the reference's mask on both grad and diff.
        H2 = jnp.einsum("...nci,...ncj,...n->...nij", G, G, m)
        Gr = jnp.einsum("...nci,...nc,...n->...ni", G, r, m)
    else:
        H2 = jnp.einsum("...nci,...ncj->...nij", G, G)
        Gr = jnp.einsum("...nci,...nc->...ni", G, r)
    AtA = jnp.einsum("...nip,...nij,...njq->...pq", J, H2, J)
    Atb = jnp.einsum("...nip,...ni->...p", J, Gr)
    return AtA, Atb
