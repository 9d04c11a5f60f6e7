"""Batched weighted least-squares plane fitting (pure JAX).

Matches ``tools/plane_utils.get_plane_in_batch`` (:24-49) of the reference, but solves
the 3×3 normal equations with ``jnp.linalg.solve`` instead of materializing an inverse
(better conditioned, fewer flops; SURVEY.md §7 step 1).
"""

from __future__ import annotations

import jax.numpy as jnp


def fit_plane_weighted(pc: jnp.ndarray, w: jnp.ndarray):
    """Fit z = a·x + b·y + c to weighted points.

    Args:
      pc: (..., P, 3) points.
      w:  (..., P) per-point weights.

    Returns:
      normal_n: (..., 3) unit plane normal.
      dn:       (..., 3) the reference's 'dn' vector (scaled normal, see below).
      for_p2plane: (..., 1) signed offset used for point-to-plane distances.

    The reference builds A = [x, y, 1], b = z, solves X = (AᵀWA)⁻¹AᵀWb, then derives
      dn_up = [X₀·X₂, X₁·X₂, -X₂],  dn_norm = X₀² + X₁² + 1,
      dn = dn_up / (dn_norm + 1e-8),  normal = dn/‖dn‖,  c = X₂/√dn_norm.
    """
    A = jnp.concatenate([pc[..., :2], jnp.ones_like(pc[..., :1])], axis=-1)  # (..., P, 3)
    b = pc[..., 2:3]  # (..., P, 1)
    Aw = A * w[..., None]  # rows scaled by weights == W @ A
    AtWA = jnp.einsum("...pi,...pj->...ij", A, Aw)
    AtWb = jnp.einsum("...pi,...pj->...ij", A, b * w[..., None])
    X = jnp.linalg.solve(AtWA, AtWb)[..., 0]  # (..., 3)

    x0, x1, x2 = X[..., 0:1], X[..., 1:2], X[..., 2:3]
    dn_up = jnp.concatenate([x0 * x2, x1 * x2, -x2], axis=-1)
    dn_norm = (x0 * x0 + x1 * x1 + 1.0)  # (..., 1)
    dn = dn_up / (dn_norm + 1e-8)
    normal_n = dn / jnp.linalg.norm(dn, axis=-1, keepdims=True)
    for_p2plane = x2 / jnp.sqrt(dn_norm)
    return normal_n, dn, for_p2plane
