"""Earth mover's distance (entropic OT / Sinkhorn) between point clouds.

The reference's ``eval_recon`` branch consumes per-detection ``emd_dis_cass``
values (evaluation/eval_utils_v1.py:672-707) but ships no EMD implementation
anywhere.  This is the TPU-native producer: a log-domain Sinkhorn solver over
the pairwise euclidean cost matrix with uniform marginals — the standard
point-cloud EMD (mean matched distance under an optimal soft assignment).
Everything is fixed-iteration ``lax``-friendly matmul/logsumexp work, so it
jits and batches cleanly on the MXU/VPU.

With N == M and epsilon → 0 the value converges to the exact assignment EMD
(mean ‖aᵢ − b_{π(i)}‖ over the optimal bijection π) — verified against
scipy.optimize.linear_sum_assignment in tests/test_chamfer.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hspose_tpu.ops.knn import pairwise_sq_dist


@functools.partial(jax.jit, static_argnames=("iters",))
def emd_distance(a: jnp.ndarray, b: jnp.ndarray, epsilon: float = 0.02,
                 iters: int = 200) -> jnp.ndarray:
    """Approximate EMD between a (B, N, 3) and b (B, M, 3); returns (B,).

    ``epsilon`` is the entropic regularizer relative to the mean pairwise
    distance (scale-invariant).  The final value is the transport cost
    Σ P·C with uniform marginals — i.e. the mean per-point matched distance,
    matching the usual point-cloud EMD normalization.
    """
    C = jnp.sqrt(jnp.maximum(pairwise_sq_dist(a, b), 0.0))  # (B, N, M)
    B, N, M = C.shape
    scale = jnp.mean(C, axis=(1, 2), keepdims=True)  # (B, 1, 1)
    eps = jnp.maximum(epsilon * scale, 1e-12)

    log_mu = -jnp.log(N)  # uniform marginals
    log_nu = -jnp.log(M)
    f = jnp.zeros((B, N), C.dtype)
    g = jnp.zeros((B, M), C.dtype)
    eps2 = eps[:, :, 0]  # (B, 1) for row/col updates

    def body(_, fg):
        f, g = fg
        # f_i <- -eps * logsumexp_j((g_j - C_ij)/eps + log_nu)
        f = -eps2 * jax.scipy.special.logsumexp(
            (g[:, None, :] - C) / eps + log_nu, axis=2)
        g = -eps2 * jax.scipy.special.logsumexp(
            (f[:, :, None] - C) / eps + log_mu, axis=1)
        return f, g

    f, g = jax.lax.fori_loop(0, iters, body, (f, g))
    log_P = (f[:, :, None] + g[:, None, :] - C) / eps + log_mu + log_nu
    return jnp.sum(jnp.exp(log_P) * C, axis=(1, 2))
