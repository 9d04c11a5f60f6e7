"""Quantify the Sinkhorn-EMD bias at the production operating point.

The eval_recon producer (evaluation/evaluate.py::recon_metrics) runs
``emd_distance(recon, pc, epsilon=0.02, iters=50)`` at (B, 1028, 3) shapes,
while every accuracy test used epsilon=0.005/iters=500 at small N.  This probe
measures the relative bias of candidate (epsilon, iters) points against the
exact assignment EMD (scipy linear_sum_assignment on the full 1028x1028 cost
matrix) across the regimes a trained/untrained recon head actually produces:

  near   — recon ~ observed + N(0, 0.5 cm)   (well-trained head)
  mid    — recon ~ observed + N(0, 2 cm) + 5% outliers (mid-training)
  far    — recon and observed unrelated      (init weights)

Run on CPU (the cost is one 1028^2 logsumexp pair per iter — seconds).
Usage: python scripts/probe_emd_bias.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hspose_tpu.ops.emd import emd_distance

N = 1028


def make_pair(rng, regime):
    """Production-scale cloud pair (metres, object extents ~0.1-0.3 m)."""
    # box-surface cloud like the synthetic training data
    face = rng.integers(0, 6, N)
    uv = rng.uniform(-0.5, 0.5, (N, 3))
    pts = uv.copy()
    pts[np.arange(N), face // 2] = np.where(face % 2 == 0, -0.5, 0.5)
    ext = rng.uniform(0.08, 0.3, 3)
    a = (pts * ext).astype(np.float32)
    if regime == "near":
        b = a + rng.normal(0, 0.005, a.shape)
    elif regime == "mid":
        b = a + rng.normal(0, 0.02, a.shape)
        out = rng.random(N) < 0.05
        b[out] += rng.normal(0, 0.1, (out.sum(), 3))
    else:  # far
        face2 = rng.integers(0, 6, N)
        uv2 = rng.uniform(-0.5, 0.5, (N, 3))
        p2 = uv2.copy()
        p2[np.arange(N), face2 // 2] = np.where(face2 % 2 == 0, -0.5, 0.5)
        b = p2 * rng.uniform(0.08, 0.3, 3) + rng.normal(0, 0.02, p2.shape)
    return a.astype(np.float32), b.astype(np.float32)


def exact_emd(a, b):
    C = np.linalg.norm(a[:, None] - b[None], axis=-1)
    r, c = linear_sum_assignment(C)
    return C[r, c].mean()


def main():
    candidates = [(0.02, 50), (0.02, 100), (0.01, 100), (0.01, 200),
                  (0.005, 200), (0.005, 500)]
    rng = np.random.default_rng(0)
    pairs = {reg: [make_pair(rng, reg) for _ in range(4)]
             for reg in ("near", "mid", "far")}
    exact = {reg: np.array([exact_emd(a, b) for a, b in ps])
             for reg, ps in pairs.items()}

    print(f"{'eps':>6} {'iters':>5} | " +
          " | ".join(f"{r}: bias% (exact mean)" for r in pairs))
    for eps, iters in candidates:
        cols = []
        for reg, ps in pairs.items():
            a = jnp.asarray(np.stack([p[0] for p in ps]))
            b = jnp.asarray(np.stack([p[1] for p in ps]))
            approx = np.asarray(emd_distance(a, b, epsilon=eps, iters=iters))
            rel = (approx - exact[reg]) / exact[reg] * 100
            cols.append(f"{reg}: {rel.mean():+6.2f}%±{rel.std():4.2f} "
                        f"({exact[reg].mean()*100:.2f} cm)")
        print(f"{eps:>6} {iters:>5} | " + " | ".join(cols))


if __name__ == "__main__":
    main()
