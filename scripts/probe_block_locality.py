"""Occupancy probe for the exact-mode block-skip gather idea.

The exact v4 kernels' remaining quadratic term is the split one-hot gather:
every (query-tile, neighbour-slot) pass spans the FULL padded source axis even
though only k columns per query are live.  The candidate fix (logged in
docs/PERFORMANCE.md) is to Morton-sort the points once per forward, slice the
source axis into lane-aligned blocks, and predicate each (query-tile, block)
partial gather on a scalar-prefetched occupancy bit — exact by construction
(skipped blocks have an all-zero one-hot slice), with the win set entirely by
how few blocks a sorted query tile's neighbourhood touches.

This probe measures that occupancy on realistic clouds BEFORE any kernel work:

* ``vert_idx`` — xyz-KNN neighbourhoods (conv_0 RF-P + both N=1028 ORL calls);
* ``rf_1``     — feature-KNN neighbourhoods (conv_1 support, the single most
  expensive exact kernel call at ~74 ms) on conv_0 features.  Features come
  from a RANDOM-init conv_0 (no trained weights in this environment) — a
  proxy, but HS surface features are a smooth function of local geometry, so
  spatial sorting localizing them at init is evidence it does in general.

Run:  python scripts/probe_block_locality.py   (CPU, a few seconds)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from train_sanity import make_batch  # noqa: E402
from hspose_tpu.models.layers import HSLayerSurface  # noqa: E402
from hspose_tpu.ops.knn import knn_indices  # noqa: E402


def morton_order(pts):
    """(N, 3) -> argsort by 30-bit Morton code (10 bits/axis, unit-cube norm)."""
    lo, hi = pts.min(0), pts.max(0)
    q = ((pts - lo) / np.maximum(hi - lo, 1e-9) * 1023.0).astype(np.uint32)
    q = np.minimum(q, 1023)

    def spread(v):  # 10 -> 30 bit spread (classic magic numbers)
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return np.argsort(code, kind="stable")


def occupancy(idx, perm, tq, bs):
    """Mean fraction of ``bs``-wide source blocks a ``tq``-query tile touches.

    idx (N, k) neighbour indices; perm the processing order (queries AND the
    source axis are both permuted by it, as the kernel would).
    """
    n = idx.shape[0]
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    nb = -(-n // bs)
    sorted_nbrs = inv[idx[perm]]  # (N, k) neighbour positions in sorted order
    occ, span = [], []
    for t0 in range(0, n, tq):
        blocks = np.unique(sorted_nbrs[t0:t0 + tq] // bs)
        occ.append(len(blocks) / nb)
        tile = sorted_nbrs[t0:t0 + tq]
        span.append(int(tile.max() - tile.min() + 1))
    return float(np.mean(occ)), int(np.percentile(span, 95))


def main():
    rng = np.random.default_rng(0)
    B, N, K = 8, 1028, 20
    mean_shape = np.array([0.2, 0.2, 0.2], np.float32)
    batch = make_batch(rng, B, N, mean_shape)
    pts = np.asarray(batch["pcl_in"], np.float32)

    verts = jnp.asarray(pts)
    vert_idx = np.asarray(knn_indices(verts, K))

    layer = HSLayerSurface(128, 7)
    params = layer.init(jax.random.PRNGKey(0), verts[:1], rf_idx=jnp.asarray(
        vert_idx[:1]), orl_idx=jnp.asarray(vert_idx[:1]), train=False)
    fm_0 = jax.nn.relu(layer.apply(params, verts, rf_idx=jnp.asarray(vert_idx),
                                   orl_idx=jnp.asarray(vert_idx), train=False))
    rf_1 = np.asarray(knn_indices(fm_0, K))

    print(f"block occupancy, B={B} N={N} K={K} (fraction of source blocks a "
          "query tile must gather; identity = unsorted)")
    print(f"{'idx':9} {'order':9} {'tq':>4} {'blk':>4} {'occupancy':>10} "
          f"{'span p95':>9}")
    for name, idx_all in (("vert_idx", vert_idx), ("rf_1", rf_1)):
        for order in ("identity", "morton"):
            for tq, bs in ((32, 128), (64, 128), (64, 256), (128, 256)):
                os_, sp = [], []
                for b in range(B):
                    perm = (np.arange(N) if order == "identity"
                            else morton_order(pts[b]))
                    o, s = occupancy(idx_all[b], perm, tq, bs)
                    os_.append(o)
                    sp.append(s)
                print(f"{name:9} {order:9} {tq:>4} {bs:>4} "
                      f"{np.mean(os_):>10.3f} {int(np.mean(sp)):>9}")


if __name__ == "__main__":
    main()
