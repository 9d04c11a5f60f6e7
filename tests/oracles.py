"""Independent per-sample numpy oracles for golden tests.

These play the role of the reference's retained ``*_old`` loop implementations
(SURVEY.md §4.2): simple, scalar, obviously-correct versions of the vectorized JAX
functions, written from the documented math (not from the reference source).
"""

from __future__ import annotations

import numpy as np


def rodrigues(axis, theta):
    """Rotation matrix about unit ``axis`` by angle ``theta`` (classic Rodrigues)."""
    axis = np.asarray(axis, dtype=np.float64)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def vertical_rot_vec_single(c1, c2, y, z, clamp=True):
    """Scalar confidence-weighted orthogonalization of (y, z).

    The pair is rotated about x = y×z so that the angle between them becomes π/2,
    with the correction split inversely by confidence: the *more* confident vector
    moves less.
    """
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    x = np.cross(y, z)
    x = x / (np.linalg.norm(x) + 1e-8)
    cos_yz = float(np.dot(y, z))
    if clamp:
        cos_yz = min(max(cos_yz, -1 + 1e-6), 1 - 1e-6)
    theta = np.arccos(cos_yz)
    excess = theta - np.pi / 2
    theta_y = c2 / (c1 + c2) * excess   # y moves proportionally to z's confidence
    theta_z = c1 / (c1 + c2) * excess
    new_y = rodrigues(x, theta_y) @ y
    new_z = rodrigues(x, -theta_z) @ z
    return new_y, new_z


def rot_mat_y_first_single(y, x):
    y = np.asarray(y, np.float64)
    x = np.asarray(x, np.float64)
    y = y / np.linalg.norm(y)
    z = np.cross(x, y)
    z = z / np.linalg.norm(z)
    x = np.cross(y, z)
    return np.stack([x, y, z], axis=-1)


def fit_plane_single(pc, w):
    """Weighted LSQ plane z = a x + b y + c via explicit normal equations."""
    pc = np.asarray(pc, np.float64)
    w = np.asarray(w, np.float64)
    A = np.concatenate([pc[:, :2], np.ones((len(pc), 1))], axis=1)
    b = pc[:, 2:3]
    W = np.diag(w)
    X = np.linalg.solve(A.T @ W @ A, A.T @ W @ b)[:, 0]
    dn_up = np.array([X[0] * X[2], X[1] * X[2], -X[2]])
    dn_norm = X[0] ** 2 + X[1] ** 2 + 1.0
    dn = dn_up / (dn_norm + 1e-8)
    normal = dn / np.linalg.norm(dn)
    c = X[2] / np.sqrt(dn_norm)
    return normal, dn, c


def knn_single(points, k):
    """Brute-force KNN excluding self, sorted by distance (then index)."""
    n = len(points)
    d = ((points[:, None] - points[None]) ** 2).sum(-1)
    out = np.zeros((n, k), dtype=np.int64)
    for i in range(n):
        order = np.argsort(d[i], kind="stable")
        out[i] = order[1:k + 1]
    return out


def iou_3d_single(RT1, RT2, s1, s2, sym, n_rot=20):
    """Single-pair NOCS-eval box 'IoU' with optional y-rotation sweep.

    Replicates the reference's quirk of reducing the (3, 8) corner matrix over the
    coordinate axis (per-corner extremes, products over 8 corners) — the exact
    computation behind every published NOCS mAP table.  Corner order matches
    ``get_3d_bbox``.
    """
    def corners(s):
        signs = np.array([[1, 1, 1], [1, 1, -1], [-1, 1, 1], [-1, 1, -1],
                          [1, -1, 1], [1, -1, -1], [-1, -1, 1], [-1, -1, -1]])
        return (0.5 * s * signs).T  # (3, 8)

    def aabb_iou(RT1, RT2):
        c1 = RT1[:3, :3] @ corners(s1) + RT1[:3, 3:4]
        c2 = RT2[:3, :3] @ corners(s2) + RT2[:3, 3:4]
        mn1, mx1 = c1.min(0), c1.max(0)  # per-corner over coords: shape (8,)
        mn2, mx2 = c2.min(0), c2.max(0)
        ov = np.minimum(mx1, mx2) - np.maximum(mn1, mn2)
        if ov.min() < 0:
            inter = 0.0
        else:
            inter = np.prod(ov)
        union = np.prod(mx1 - mn1) + np.prod(mx2 - mn2) - inter
        return inter / union

    if not sym:
        return aabb_iou(RT1, RT2)
    best = 0.0
    for i in range(n_rot):
        th = 2 * np.pi * i / n_rot
        ry = np.eye(4)
        ry[0, 0] = np.cos(th); ry[0, 2] = np.sin(th)
        ry[2, 0] = -np.sin(th); ry[2, 2] = np.cos(th)
        best = max(best, aabb_iou(RT1 @ ry, RT2))
    return best
