"""On-hardware verification of the compiled Pallas kernels vs XLA references.

The suite's kernel grad tests (tests/test_pallas_hs.py, test_chamfer.py) run
in INTERPRET mode on CPU; this script runs the same comparisons through the
real Mosaic compiler on the TPU, at the production shapes, for both the
training (v3) and serving (v4 fused) kernel pools.  Same-device,
bit-identical inputs — so unlike cross-backend full-model comparisons
(scripts/probe_grad_cross_backend.py), max-winner selections agree except
at exact ties and the numbers measure kernel arithmetic, not
selection-boundary chaos.

Covered (reference hot loop: /root/reference/network/fs_net_repo/gcn3d.py:39-187
and the chamfer CUDA extension):
* v3 ``hs_support_reduce`` / ``hs_surface_reduce`` forward + full VJP
  (all cotangents) at conv_1/conv_3/conv_4/surface shapes, exact and fast
  recipes, both backward variants (bwd_store default True / recompute);
* v4 fused serving forwards (``hs_surface_fused``/``hs_support_fused``/
  ``orl_global_fused``), exact and fast;
* ``chamfer_distance`` (Pallas-routed forward, custom-VJP backward);
* ``knn_indices_pallas`` index agreement vs the XLA reference.

Run: python scripts/verify_kernels_tpu.py      (TPU, ~3 min warm cache)
Measured results are recorded in docs/PERFORMANCE.md ("On-hardware kernel
verification").
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.lax import Precision

from hspose_tpu.ops.chamfer import chamfer_distance, pairwise_sq_dist
from hspose_tpu.ops.knn import knn_indices
from hspose_tpu.ops.pallas_hs import hs_support_reduce, hs_surface_reduce
from hspose_tpu.ops.pallas_hs_fused import (hs_support_fused, hs_surface_fused,
                                            orl_global_fused)
from hspose_tpu.ops.pallas_knn import knn_indices_pallas

S = 7   # cfg.gcn_sup_num
K = 20  # cfg.gcn_n_num
FAILURES = []


def report(name, got, want, gate_rel, per_tensor=None):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-12)
    cos = float(got.ravel() @ want.ravel()
                / max(np.linalg.norm(got) * np.linalg.norm(want), 1e-24))
    ok = rel <= gate_rel
    if not ok:
        FAILURES.append(name)
    print(f"  {name:34s} norm_rel={rel:.2e} cos={cos:.6f} "
          f"max|Δ|={np.abs(got - want).max():.2e}  "
          f"{'ok' if ok else f'FAIL(gate {gate_rel:g})'}")


def xla_support(g, r, w, b, d, s, co):
    acc = jnp.zeros(g.shape[:2] + (co,), jnp.float32)
    for j in range(s):
        proj = jnp.dot(g, w[:, j * co:(j + 1) * co],
                       precision=Precision.HIGHEST) + b[j * co:(j + 1) * co]
        theta = jax.nn.relu(jnp.dot(r, d[:, j * co:(j + 1) * co],
                                    precision=Precision.HIGHEST))
        acc = acc + jnp.max(theta * proj, axis=2)
    return acc / s


def xla_surface(r, d, s, co):
    acc = jnp.zeros(r.shape[:2] + (co,), jnp.float32)
    for j in range(s):
        theta = jax.nn.relu(jnp.dot(r, d[:, j * co:(j + 1) * co],
                                    precision=Precision.HIGHEST))
        acc = acc + jnp.max(theta, axis=2)
    return acc / s


def check_v3_support(rng, B, N, Cin, Co, exact, bwd_store, gate_f, gate_b):
    g = jnp.asarray(rng.normal(size=(B, N, K, Cin)), jnp.float32)
    rf = rng.normal(size=(B, N, K, 3)).astype(np.float32)
    rf = jnp.asarray(rf / np.linalg.norm(rf, axis=-1, keepdims=True))
    w = jnp.asarray(rng.normal(scale=0.2, size=(Cin, S * Co)), jnp.float32)
    b = jnp.asarray(rng.normal(scale=0.1, size=(S * Co,)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(3, S * Co)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(B, N, Co)), jnp.float32)

    tag = (f"support N={N} Cin={Cin} Co={Co} "
           f"{'exact' if exact else 'fast'}"
           f"{' store' if bwd_store else ' recomp'}")

    def kfn(*a):
        return jnp.sum(hs_support_reduce(*a, S, Co, exact=exact,
                                         bwd_store=bwd_store) * cot)

    def xfn(*a):
        return jnp.sum(xla_support(*a, S, Co) * cot)

    out_k = jax.jit(lambda *a: hs_support_reduce(*a, S, Co, exact=exact))(
        g, rf, w, b, d)
    out_x = jax.jit(lambda *a: xla_support(*a, S, Co))(g, rf, w, b, d)
    report(tag + " fwd", np.asarray(out_k), np.asarray(out_x), gate_f)

    gk = jax.jit(jax.grad(kfn, argnums=(0, 1, 2, 3, 4)))(g, rf, w, b, d)
    gx = jax.jit(jax.grad(xfn, argnums=(0, 1, 2, 3, 4)))(g, rf, w, b, d)
    for nm, a_, b_ in zip(("dg", "drf", "dw", "db", "dd"), gk, gx):
        report(f"{tag} {nm}", np.asarray(a_), np.asarray(b_), gate_b)


def check_v3_surface(rng, B, N, Co, exact, gate_f, gate_b):
    rf = rng.normal(size=(B, N, K, 3)).astype(np.float32)
    rf = jnp.asarray(rf / np.linalg.norm(rf, axis=-1, keepdims=True))
    d = jnp.asarray(rng.normal(size=(3, S * Co)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(B, N, Co)), jnp.float32)
    tag = f"surface N={N} Co={Co} {'exact' if exact else 'fast'}"

    out_k = jax.jit(lambda r, dd: hs_surface_reduce(r, dd, S, Co, exact=exact))(rf, d)
    out_x = jax.jit(lambda r, dd: xla_surface(r, dd, S, Co))(rf, d)
    report(tag + " fwd", np.asarray(out_k), np.asarray(out_x), gate_f)

    gk = jax.jit(jax.grad(
        lambda r, dd: jnp.sum(hs_surface_reduce(r, dd, S, Co, exact=exact) * cot),
        argnums=(0, 1)))(rf, d)
    gx = jax.jit(jax.grad(
        lambda r, dd: jnp.sum(xla_surface(r, dd, S, Co) * cot),
        argnums=(0, 1)))(rf, d)
    for nm, a_, b_ in zip(("drf", "dd"), gk, gx):
        report(f"{tag} {nm}", np.asarray(a_), np.asarray(b_), gate_b)


def check_v4_forwards(rng, B, N, Cin, Co, exact, gate):
    pts = jnp.asarray(rng.normal(scale=0.2, size=(B, N, 3)), jnp.float32)
    idx = np.asarray(jax.jit(lambda p: knn_indices(p, K))(pts))
    idx = jnp.asarray(idx, jnp.int32)
    feat = jnp.asarray(rng.normal(size=(B, N, Cin)), jnp.float32)
    w = jnp.asarray(rng.normal(scale=0.2, size=(Cin, S * Co)), jnp.float32)
    b = jnp.asarray(rng.normal(scale=0.1, size=(S * Co,)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(3, S * Co)), jnp.float32)
    mode = "exact" if exact else "fast"

    def gather(x, i):  # x (B,N,C), i (B,N,K) -> (B,N,K,C)
        return jax.vmap(lambda xx, ii: xx[ii])(x, i)

    def rf_norm(p, i):
        r = gather(p, i) - p[:, :, None]
        return r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True), 1e-12)

    r = rf_norm(pts, idx)
    sf = jax.jit(lambda p, i, dd: hs_surface_fused(p, i, dd, S, Co, exact=exact))(
        pts, idx, d)
    sx = jax.jit(lambda rr, dd: xla_surface(rr, dd, S, Co))(r, d)
    report(f"v4 surface N={N} {mode} fwd", np.asarray(sf), np.asarray(sx), gate)

    gf = jax.jit(lambda f, p, i: hs_support_fused(f, p, i, w, b, d, S, Co,
                                                  exact=exact))(feat, pts, idx)
    gathered = gather(feat, idx)
    gx = jax.jit(lambda gg, rr: xla_support(gg, rr, w, b, d, S, Co))(gathered, r)
    report(f"v4 support N={N} {mode} fwd", np.asarray(gf), np.asarray(gx), gate)

    of = jax.jit(lambda f, i: orl_global_fused(f, i, exact=exact))(feat, idx)
    ox = jnp.mean(jnp.max(gathered, axis=2), axis=1, keepdims=True)
    report(f"v4 orl N={N} {mode} fwd", np.asarray(of), np.asarray(ox), gate)


def check_chamfer(rng, B, N, M, gate):
    a = jnp.asarray(rng.normal(scale=0.2, size=(B, N, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(scale=0.2, size=(B, M, 3)), jnp.float32)

    da_k, db_k = jax.jit(chamfer_distance)(a, b)
    d_full = jax.jit(lambda x, y: pairwise_sq_dist(x, y))(a, b)
    report("chamfer fwd a->b", np.asarray(da_k), np.asarray(jnp.min(d_full, -1)),
           gate)
    report("chamfer fwd b->a", np.asarray(db_k),
           np.asarray(jnp.min(jnp.swapaxes(d_full, 1, 2), -1)), gate)

    def loss_k(x, y):
        da, db = chamfer_distance(x, y)
        return jnp.mean(da) + jnp.mean(db)

    def loss_x(x, y):
        dd = pairwise_sq_dist(x, y)
        return jnp.mean(jnp.min(dd, -1)) + jnp.mean(jnp.min(dd, -2))

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1)))(a, b)
    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1)))(a, b)
    for nm, a_, b_ in zip(("da", "db"), gk, gx):
        report(f"chamfer {nm}", np.asarray(a_), np.asarray(b_), gate)


def check_knn(rng, B, N):
    pts = jnp.asarray(rng.normal(scale=0.2, size=(B, N, 3)), jnp.float32)
    ix = np.asarray(jax.jit(lambda p: knn_indices(p, K))(pts))
    ip = np.asarray(jax.jit(lambda p: knn_indices_pallas(p, K))(pts))
    # sets per (b, n) row: ordering inside the k window is allowed to differ
    same = np.mean([np.intersect1d(ix[b, n], ip[b, n]).size == K
                    for b in range(B) for n in range(0, N, 97)])
    ok = same >= 0.999
    if not ok:
        FAILURES.append("knn")
    print(f"  knn N={N} k={K} row-set agreement    {same:.4f}  "
          f"{'ok' if ok else 'FAIL'}")


def main():
    assert jax.devices()[0].platform == "tpu", "this script verifies on TPU"
    rng = np.random.default_rng(0)
    B = 16

    print("v3 training kernels (custom VJP):")
    # Gates from measured headroom (see docs/PERFORMANCE.md).  Exact recipe:
    # forward is f32-faithful (measured norm_rel 1.4e-6), backward carries
    # the one-pass-bf16 value noise (measured 0.6-2.8e-3, cos ≥ 0.999996).
    # Fast recipe: the reference here stays f32/HIGHEST, so the comparison
    # includes bf16-vs-f32 WINNER quantization — the kernel's bf16
    # theta·proj legitimately picks different in-window argmaxes than the
    # f32 reference, rerouting those contributions (measured 4.4-6.3e-2,
    # cos ≥ 0.998).  A backward bug shows as cos ~0 / norm blowup, far
    # outside either gate; bf16 TRAINING quality is gated at task level
    # (train_sanity --bf16 --anneal).
    for exact, gate_f, gate_b in ((True, 1e-5, 2e-2), (False, 2e-2, 1.2e-1)):
        for store in (True, False):
            check_v3_support(rng, B, 1028, 128, 128, exact, store, gate_f, gate_b)
            check_v3_support(rng, B, 257, 256, 256, exact, store, gate_f, gate_b)
            check_v3_support(rng, B, 64, 256, 512, exact, store, gate_f, gate_b)
        check_v3_surface(rng, B, 1028, 128, exact, gate_f, gate_b)

    print("v4 serving kernels (forward; backward serves only the rejected "
          "train_v4_small probe):")
    for exact, gate in ((True, 1e-5), (False, 2e-2)):
        check_v4_forwards(rng, 8, 1028, 128, 128, exact, gate)

    print("chamfer (Pallas-routed forward, custom-VJP backward):")
    check_chamfer(rng, 8, 1028, 1024, 1e-5)

    print("knn:")
    check_knn(rng, 8, 1028)

    print("ON-HARDWARE KERNEL VERIFICATION:",
          "PASS" if not FAILURES else f"FAIL {FAILURES}")


if __name__ == "__main__":
    main()
