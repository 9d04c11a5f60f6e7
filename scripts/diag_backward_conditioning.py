"""Conditioning study of full-model input/param gradients vs torch at N=1028.

Evidence base for the aggregate-invariant tolerances of
``tests/test_torch_parity.py::test_eval_backward_parity[1028]``.  The eval
graph's gradient field is only piecewise-smooth: the k-max reductions
(``gcn3d.py:39-47``) and the feature-space KNN selections flip winners on
~1e-7 value differences, rerouting whole gradient contributions between
points/direction slots.  This script quantifies three things on the CPU/XLA
path vs torch autograd (same converted weights, identity-pinned pooling):

1. how localized the torch-vs-JAX deviation is (norm_rel after dropping the
   top-k deviating elements);
2. whether per-cloud gradient SUMS are preserved (rerouting moves mass
   within a cloud; a backward-formula error does not cancel this way);
3. the SELF-instability envelope: the same JAX graph's input-grads at pts vs
   pts + 1e-6 noise — if torch-vs-JAX deviations have the same structure and
   scale as the graph's own sensitivity to sub-f32-noise perturbations, they
   are boundary artifacts, not errors.

Measured (2026-08, recorded in docs/PERFORMANCE.md):
  norm_rel full 7.8e-2, dominated by 42/6168 elements (excluding the top 64:
  1.7e-2); per-cloud sums agree to ~2e-6; self-perturb envelope at 1e-6
  input noise is already norm_rel 1.3e-2; worst param leaf
  (face_recon.conv_4.directions) norm_rel 0.109 at cosine 0.994.

Run: python scripts/diag_backward_conditioning.py    (CPU, ~6 min)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu_tests")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REF = "/root/reference"
sys.path.insert(0, REF)
import torch  # noqa: E402
import absl.flags as aflags  # noqa: E402

if not aflags.FLAGS.is_parsed():
    import config.config  # noqa: F401
    aflags.FLAGS(["diag"])
aflags.FLAGS.train = 0

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from test_torch_parity import _build_converted_pair, _pin_pooling  # noqa: E402


class _MP:
    """Minimal monkeypatch stand-in (this is a script, not a pytest run)."""

    def setattr(self, obj, name, value):
        setattr(obj, name, value)


def main(N=1028):
    rng = np.random.default_rng(0)
    tmodel, model, params, stats, pts, obj_id = _build_converted_pair(rng, N)
    _pin_pooling(_MP())

    pts_t = torch.tensor(pts, requires_grad=True)
    t_out = tmodel(pts_t, torch.tensor(obj_id).view(-1, 1))
    (_, _, _, _, t_pg, t_pr, t_fg, t_fr, t_T, t_s) = t_out
    t_loss = sum(o.pow(2).mean() for o in (t_pg, t_pr, t_fg, t_fr, t_T, t_s))
    t_loss.backward()
    t_g = pts_t.grad.numpy().astype(np.float64)
    t_pgrads = {f"posenet.{n}": p.grad.numpy()
                for n, p in tmodel.named_parameters() if p.grad is not None}

    def loss_fn(p, x):
        out = model.apply({"params": p, "batch_stats": stats}, x,
                          jnp.asarray(obj_id, jnp.int32), False,
                          rngs={"pool": jax.random.key(3)})
        terms = (out.p_green_R, out.p_red_R, out.f_green_R, out.f_red_R,
                 out.pred_T, out.pred_s)
        return sum(jnp.mean(o.astype(jnp.float32) ** 2) for o in terms)

    gfun = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    g_params, g_pts = gfun(params, jnp.asarray(pts))
    j_g = np.asarray(g_pts, np.float64)

    tn = np.linalg.norm(t_g)
    diff = (j_g - t_g).ravel()
    order = np.argsort(np.abs(diff))[::-1]
    print(f"norm_rel full: {np.linalg.norm(diff) / tn:.3e}  "
          f"(|t_g| max {np.abs(t_g).max():.3e}, norm {tn:.3e})")
    for k in (8, 16, 42, 64, 128):
        mask = np.ones(diff.size, bool)
        mask[order[:k]] = False
        print(f"  excluding top {k}: norm_rel {np.linalg.norm(diff[mask]) / tn:.3e}")

    print("per-cloud grad sums (torch vs jax):")
    for b in range(t_g.shape[0]):
        print(f"  b={b} torch {t_g[b].sum(0)} jax {j_g[b].sum(0)}")

    noise = np.random.default_rng(1).normal(
        scale=1e-6, size=pts.shape).astype(np.float32)
    _, g_pts2 = gfun(params, jnp.asarray(pts + noise))
    j2 = np.asarray(g_pts2, np.float64)
    print(f"JAX self-perturb (1e-6 noise): norm_rel "
          f"{np.linalg.norm(j2 - j_g) / tn:.3e}, max dev "
          f"{np.abs(j2 - j_g).max():.3e}, n>5e-5 {int((np.abs(j2 - j_g) > 5e-5).sum())}")
    print(f"torch-vs-jax:                 max dev {np.abs(j_g - t_g).max():.3e}, "
          f"n>5e-5 {int((np.abs(j_g - t_g) > 5e-5).sum())}")

    from hspose_tpu.utils.torch_convert import convert_to_torch_state_dict
    j_pgrads = convert_to_torch_state_dict(jax.device_get(g_params), {})
    worst = []
    for k, want in t_pgrads.items():
        got = np.asarray(j_pgrads.get(k), np.float64)
        want = want.astype(np.float64)
        nw = max(np.linalg.norm(want), 1e-12)
        nr = np.linalg.norm(got - want) / nw
        cos = float(got.ravel() @ want.ravel()
                    / max(np.linalg.norm(got) * nw, 1e-24))
        worst.append((nr, cos, k))
    worst.sort(reverse=True)
    print("worst param leaves (norm_rel, cosine, key):")
    for nr, cos, k in worst[:8]:
        print(f"  {nr:.3e} {cos:.5f} {k}")


if __name__ == "__main__":
    main()
