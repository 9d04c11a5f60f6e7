"""Cross-backend gradient parity of the PRODUCTION train backward.

Computes d(scalar)/d(params) through the train-mode forward (augment-free,
train=True routing) with identical rngs/batch on two backends:

* **tpu** — the production path: v3 Pallas custom-VJP kernels
  (``bwd_store`` default, ``bwd_exact=False`` one-pass bf16 backward), in
  both the f32 and bf16 recipes.
* **cpu** — the pure-XLA scan path, which is the path
  ``tests/test_torch_parity.py::test_eval_backward_parity`` ties to torch
  autograd.  Together the two links pin the on-hardware Pallas backward to
  the reference end-to-end (reference autograd surface:
  ``network/fs_net_repo/gcn3d.py:39-187``).

Two scalars per dtype:

* **smooth** (GATED): sum of per-output mean-squares over every train-mode
  posenet output (recon, face tensors, rotation vectors, T, s).  Smooth in
  the outputs, so cross-backend deviations measure exactly the backward
  path — kernels, BN, heads.
* **full train loss** (REPORTED, not gated): the real four-family total.
  The loss families contain discrete branches (symmetry argmins, nearest-
  face/point assignments) that flip under ~1e-4 cross-backend forward noise
  at random-init weights, rerouting whole per-sample gradients — at init
  this dominates the comparison and says nothing about the backward's
  correctness (the families themselves are torch-parity-tested on CPU in
  tests/test_losses_parity.py).  Reported for the record.

Run twice (order free; each saves its grads, compares when both exist):

    python scripts/probe_grad_cross_backend.py tpu
    python scripts/probe_grad_cross_backend.py cpu

PASS gates on the smooth scalar, per leaf (chosen with headroom over the
measured deviations, see docs/PERFORMANCE.md): f32 recipe — cosine ≥ 0.999,
norm-rel ≤ 5e-2; bf16 recipe — cosine ≥ 0.99, norm-rel ≤ 1.5e-1.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODE = sys.argv[1] if len(sys.argv) > 1 else "tpu"
assert MODE in ("tpu", "cpu"), MODE

import jax

if MODE == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from hspose_tpu.config import default_config
from hspose_tpu.engine.optimizer import build_optimizer
from hspose_tpu.engine.train_step import init_train_state
from hspose_tpu.models.hspose import build_model, train_forward
from hspose_tpu.utils.synthetic import synthetic_train_batch

BATCH = 8
OUT = "/tmp/grad_cross_backend_{mode}.npz"
GATES = {"float32": (0.999, 5e-2), "bfloat16": (0.99, 1.5e-1)}


def grad_trees(cfg):
    model = build_model(cfg)
    tx = build_optimizer(cfg.optim, cfg.train.train_steps * cfg.train.total_epoch)
    state = init_train_state(cfg, model, jax.random.key(0), tx)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(BATCH, cfg.data.num_points).items()}
    k_aug, k_pool, k_drop = jax.random.split(jax.random.key(7), 3)
    rngs = {"augment": k_aug, "pool": k_pool, "dropout": k_drop}

    def smooth_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["pcl_in"], batch["cat_id"].astype(jnp.int32), True,
            rngs={"pool": k_pool, "dropout": k_drop},
            mutable=["batch_stats"])
        terms = [o for o in out if o is not None]
        return sum(jnp.mean(o.astype(jnp.float32) ** 2) for o in terms)

    def full_fn(params):
        total, _ = train_forward(cfg, model, params, state.batch_stats, rngs, batch)
        return total

    res = {}
    for name, fn in (("smooth", smooth_fn), ("full", full_fn)):
        total, grads = jax.jit(jax.value_and_grad(fn))(state.params)
        flat = {"/".join(str(getattr(k, "key", k)) for k in path):
                np.asarray(g, np.float32)
                for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]}
        res[name] = (float(np.asarray(total)), flat)
    return res


def main():
    assert (jax.devices()[0].platform == "tpu") == (MODE == "tpu"), (
        MODE, jax.devices()[0].platform)
    results = {}
    for dtype in ("float32", "bfloat16"):
        cfg = default_config()
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, compute_dtype=dtype))
        for scalar, (total, flat) in grad_trees(cfg).items():
            results[f"{dtype}/{scalar}/__total__"] = np.float32(total)
            for k, v in flat.items():
                results[f"{dtype}/{scalar}/{k}"] = v
            print(f"{MODE} {dtype} {scalar}: total={total:.6f}, "
                  f"{len(flat)} grad leaves")
    np.savez(OUT.format(mode=MODE), **results)

    other = OUT.format(mode="cpu" if MODE == "tpu" else "tpu")
    if not os.path.exists(other):
        print(f"saved {OUT.format(mode=MODE)}; run the other pass to compare")
        return

    ours = np.load(OUT.format(mode=MODE))
    theirs = np.load(other)
    ok = True
    for dtype, (cos_gate, rel_gate) in GATES.items():
        for scalar in ("smooth", "full"):
            pre = f"{dtype}/{scalar}/"
            keys = [k for k in ours.files
                    if k.startswith(pre) and not k.endswith("__total__")]
            missing = [k for k in keys if k not in theirs.files]
            assert not missing, missing[:3]
            worst_cos, worst_rel, worst_key = 1.0, 0.0, ""
            g_all, w_all = [], []
            for k in keys:
                a, b = (ours[k].ravel().astype(np.float64),
                        theirs[k].ravel().astype(np.float64))
                na, nb = np.linalg.norm(a), np.linalg.norm(b)
                rel = np.linalg.norm(a - b) / max(nb, 1e-12)
                cos = float(a @ b / max(na * nb, 1e-24)) if nb > 0 else 1.0
                if cos < worst_cos:
                    worst_cos, worst_key = cos, k[len(pre):]
                worst_rel = max(worst_rel, rel)
                g_all.append(a)
                w_all.append(b)
            g, w = np.concatenate(g_all), np.concatenate(w_all)
            gcos = float(g @ w / max(np.linalg.norm(g) * np.linalg.norm(w), 1e-24))
            dt = abs(float(ours[pre + "__total__"]) - float(theirs[pre + "__total__"]))
            line = (f"{dtype} {scalar}: leaves={len(keys)} "
                    f"worst_cos={worst_cos:.6f} ({worst_key}) "
                    f"worst_norm_rel={worst_rel:.4f} global_cos={gcos:.6f} "
                    f"|Δtotal|={dt:.2e}")
            if scalar == "smooth":
                passed = worst_cos >= cos_gate and worst_rel <= rel_gate
                ok &= passed
                print(line, "->", "PASS" if passed else "FAIL")
            else:
                print(line, "(reported, not gated: discrete loss branches)")
    print("CROSS-BACKEND GRAD PARITY:", "PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
