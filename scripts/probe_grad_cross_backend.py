"""Cross-backend full-model gradient CONDITIONING study (report, not a gate).

Computes d(scalar)/d(params) through the train-mode forward (augment-free,
train=True routing) with identical rngs/batch on two backends:

* **tpu** — the production path: v3 Pallas custom-VJP kernels
  (``bwd_store`` default, ``bwd_exact=False`` one-pass bf16 backward), in
  both the f32 and bf16 recipes.
* **cpu** — the pure-XLA scan path, which is the path
  ``tests/test_torch_parity.py::test_eval_backward_parity`` ties to torch
  autograd.

**Why this is a study and not a pass/fail check.**  The full model is a
cascade of hard selections (feature-KNN top-k, per-window k-max, global
point max-pools).  Backends round differently (TPU bf16x3/bf16 matmuls vs
CPU f32), so selections flip, and each flip reroutes a whole gradient
contribution.  Dropout masks and pool permutations are IDENTICAL across
backends (threefry; verified), yet the measured result (2026-08, batch 8,
random init) is:

  f32  smooth scalar: |Δtotal| 4.7e-4 but global grad cosine 0.983, worst
       leaf cosine −0.33 (a 4-element bias whose batch-sum nearly cancels);
  bf16 smooth scalar: global cosine 0.12 — at bf16 the 8-bit mantissa makes
       in-window ties COMMON, and the two backends resolve them
       differently, decorrelating per-element grads entirely;
  full train loss: adds discrete loss branches (symmetry argmins, nearest
       assignments) on top — f32 global cosine 0.978.

Per-element cross-backend gradient comparison of this architecture is
therefore ill-conditioned BY CONSTRUCTION, and a tight gate here would
reject correct code.  The gated hardware evidence lives at the two ends
that ARE well-conditioned:

* kernel level, same device, bit-identical inputs:
  ``scripts/verify_kernels_tpu.py`` (compiled Pallas vs XLA, forward+VJP);
* task level: ``scripts/train_sanity.py --bf16 --anneal`` convergence and
  the torch backward-parity test on the CPU path
  (tests/test_torch_parity.py::test_eval_backward_parity).

Run twice (order free; each saves its grads, reports when both exist):

    python scripts/probe_grad_cross_backend.py tpu
    python scripts/probe_grad_cross_backend.py cpu
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
    for dtype in ("float32", "bfloat16"):
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
            print(f"{dtype} {scalar}: leaves={len(keys)} "
                  f"worst_cos={worst_cos:.6f} ({worst_key}) "
                  f"worst_norm_rel={worst_rel:.4f} global_cos={gcos:.6f} "
                  f"|Δtotal|={dt:.2e}")
    print("conditioning study only — gated hardware checks: "
          "scripts/verify_kernels_tpu.py (kernel), train_sanity (task)")


if __name__ == "__main__":
    main()
