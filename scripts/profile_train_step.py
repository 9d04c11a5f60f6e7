"""Where does the training step's time go?  Block-level breakdown on the real chip.

Times: the full train step / value_and_grad only / forward+loss value only /
plain train-mode model forward / optimizer update alone / augmentation alone.
The difference (value_and_grad − value) isolates the backward pass; (full −
value_and_grad) isolates the Ranger update + NaN-select overhead.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import hspose_tpu  # noqa: F401

from hspose_tpu.config import default_config
from hspose_tpu.engine.train_step import build_train_step
from hspose_tpu.models.hspose import augment_batch, build_model, train_forward


def _sync(out):
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    np.asarray(jnp.ravel(leaves[0])[:1])


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:42s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    import argparse
    import dataclasses

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    cfg = default_config()
    if args.bf16:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                    compute_dtype="bfloat16"))
    model = build_model(cfg)
    tx, state, train_step = build_train_step(cfg, model, jax.random.key(0))

    from hspose_tpu.utils.synthetic import synthetic_train_batch
    bs, n = args.batch, 1028
    print(f"batch={bs} compute_dtype={cfg.model.compute_dtype}", flush=True)
    batch = jax.tree.map(jnp.asarray, synthetic_train_batch(bs, n))
    key = jax.random.key(1)
    k_aug, k_pool, k_drop = jax.random.split(key, 3)
    rngs = {"augment": k_aug, "pool": k_pool, "dropout": k_drop}

    print("compiling...", flush=True)

    # 1. full step (donation disabled: we reuse the same state across iters)
    @jax.jit
    def full_step(st, b, k):
        return train_step.__wrapped__(st, b, k) if hasattr(train_step, "__wrapped__") else None

    state0 = jax.device_get(state)
    st = jax.tree_util.tree_map(jnp.asarray, state0)

    def run_full(b):
        nonlocal st
        st2, m = train_step(st, b, key)
        st = st2
        return m

    timeit("full train_step", run_full, batch)

    st = jax.tree_util.tree_map(jnp.asarray, state0)

    # 2. value_and_grad only
    @jax.jit
    def vag(params, stats, b, k):
        kk = jax.random.split(k, 3)
        r = {"augment": kk[0], "pool": kk[1], "dropout": kk[2]}

        def loss_fn(p):
            return train_forward(cfg, model, p, stats, r, b)

        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return total, grads

    timeit("value_and_grad(forward+losses)", vag, st.params, st.batch_stats, batch, key)

    # 3. forward + losses, no grad
    @jax.jit
    def value_only(params, stats, b, k):
        kk = jax.random.split(k, 3)
        r = {"augment": kk[0], "pool": kk[1], "dropout": kk[2]}
        return train_forward(cfg, model, params, stats, r, b)[0]

    timeit("forward+losses (no grad)", value_only, st.params, st.batch_stats, batch, key)

    # 4. plain train-mode model forward (no losses)
    @jax.jit
    def model_fwd(params, stats, pc, obj, k):
        kk = jax.random.split(k, 2)
        return model.apply({"params": params, "batch_stats": stats}, pc, obj, True,
                           rngs={"pool": kk[0], "dropout": kk[1]},
                           mutable=["batch_stats"])[0]

    obj = batch["cat_id"].astype(jnp.int32)
    timeit("model fwd (train mode, no losses)", model_fwd, st.params, st.batch_stats,
           batch["pcl_in"], obj, key)

    # 4b. grad of model forward only (sum of outputs as scalar)
    @jax.jit
    def model_fwd_grad(params, stats, pc, obj, k):
        kk = jax.random.split(k, 2)

        def f(p):
            out = model.apply({"params": p, "batch_stats": stats}, pc, obj, True,
                              rngs={"pool": kk[0], "dropout": kk[1]},
                              mutable=["batch_stats"])[0]
            leaves = [x for x in jax.tree_util.tree_leaves(out) if x is not None]
            return sum(jnp.sum(x) for x in leaves)

        return jax.grad(f)(params)

    timeit("grad(model fwd only)", model_fwd_grad, st.params, st.batch_stats,
           batch["pcl_in"], obj, key)

    # 5. optimizer update alone
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, st.params)

    @jax.jit
    def opt_update(g, os_, p):
        return tx.update(g, os_, p)

    timeit("optimizer update (Ranger chain)", opt_update, zero_grads, st.opt_state,
           st.params)

    # 6. augmentation alone
    @jax.jit
    def aug_only(k, b):
        return augment_batch(k, cfg.aug, b["pcl_in"], b["rotation"], b["translation"],
                             b["fsnet_scale"], b["mean_shape"], b["sym_info"],
                             b["aug_bb"], b["aug_rt_t"], b["aug_rt_R"],
                             b["model_point"], b["nocs_scale"], obj).pc

    timeit("augmentation alone", aug_only, key, batch)


if __name__ == "__main__":
    main()
