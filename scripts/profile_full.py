"""Full-model timings on the real chip: eval forward (exact + fast modes),
train step with the VJP kernels, and the fwd+bwd kernel microbench."""

import dataclasses
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
from hspose_tpu.models.hspose import build_model, eval_forward


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(jnp.ravel(leaves[0])[:1])


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt*1000:8.2f} ms", flush=True)
    return dt


def main():
    B, N = 256, 1028
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(scale=0.2, size=(B, N, 3)), jnp.float32)
    obj = jnp.zeros((B,), jnp.int32)

    for mode in ("float32", "bfloat16"):
        cfg = default_config()
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, compute_dtype=mode))
        model = build_model(cfg)
        variables = model.init({"params": jax.random.key(0), "pool": jax.random.key(1),
                                "dropout": jax.random.key(2)}, pts[:2], obj[:2], True)
        params, stats = variables["params"], variables["batch_stats"]

        @jax.jit
        def fwd(pc):
            return eval_forward(model, params, stats, jax.random.key(3), pc, obj)

        dt = timeit(f"full eval forward ({mode})", fwd, pts, iters=10)
        print(f"=> {B/dt:.0f} crops/s", flush=True)
        if mode == "float32":
            out_f32 = fwd(pts)
        else:
            out_bf16 = fwd(pts)

    # fast-mode accuracy vs exact on the same random weights
    for name in ("p_green_R", "p_red_R", "pred_T", "pred_s"):
        a = np.asarray(getattr(out_f32, name))
        b = np.asarray(getattr(out_bf16, name))
        if name.endswith("_R"):
            cos = np.clip(np.sum(a * b, axis=-1), -1, 1)
            print(f"{name}: max axis deviation {np.degrees(np.arccos(cos)).max():.4f} deg",
                  flush=True)
        else:
            print(f"{name}: max abs diff {np.abs(a - b).max():.5f}", flush=True)

    # train step (batch 16) with the VJP kernels
    from hspose_tpu.engine.train_step import build_train_step
    from hspose_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from hspose_tpu.config import ParallelConfig

    cfg = default_config()
    model = build_model(cfg)
    tx, state, train_step = build_train_step(cfg, model, jax.random.key(0))
    bs = 16
    rngb = np.random.default_rng(1)
    A = rngb.normal(size=(bs, 3, 3))
    Q, _ = np.linalg.qr(A)
    Q *= np.sign(np.linalg.det(Q))[:, None, None]
    batch = {
        "pcl_in": rngb.normal(scale=0.2, size=(bs, N, 3)).astype(np.float32),
        "cat_id": (np.arange(bs) % 6).astype(np.float32),
        "rotation": Q.astype(np.float32),
        "translation": rngb.normal(scale=0.1, size=(bs, 3)).astype(np.float32),
        "fsnet_scale": rngb.normal(scale=0.01, size=(bs, 3)).astype(np.float32),
        "mean_shape": (np.abs(rngb.normal(size=(bs, 3))) * 0.1 + 0.1).astype(np.float32),
        "sym_info": np.tile(np.array([[0, 1, 0, 0]], np.float32), (bs, 1)),
        "aug_bb": rngb.uniform(0.8, 1.2, (bs, 3)).astype(np.float32),
        "aug_rt_t": rngb.normal(scale=0.01, size=(bs, 3)).astype(np.float32),
        "aug_rt_R": np.tile(np.eye(3, dtype=np.float32), (bs, 1, 1)),
        "model_point": rngb.normal(scale=0.1, size=(bs, 256, 3)).astype(np.float32),
        "nocs_scale": (np.abs(rngb.normal(size=(bs,))) + 0.5).astype(np.float32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    def step(state, key):
        return train_step(state, batch, key)

    state2, metrics = step(state, jax.random.key(1))
    _sync(metrics["total_loss"])
    print(f"train loss sanity: {float(metrics['total_loss']):.3f}", flush=True)
    iters = 20
    t0 = time.perf_counter()
    s_run = state2
    for i in range(iters):
        s_run, metrics = train_step(s_run, batch, jax.random.key(2))
    _sync(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"train step (B=16, VJP kernels): {dt*1000:.1f} ms  "
          f"({bs/dt:.0f} samples/s)", flush=True)


if __name__ == "__main__":
    main()
