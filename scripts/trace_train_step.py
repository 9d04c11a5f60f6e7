"""Device-op-level breakdown of the train step via a jax.profiler trace.

Runs a few train steps under the profiler, then parses the raw .xplane.pb with
the TF xplane proto (no tensorboard UI needed) and prints per-op device time
sorted descending — the ground truth for where the 79 ms step goes.

Usage: python scripts/trace_train_step.py [out_dir]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import hspose_tpu  # noqa: F401

from hspose_tpu.config import default_config
from hspose_tpu.engine.train_step import build_train_step
from hspose_tpu.models.hspose import build_model


def make_batch(bs, n):
    rng = np.random.default_rng(0)
    A = rng.normal(size=(bs, 3, 3))
    Q, _ = np.linalg.qr(A)
    Q *= np.sign(np.linalg.det(Q))[:, None, None]
    return {
        "pcl_in": jnp.asarray(rng.normal(scale=0.2, size=(bs, n, 3)), jnp.float32),
        "cat_id": jnp.asarray((np.arange(bs) % 6).astype(np.float32)),
        "rotation": jnp.asarray(Q, jnp.float32),
        "translation": jnp.asarray(rng.normal(scale=0.1, size=(bs, 3)), jnp.float32),
        "fsnet_scale": jnp.asarray(rng.normal(scale=0.01, size=(bs, 3)), jnp.float32),
        "mean_shape": jnp.asarray(np.abs(rng.normal(size=(bs, 3))) * 0.1 + 0.1, jnp.float32),
        "sym_info": jnp.asarray(np.tile([[0, 1, 0, 0]], (bs, 1)), jnp.float32),
        "aug_bb": jnp.asarray(rng.uniform(0.8, 1.2, (bs, 3)), jnp.float32),
        "aug_rt_t": jnp.asarray(rng.normal(scale=0.01, size=(bs, 3)), jnp.float32),
        "aug_rt_R": jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (bs, 1, 1))),
        "model_point": jnp.asarray(rng.normal(scale=0.1, size=(bs, 1024, 3)), jnp.float32),
        "nocs_scale": jnp.asarray(np.abs(rng.normal(size=(bs,))) + 0.5, jnp.float32),
    }


def analyze(out_dir, n_steps):
    """Parse the Chrome-trace json.gz the profiler writes alongside the xplane
    (the xplane proto modules aren't importable in this environment)."""
    import collections
    import gzip
    import json

    files = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace.json.gz under {out_dir}"
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    tids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    tot = collections.defaultdict(float)
    cnt = collections.Counter()
    for e in ev:
        if (e.get("ph") == "X" and "dur" in e
                and tids.get((e["pid"], e["tid"])) == "XLA Ops"):
            tot[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    print(f"total XLA-op ms/step: {sum(tot.values()) / 1000 / n_steps:.2f}")
    for name, us in items[:45]:
        print(f"{us / 1000 / n_steps:8.3f} ms/step x{cnt[name] // n_steps:4d}"
              f"  {name[:100]}")


def main():
    args = sys.argv[1:]
    bs = 16
    if "--batch" in args:
        i = args.index("--batch")
        bs = int(args[i + 1])
        del args[i:i + 2]
    bf16 = "--bf16" in args
    args = [a for a in args if a != "--bf16"]
    out_dir = args[0] if args else "/tmp/tpu_trace_train"
    cfg = default_config()
    if bf16:
        import dataclasses
        cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                    compute_dtype="bfloat16"))
    print(f"trace config: batch={bs} dtype={cfg.model.compute_dtype}",
          flush=True)
    model = build_model(cfg)
    tx, state, train_step = build_train_step(cfg, model, jax.random.key(0))
    batch = make_batch(bs, cfg.data.num_points)
    key = jax.random.key(1)

    state, m = train_step(state, batch, key)
    print("warm loss", float(np.asarray(m["total_loss"])), flush=True)

    n_steps = 8
    jax.profiler.start_trace(out_dir)
    for _ in range(n_steps):
        state, m = train_step(state, batch, key)
    np.asarray(m["total_loss"])
    jax.profiler.stop_trace()
    print("trace done", flush=True)
    analyze(out_dir, n_steps)


if __name__ == "__main__":
    main()
