"""Device-op trace of the fast serving forward at two batch sizes.

The serving-batch sweep (probe_serve_batch.py) measured the compiled forward
~5% faster per crop at B=32 than at B=256, while isolated kernel calls go the
other way — so the win must live between the kernels.  This traces the jitted
eval forward at both batches and prints per-op device time *per crop*, sorted
by the B=256 cost, to locate which ops scale super-linearly in B.

Usage: python scripts/trace_serve_batch.py [out_dir]
"""

import collections
import dataclasses
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import hspose_tpu  # noqa: F401

from hspose_tpu.config import default_config
from hspose_tpu.geometry.rotations import generate_RT
from hspose_tpu.models.hspose import build_model, eval_forward


def op_times(out_dir, n_steps):
    """{op name: device µs/step} from the newest Chrome trace under out_dir."""
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
    for e in ev:
        if (e.get("ph") == "X" and "dur" in e
                and tids.get((e["pid"], e["tid"])) == "XLA Ops"):
            tot[e["name"]] += e["dur"]
    return {k: v / n_steps for k, v in tot.items()}


def trace_forward(B, out_dir, iters=None):
    iters = iters or max(4, 512 // B)
    cfg = default_config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                compute_dtype="bfloat16"))
    n = cfg.data.num_points
    model = build_model(cfg)
    r = np.random.default_rng(0)
    pc = jnp.asarray(r.normal(scale=0.2, size=(B, n, 3)).astype(np.float32))
    obj = jnp.asarray((np.arange(B) % 6).astype(np.int32))
    sym = jnp.asarray(np.tile([[0, 1, 0, 0]], (B, 1)).astype(np.float32))
    variables = model.init({"params": jax.random.key(0), "pool": jax.random.key(1),
                            "dropout": jax.random.key(2)}, pc[:2], obj[:2], True)

    @jax.jit
    def forward(pc, obj_id, sym, key):
        out = eval_forward(model, variables["params"], variables["batch_stats"],
                           key, pc, obj_id)
        RT = generate_RT(out.p_green_R, out.p_red_R, out.f_green_R, out.f_red_R,
                         out.pred_T, sym)
        return RT, out.pred_s

    key = jax.random.key(0)
    RT, _ = forward(pc, obj, sym, key)
    np.asarray(RT)
    jax.profiler.start_trace(out_dir)
    for i in range(iters):
        RT, _ = forward(pc, obj, sym, jax.random.fold_in(key, i))
    np.asarray(RT)
    jax.profiler.stop_trace()
    return op_times(out_dir, iters)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_trace_serve"
    t_small = trace_forward(32, os.path.join(root, "b32"))
    t_big = trace_forward(256, os.path.join(root, "b256"))
    tot_s = sum(t_small.values()) / 32
    tot_b = sum(t_big.values()) / 256
    print(f"device us/crop: B=32 {tot_s:.1f} | B=256 {tot_b:.1f} "
          f"({(tot_b / tot_s - 1) * 100:+.1f}% at 256)", flush=True)
    names = sorted(set(t_small) | set(t_big),
                   key=lambda k: -t_big.get(k, 0.0))
    print(f"{'us/crop B=32':>14s} {'B=256':>10s} {'delta':>8s}  op")
    for k in names[:40]:
        s = t_small.get(k, 0.0) / 32
        b = t_big.get(k, 0.0) / 256
        print(f"{s:14.2f} {b:10.2f} {b - s:8.2f}  {k[:90]}")


if __name__ == "__main__":
    main()
