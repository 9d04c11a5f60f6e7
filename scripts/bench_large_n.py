"""Full-model serving throughput beyond the reference's fixed N=1028.

The reference hardcodes 1028 sampled points (config/config.py); both networks
derive pool sizes and neighbour counts from runtime shapes (FaceRecon.py:92-97
rules), so the same weights serve denser clouds unchanged.  This measures the
whole eval forward (backbone + heads + generate_RT) at N∈{1028, 2056, 4096}
in fast (bf16 fused) and exact (f32 split-gather) mode on the real chip — the
honest "scales beyond 1028" claim of SURVEY §5.7; numeric parity at N=2056 is
tested against the torch reference in tests/test_torch_parity.py.

Batch shrinks as N grows: the serving-batch sweep finding (small inter-op
working sets win — scripts/probe_serve_batch.py) holds at every N; measured
optima are B=32 at N=1028, B=16 at N=2056, B=8 at N=4096 (B∈{8..128} swept,
monotone at each N, spread ~3%).

Usage: nohup python -u scripts/bench_large_n.py > /tmp/bench_large_n.log &
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import measure_inference, model_flops_per_crop
from hspose_tpu.config import default_config


def main():
    cfg = default_config()
    cfg_fast = cfg.replace(model=dataclasses.replace(cfg.model,
                                                     compute_dtype="bfloat16"))
    for n, b, iters in ((1028, 32, 160), (2056, 16, 60), (4096, 8, 30)):
        fl = model_flops_per_crop(n) / 1e9
        for name, c in (("fast", cfg_fast), ("exact", cfg)):
            c = c.replace(data=dataclasses.replace(c.data, num_points=n))
            try:
                cps = measure_inference(c, B=b, iters=iters)
            except Exception as e:  # noqa: BLE001 — record OOM/compile failures
                print(f"N={n:4d} B={b:3d} {name:5s}: FAILED "
                      f"({type(e).__name__}: {str(e)[:160]})", flush=True)
                continue
            print(f"N={n:4d} B={b:3d} {name:5s}: {cps:7.1f} crops/s  "
                  f"({fl:.1f} GFLOP/crop, {cps * fl / 1000:.1f} TF/s)",
                  flush=True)


if __name__ == "__main__":
    main()
