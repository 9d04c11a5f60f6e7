"""Probe: serving batch size (real TPU).

bench.py used B=256 detection crops per device batch (the eval harness
default was 64).  The v4 kernels grid over (B, N/tq) programs, so throughput
should be ~flat in B once the grid is deep enough to hide dispatch — measured
it is NOT flat: crops/s rises monotonically as B shrinks, with the knee at
B≈24-32 and dispatch overhead biting below 16:

    fast  B=8 1760.7 | 16 1771.2 | 24 1784.5 | 32 1783.4 | 48 1777.4
          B=64 1755.2 | 96 1738.2 | 128 1724.7 | 192 1712.6 | 256 1695.5
          B=512 1665.5 | 1024 1653.2
    exact B=16 804.6 | 32 817.9 | 64 797.8 | 128 782.1 | 256 773.4 | 512 765.6

(+5.3% fast / +5.8% exact at B=32 over the old B=256 bench shape — smaller
inter-op HBM working sets; the per-program kernel work is B-independent.)
After the late round-4 graph slimming (split Ts head, sampled-row pooling) a
re-probe moved the knee: fast is flat over B=16..32 while the split-gather
tiers prefer 24, so **B=24** is the bench.py / eval_batch default (see
docs/PERFORMANCE.md's serving-batch sweep section).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import measure_inference
from hspose_tpu.config import default_config


def main():
    cfg = default_config()
    cfg_fast = cfg.replace(model=dataclasses.replace(cfg.model,
                                                     compute_dtype="bfloat16"))
    for B in (8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 512, 1024):
        cps = measure_inference(cfg_fast, B=B, iters=max(10, 7680 // B))
        print(f"fast  B={B:5d}  {cps:8.1f} crops/s", flush=True)
    for B in (16, 32, 64, 128, 256, 512):
        cps = measure_inference(cfg, B=B, iters=max(6, 2560 // B))
        print(f"exact B={B:5d}  {cps:8.1f} crops/s", flush=True)


if __name__ == "__main__":
    main()
