"""Serving-ceiling probe: the f32x2 middle tier (VERDICT r3 task 7b).

Measures eval throughput at B=256/N=1028 for all three serving tiers:
bfloat16 (fast), f32x2 (2-term-split feature gathers, ~1.5e-5), float32
(3-term exact).  The f32x2 hypothesis: feature gathers are the dominant
split-gather cost of the exact tier (~40-52%, docs/PERFORMANCE.md), so
dropping 3-term to 2-term splits should buy ~10-15% over exact — projected
~850 crops/s by VERDICT r3.

Usage: nohup python -u scripts/probe_f32x2.py > /tmp/probe_f32x2.log &
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import measure_inference
from hspose_tpu.config import default_config


def main():
    cfg = default_config()
    for tier, iters in (("bfloat16", 30), ("f32x2", 15), ("float32", 10)):
        c = cfg.replace(model=dataclasses.replace(cfg.model,
                                                  compute_dtype=tier))
        cps = measure_inference(c, B=256, iters=iters)
        print(f"{tier:9s}: {cps:7.1f} crops/s", flush=True)


if __name__ == "__main__":
    main()
