"""Round-5 serving probe: relaxed-KNN tier throughput.

All serving micro-probes are closed (docs/PERFORMANCE.md); the only path past
~1831 crops/s is semantic relaxation with mAP evidence.  This measures the
throughput side of the two relaxation knobs (config.py ModelConfig):

  rf_reuse — conv_1 reuses the xyz KNN, conv_3 reuses conv_2's feature KNN
             (2 of 6 serving KNN searches dropped)
  k=16/12  — smaller neighbour count through every layer (the support/ORL
             kernels' marginal cost is ~linear in k; the KNN extraction loop
             runs k+1 sweeps)

The ACCURACY side runs separately on a trained probe model
(scripts/fast_mode_parity.py --easy extended tier study, 0.3-pt budget).

Usage: python scripts/probe_serve_relax.py  (TPU, ~5 min)
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import measure_inference  # noqa: E402
from hspose_tpu.config import default_config  # noqa: E402

B = 24  # serving-batch optimum


def main():
    cfg0 = default_config()
    variants = [
        ("base k=20", {}),
        ("rf_reuse", {"serve_rf_reuse": True}),
        ("k=16", {"serve_k": 16}),
        ("k=12", {"serve_k": 12}),
        ("k=12+rf_reuse", {"serve_k": 12, "serve_rf_reuse": True}),
    ]
    for dtype in ("bfloat16", "float32"):
        print(f"--- serving relaxation sweep, compute_dtype={dtype}, B={B} ---",
              flush=True)
        base = None
        for name, knobs in variants:
            cfg = cfg0.replace(model=dataclasses.replace(
                cfg0.model, compute_dtype=dtype, **knobs))
            cps = measure_inference(cfg, B=B)
            if base is None:
                base = cps
            print(f"{name:>14s}: {cps:8.1f} crops/s  "
                  f"[{(cps / base - 1) * 100:+.1f}%]", flush=True)


if __name__ == "__main__":
    main()
