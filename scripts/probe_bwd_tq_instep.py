"""In-step backward-tile sweep (probe (a), tunnel-proof variant).

Isolated backward pallas_calls are dispatch-dominated on this rig's tunneled
TPU (hundreds of ms of flow-controlled round trip per call), so tile choices
are swept through the FULL jitted train step instead: each candidate sets
``HSPOSE_BWD_TQ=<n_pad>:<tq>`` (read by pallas_hs._pick_tq_bwd) in a fresh
subprocess and times the step at the bf16 batch-24 optimum.

Usage: python scripts/probe_bwd_tq_instep.py [n_pad:tq ...]
       (no args: sweeps conv_1's n_pad=1152 tiles {auto,8,24,32,64,96})
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TIMER = r"""
import dataclasses, time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from hspose_tpu.config import default_config
from hspose_tpu.engine.train_step import build_train_step
from hspose_tpu.models.hspose import build_model
from hspose_tpu.utils.synthetic import synthetic_train_batch

import os
cfg = default_config()
cfg = cfg.replace(model=dataclasses.replace(
    cfg.model, compute_dtype="bfloat16",
    bwd_store=bool(os.environ.get("HSPOSE_PROBE_STORE"))))
batch = {k: jnp.asarray(v) for k, v in synthetic_train_batch(24, 1028).items()}
model = build_model(cfg)
_, state, train_step = build_train_step(cfg, model, jax.random.key(0))
key = jax.random.key(1)
state, m = train_step(state, batch, key); np.asarray(m["total_loss"])
state, m = train_step(state, batch, key); np.asarray(m["total_loss"])
best = 1e9
for _ in range(3):
    t0 = time.time()
    for _ in range(20):
        state, m = train_step(state, batch, key)
    np.asarray(m["total_loss"])
    best = min(best, (time.time() - t0) / 20)
print(f"RESULT {best*1000:.2f}")
"""


def run(tag, env_val):
    env = dict(os.environ)
    if env_val:
        env["HSPOSE_BWD_TQ"] = env_val
    else:
        env.pop("HSPOSE_BWD_TQ", None)
    p = subprocess.run([sys.executable, "-c", TIMER], env=env, cwd=ROOT,
                       capture_output=True, text=True)
    ms = None
    for line in p.stdout.splitlines():
        if line.startswith("RESULT"):
            ms = float(line.split()[1])
    if ms is None:
        err = (p.stderr or "").strip().splitlines()
        print(f"{tag:>12s}: FAIL ({err[-1][:90] if err else 'no output'})",
              flush=True)
    else:
        print(f"{tag:>12s}: {ms:7.2f} ms/step", flush=True)
    return ms


def main():
    cands = sys.argv[1:] or ["", "1152:8", "1152:24", "1152:32", "1152:64",
                             "1152:96"]
    print("in-step bwd tile sweep (bf16 batch 24; auto first)", flush=True)
    for c in cands:
        run(c or "auto(48)", c)


if __name__ == "__main__":
    main()
