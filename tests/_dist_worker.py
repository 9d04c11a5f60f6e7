"""Two-process ``jax.distributed`` DP worker.

Launched twice (process_id 0/1) by ``test_parallel.py::test_two_process_dp_train``:
each process brings up 2 virtual CPU devices, joins the coordination service via
``hspose_tpu.parallel.mesh.init_distributed``, and runs two DP train steps over the
4-global-device mesh on a deterministic synthetic batch.  Process 0 prints one JSON
line {"losses": [...], "param_sum": ...} for the parent to compare against a
single-process run — executable evidence for SURVEY §5.8 (multi-host DP is the
same code path, with XLA routing the gradient all-reduce across processes).
"""

import json
import os
import sys

proc_id = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from hspose_tpu.config import ParallelConfig, default_config  # noqa: E402
from hspose_tpu.parallel.mesh import init_distributed, make_mesh  # noqa: E402


def main():
    n_proc = init_distributed(f"127.0.0.1:{port}", 2, proc_id)
    assert n_proc == 2, n_proc
    assert jax.process_count() == 2
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 4

    from hspose_tpu.engine.train_step import build_train_step
    from hspose_tpu.models.hspose import build_model
    from test_checkpoint import _fake_batch

    cfg = default_config()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, num_points=128))
    model = build_model(cfg)
    tx, state, train_step = build_train_step(cfg, model, jax.random.key(0))
    host_state = jax.device_get(state)

    mesh = make_mesh(ParallelConfig(dp=4))

    def put(tree, spec):
        sh = NamedSharding(mesh, spec)
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x), np.shape(x)), tree)

    state = put(host_state, P())
    # both processes build the identical global batch (seeded); each contributes
    # its addressable shards of the dp-sharded arrays
    batch = _fake_batch(np.random.default_rng(0), 8, 128)
    sharded = {k: jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")), v, v.shape) for k, v in batch.items()}

    key = jax.random.key(9)
    # AOT-compile BEFORE the host-level barrier: on a 1-core host the two
    # processes' compiles serialize, and the first executed collective would
    # otherwise hit Gloo's fixed ~30 s context-init deadline while the peer is
    # still compiling.  The coordination-service barrier has a configurable
    # timeout and involves no device collectives.
    step_compiled = train_step.lower(state, sharded, key).compile()
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    client.wait_at_barrier("hspose_dist_compiled", timeout_in_ms=900_000)

    losses = []
    for _ in range(2):
        state, metrics = step_compiled(state, sharded, key)
        losses.append(float(jax.device_get(metrics["total_loss"])))

    param_sum = float(sum(
        float(jax.device_get(jax.numpy.sum(jax.numpy.abs(x))))
        for x in jax.tree_util.tree_leaves(state.params)))
    client.wait_at_barrier("hspose_dist_done", timeout_in_ms=900_000)
    if proc_id == 0:
        print(json.dumps({"losses": losses, "param_sum": param_sum}), flush=True)


if __name__ == "__main__":
    main()
