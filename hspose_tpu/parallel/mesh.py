"""Device mesh + data-parallel sharding.

The reference is strictly single-GPU (engine/train.py:23); scale-out is the one
first-class distributed capability the TPU framework adds (SURVEY.md §2.2): the
batch axis is sharded over a 1-D ``jax.sharding.Mesh`` and XLA emits the gradient
all-reduces over ICI.  Multi-host extends the same code via ``jax.distributed``.
No custom communication layer exists, by design.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hspose_tpu.config import ParallelConfig


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host bring-up over DCN (no-op on a single host).

    On TPU pods the arguments come from the environment; pass them explicitly for
    manual launches.  Returns the process count.  After this, ``make_mesh`` over
    ``jax.devices()`` spans all hosts and the same DP train step runs unchanged —
    XLA routes the gradient all-reduce over ICI within a slice and DCN across.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_count()


def make_mesh(cfg: ParallelConfig, devices=None) -> Mesh:
    """1-D (dp,) mesh, or a 2-D (dp, mp) mesh when ``cfg.mp > 1``.

    The batch axis always shards over dp only; mp shards Dense output
    channels (see :func:`state_sharding`)."""
    devices = devices if devices is not None else jax.devices()
    mp = max(cfg.mp, 1)
    dp = cfg.dp if cfg.dp > 0 else len(devices) // mp
    assert dp * mp <= len(devices), \
        f"requested dp*mp={dp}*{mp} > {len(devices)} devices"
    if mp == 1:
        return Mesh(np.array(devices[:dp]).reshape(dp), (cfg.mesh_axis_name,))
    return Mesh(np.array(devices[:dp * mp]).reshape(dp, mp),
                (cfg.mesh_axis_name, cfg.model_axis_name))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def state_sharding(mesh: Mesh, tree):
    """Per-leaf NamedShardings for params / optimizer state / batch stats.

    1-D mesh: everything replicated (pure DP).  2-D mesh: every ``kernel``
    leaf (flax Dense) whose output dim divides by mp and is >=256 shards its
    OUTPUT channels over the mp axis — the pose heads' 1286->1024->256 blocks
    and the STE/conv2 per-point maps.  Because optax state subtrees (mu, nu,
    lookahead slow params...) reuse the param tree's key paths, the same
    path-suffix rule shards them consistently.  Pallas-kernel operands
    (``weights``/``directions`` of the HS layers) stay replicated: a
    pallas_call has no partitioning rule, so sharding them would only buy an
    all-gather in front of every kernel launch.
    """
    if len(mesh.axis_names) == 1:
        return jax.tree_util.tree_map(lambda _: replicated(mesh), tree)
    mp_axis = mesh.axis_names[1]
    mp = mesh.shape[mp_axis]

    def rule(path, leaf):
        name = None
        if path:
            last = path[-1]
            name = getattr(last, "key", None) or getattr(last, "name", None)
        shape = getattr(leaf, "shape", ())
        if (name == "kernel" and len(shape) == 2 and shape[1] % mp == 0
                and shape[1] >= 256):
            return NamedSharding(mesh, P(None, mp_axis))
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(rule, tree)


def shard_state(mesh: Mesh, tree):
    """Place a host-side state pytree per :func:`state_sharding`."""
    return jax.tree_util.tree_map(jax.device_put, tree, state_sharding(mesh, tree))


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    """Place host arrays with the batch axis split over the mesh.

    Batch size must divide by the mesh size; the train loop guarantees this.
    """
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate_state(mesh: Mesh, tree):
    """Replicate params/optimizer state across the mesh (pure DP)."""
    return jax.device_put(tree, replicated(mesh))


def pad_to_multiple(batch: Dict[str, np.ndarray], multiple: int
                    ) -> Dict[str, np.ndarray]:
    """Pad the leading axis up to a multiple (for ragged eval batches)."""
    n = next(iter(batch.values())).shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch
    return {k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
            for k, v in batch.items()}
