"""Parameter loading: orbax checkpoints or reference torch .pth files."""

from __future__ import annotations

import os
from typing import Tuple

import jax
import numpy as np

from hspose_tpu.config import HSPoseConfig


def init_variables(cfg: HSPoseConfig):
    from hspose_tpu.models.hspose import build_model

    model = build_model(cfg)
    n = cfg.data.num_points
    variables = model.init(
        {"params": jax.random.key(0), "pool": jax.random.key(1),
         "dropout": jax.random.key(2)},
        np.zeros((1, n, 3), np.float32), np.zeros((1,), np.int32), True)
    return model, variables


def load_params(cfg: HSPoseConfig, path: str) -> Tuple[dict, dict]:
    """Returns (params, batch_stats) from an orbax dir or a torch .pth file."""
    if path.endswith(".pth") or path.endswith(".pt"):
        return load_torch_checkpoint(cfg, path)
    # orbax training checkpoint
    from hspose_tpu.engine.checkpoint import restore_checkpoint
    from hspose_tpu.engine.train_step import build_train_step

    model, variables = init_variables(cfg)
    from hspose_tpu.engine.optimizer import build_optimizer
    total_iters = max(cfg.train.train_steps * cfg.train.total_epoch
                      // max(cfg.train.accumulate, 1), 1)
    tx = build_optimizer(cfg.optim, total_iters)
    from hspose_tpu.engine.train_step import TrainState
    import jax.numpy as jnp
    abstract = TrainState(step=jnp.zeros([], jnp.int32),
                          params=variables["params"],
                          batch_stats=variables["batch_stats"],
                          opt_state=tx.init(variables["params"]))
    state, _, _ = restore_checkpoint(path, abstract)
    return state.params, state.batch_stats


def load_torch_checkpoint(cfg: HSPoseConfig, path: str) -> Tuple[dict, dict]:
    """Load a reference torch checkpoint via the conversion bridge."""
    import torch

    from hspose_tpu.utils.torch_convert import convert_torch_state_dict, merge_with_template

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("posenet_state_dict", ckpt)
    params_c, stats_c = convert_torch_state_dict(state_dict)

    _, variables = init_variables(cfg)
    params = merge_with_template(params_c, jax.device_get(variables["params"]))
    stats = merge_with_template(stats_c, jax.device_get(variables["batch_stats"]))
    return params, stats
