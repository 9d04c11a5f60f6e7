"""flat_and_anneal learning-rate schedule (pure function of the step).

Matches ``tools/torch_utils/solver/lr_scheduler.flat_and_anneal_lr_scheduler``
(:177-263): linear warmup from ``warmup_factor`` over ``warmup_iters``, flat at the
base LR until ``anneal_point``·total, then cosine (or linear/poly/exp) anneal to
``target_lr_factor``·base.
"""

from __future__ import annotations

import jax.numpy as jnp

from hspose_tpu.config import OptimConfig


def flat_and_anneal_factor(step, total_iters: int, warmup_iters: int = 1000,
                           warmup_factor: float = 1e-3, anneal_point: float = 0.72,
                           anneal_method: str = "cosine", target_lr_factor: float = 0.0,
                           poly_power: float = 1.0):
    """LR multiplier at ``step`` (float/array safe, jit-friendly)."""
    step = jnp.asarray(step, jnp.float32)
    anneal_start = anneal_point * total_iters

    alpha = step / jnp.maximum(warmup_iters, 1)
    warm = warmup_factor * (1 - alpha) + alpha

    frac = (step - anneal_start) / jnp.maximum(total_iters - anneal_start, 1e-8)
    if anneal_method == "cosine":
        ann = target_lr_factor + 0.5 * (1 - target_lr_factor) * (1 + jnp.cos(jnp.pi * frac))
    elif anneal_method == "linear":
        ann = target_lr_factor + (1 - target_lr_factor) * (1 - frac)
    elif anneal_method == "poly":
        ann = target_lr_factor + (1 - target_lr_factor) * (1 - frac) ** poly_power
    elif anneal_method == "exp":
        ann = jnp.maximum(target_lr_factor, 5e-3) ** frac
    elif anneal_method == "none":
        ann = jnp.asarray(1.0)
    else:
        raise ValueError(f"unsupported anneal_method {anneal_method}")

    return jnp.where(step < warmup_iters, warm,
                     jnp.where(step >= anneal_start, ann, 1.0))


def build_schedule(cfg: OptimConfig, total_iters: int):
    """Returns an optax-style schedule fn step -> lr."""
    def schedule(step):
        return cfg.lr * cfg.lr_pose * flat_and_anneal_factor(
            step, total_iters, cfg.warmup_iters, cfg.warmup_factor,
            cfg.anneal_point, cfg.anneal_method, 0.0, cfg.poly_power)
    return schedule
