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


def _warmup_factor(step, warmup_iters: int, warmup_factor: float,
                   warmup_method: str):
    """detectron2 ``_get_warmup_factor_at_iter`` (vendored by the reference via
    ``detectron2.solver``, selected in tools/solver_utils.py:62-78)."""
    if warmup_method == "constant":
        warm = jnp.asarray(warmup_factor, jnp.float32)
    elif warmup_method == "linear":
        alpha = step / jnp.maximum(warmup_iters, 1)
        warm = warmup_factor * (1 - alpha) + alpha
    else:
        raise ValueError(f"unsupported warmup_method {warmup_method}")
    return jnp.where(step >= warmup_iters, 1.0, warm)


def warmup_multistep_factor(step, total_iters: int, rel_steps, gamma: float = 0.1,
                            warmup_iters: int = 1000, warmup_factor: float = 1e-3,
                            warmup_method: str = "linear"):
    """``WarmupMultiStepLR``: step decay by ``gamma`` at each milestone
    (reference selects it in tools/solver_utils.py:62-70; milestones are
    ``rel_steps``·total, :60)."""
    step = jnp.asarray(step, jnp.float32)
    warm = _warmup_factor(step, warmup_iters, warmup_factor, warmup_method)
    n_passed = sum((step >= rel * total_iters).astype(jnp.float32)
                   for rel in rel_steps)
    return warm * gamma ** n_passed


def warmup_cosine_factor(step, total_iters: int, warmup_iters: int = 1000,
                         warmup_factor: float = 1e-3,
                         warmup_method: str = "linear"):
    """``WarmupCosineLR``: half-cosine from base LR to 0 over the whole run
    (reference selects it in tools/solver_utils.py:71-78)."""
    step = jnp.asarray(step, jnp.float32)
    warm = _warmup_factor(step, warmup_iters, warmup_factor, warmup_method)
    return warm * 0.5 * (1.0 + jnp.cos(jnp.pi * step / total_iters))


def build_schedule(cfg: OptimConfig, total_iters: int):
    """Returns an optax-style schedule fn step -> lr, dispatched on
    ``lr_scheduler_name`` exactly like ``tools/solver_utils.build_lr_scheduler``."""
    name = cfg.lr_scheduler_name.lower()

    def schedule(step):
        if name == "warmupmultisteplr":
            f = warmup_multistep_factor(step, total_iters, cfg.rel_steps,
                                        cfg.gamma, cfg.warmup_iters,
                                        cfg.warmup_factor, cfg.warmup_method)
        elif name == "warmupcosinelr":
            f = warmup_cosine_factor(step, total_iters, cfg.warmup_iters,
                                     cfg.warmup_factor, cfg.warmup_method)
        elif name == "flat_and_anneal":
            f = flat_and_anneal_factor(
                step, total_iters, cfg.warmup_iters, cfg.warmup_factor,
                cfg.anneal_point, cfg.anneal_method, 0.0, cfg.poly_power)
        else:
            raise ValueError(f"Unknown LR scheduler: {cfg.lr_scheduler_name}")
        return cfg.lr * cfg.lr_pose * f

    return schedule
