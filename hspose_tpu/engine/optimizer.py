"""Ranger optimizer (RAdam + Lookahead + Gradient Centralization) as optax chain.

Semantics match ``tools/torch_utils/solver/ranger2020.py``: GC applied to the raw
gradient before the moment updates (gc_loc=True, :181-182), RAdam with the
N_sma rectification buffer (:192-214, betas (0.95, 0.999), eps 1e-5, threshold 5),
and per-parameter lookahead every k=6 steps with α=0.5 (:238-244).  The surrounding
train loop clips the global grad norm to 5 *before* the optimizer step
(engine/train.py:107), so the full chain is clip → ranger.

Layout note for GC: torch centralizes over all axes except axis 0 (the output axis
of torch Linear/Conv weights).  Our flax Dense kernels are stored transposed
(in, out), so kernels named ``kernel`` centralize over all axes except the *last*;
raw parameters that keep their torch layout (the HS layers' ``weights`` /
``directions``) centralize over axes 1.. exactly like torch.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax
from jax import tree_util

from hspose_tpu.config import OptimConfig
from hspose_tpu.engine.schedule import build_schedule


def _gc_axes(path, g) -> tuple:
    """Axes to centralize over for one parameter, or () to skip (ndim < 2)."""
    if g.ndim <= 1:
        return ()
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if name == "kernel":  # flax Dense: (in, out) — torch layout transposed
        return tuple(range(g.ndim - 1))
    return tuple(range(1, g.ndim))  # torch-layout raw params


def gradient_centralization() -> optax.GradientTransformation:
    """GC (https://arxiv.org/abs/2004.01461): subtract the per-filter gradient mean."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def gc(path, g):
            axes = _gc_axes(path, g)
            if not axes:
                return g
            return g - jnp.mean(g, axis=axes, keepdims=True)

        return tree_util.tree_map_with_path(gc, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


class RAdamRectifiedState(NamedTuple):
    step: chex.Array
    exp_avg: chex.ArrayTree
    exp_avg_sq: chex.ArrayTree


def radam_rectified(b1: float = 0.95, b2: float = 0.999, eps: float = 1e-5,
                    n_sma_threshold: int = 5,
                    weight_decay: float = 0.0) -> optax.GradientTransformation:
    """RAdam core with ranger2020's rectification (ranger2020.py:184-233).

    Produces the *descent direction* step_size·G (unscaled by lr; chain with
    optax.scale_by_learning_rate).
    """

    def init_fn(params):
        zeros = tree_util.tree_map(jnp.zeros_like, params)
        return RAdamRectifiedState(jnp.zeros([], jnp.int32), zeros,
                                   tree_util.tree_map(jnp.zeros_like, params))

    import math

    log_b1 = math.log(b1)
    log_b2 = math.log(b2)

    def update_fn(updates, state, params=None):
        step = state.step + 1
        t = step.astype(jnp.float32)

        exp_avg = tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g,
                                     state.exp_avg, updates)
        exp_avg_sq = tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                        state.exp_avg_sq, updates)

        # 1 − βᵗ via expm1: the naive f32 form loses enough precision to flip the
        # rectification branch near the N_sma threshold (observed at t=5)
        one_minus_beta2_t = -jnp.expm1(t * log_b2)
        beta2_t = 1.0 - one_minus_beta2_t
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * t * beta2_t / one_minus_beta2_t
        rect = jnp.sqrt(one_minus_beta2_t * (n_sma - 4.0) / (n_sma_max - 4.0)
                        * (n_sma - 2.0) / n_sma * n_sma_max / (n_sma_max - 2.0))
        bias1 = -jnp.expm1(t * log_b1)
        use_adaptive = n_sma > n_sma_threshold
        step_size = jnp.where(use_adaptive, rect / bias1, 1.0 / bias1)

        def direction(m, v, p):
            adaptive = m / (jnp.sqrt(v) + eps)
            g = jnp.where(use_adaptive, adaptive, m)
            if weight_decay != 0.0 and p is not None:
                g = g + weight_decay * p
            return step_size * g

        if params is None:
            params = tree_util.tree_map(lambda m: None, exp_avg)
        new_updates = tree_util.tree_map(direction, exp_avg, exp_avg_sq, params)
        return new_updates, RAdamRectifiedState(step, exp_avg, exp_avg_sq)

    return optax.GradientTransformation(init_fn, update_fn)


class LookaheadState(NamedTuple):
    step: chex.Array
    slow: chex.ArrayTree


def lookahead(k: int = 6, alpha: float = 0.5) -> optax.GradientTransformation:
    """Per-parameter lookahead (ranger2020.py:238-244).

    Every k steps the slow weights absorb α of the fast-weight excursion and the
    fast weights are reset to them.  Implemented on the *updates* stream: at a sync
    step the emitted update is (new_slow − params) instead of the inner update.
    """

    def init_fn(params):
        # materialize a copy: aliasing the live param buffers breaks donation
        return LookaheadState(jnp.zeros([], jnp.int32),
                              tree_util.tree_map(lambda p: jnp.array(p, copy=True),
                                                 params))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("lookahead requires params")
        step = state.step + 1
        sync = (step % k) == 0

        def merge(u, slow, p):
            fast = p + u
            new_slow = slow + alpha * (fast - slow)
            out_update = jnp.where(sync, new_slow - p, u)
            out_slow = jnp.where(sync, new_slow, slow)
            return out_update, out_slow

        merged = tree_util.tree_map(merge, updates, state.slow, params)
        new_updates = tree_util.tree_map(lambda x: x[0], merged,
                                         is_leaf=lambda x: isinstance(x, tuple))
        new_slow = tree_util.tree_map(lambda x: x[1], merged,
                                      is_leaf=lambda x: isinstance(x, tuple))
        return new_updates, LookaheadState(step, new_slow)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(cfg: OptimConfig, total_iters: int) -> optax.GradientTransformation:
    """clip(5) → GC → RAdam(rectified) → −lr(t) → lookahead (reference order:
    engine/train.py:105-113 + ranger2020.step)."""
    schedule = build_schedule(cfg, total_iters)
    chain = [optax.clip_by_global_norm(cfg.clip_grad_norm)]
    if cfg.use_gc:
        chain.append(gradient_centralization())
    chain.append(radam_rectified(cfg.betas[0], cfg.betas[1], cfg.eps,
                                 cfg.n_sma_threshold, cfg.weight_decay))
    chain.append(optax.scale_by_learning_rate(schedule))  # multiplies by −lr(t)
    chain.append(lookahead(cfg.lookahead_k, cfg.lookahead_alpha))
    return optax.chain(*chain)
