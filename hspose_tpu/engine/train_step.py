"""The single jitted train step (+ state container).

Everything the reference's epoch loop does per batch (engine/train.py:74-117) —
augmentation, forward, four loss families, backward, clip, Ranger step, schedule
step, NaN-skip — compiles into ONE XLA program.  The NaN guard mirrors
engine/train.py:99-103: a non-finite total loss leaves params/opt state untouched
(the reference `continue`s the batch).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from hspose_tpu.config import HSPoseConfig
from hspose_tpu.engine.optimizer import build_optimizer
from hspose_tpu.models.hspose import train_forward
from hspose_tpu.models.posenet import PoseNet9D


def check_finite_metrics(metrics) -> None:
    """Sanitizer-mode step check: raise naming the non-finite loss families.

    ``jax_debug_nans`` only inspects outputs on slow-path dispatches (first call /
    retrace) — a NaN appearing later, under the cached executable, sails through.
    The train loop calls this on the fetched metrics every step when
    ``train.debug_nan`` is set, so a poisoned batch stops the run and names the
    faulting loss family (the reference's set_detect_anomaly analog,
    engine/train.py:22).
    """
    bad = [k.split("/", 1)[1] for k, v in metrics.items()
           if k.startswith("finite/") and float(v) != 1.0]
    if bad:
        raise FloatingPointError(
            f"non-finite loss detected in families: {', '.join(sorted(bad))}")


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def init_train_state(cfg: HSPoseConfig, model: PoseNet9D, key: jax.Array,
                     tx: optax.GradientTransformation) -> TrainState:
    n = cfg.data.num_points
    dummy_pc = jnp.zeros((2, n, 3), jnp.float32)
    dummy_id = jnp.zeros((2,), jnp.int32)
    k_param, k_pool, k_drop = jax.random.split(key, 3)
    variables = model.init({"params": k_param, "pool": k_pool, "dropout": k_drop},
                           dummy_pc, dummy_id, True)
    params = variables["params"]
    return TrainState(step=jnp.zeros([], jnp.int32), params=params,
                      batch_stats=variables["batch_stats"],
                      opt_state=tx.init(params))


def make_train_step(cfg: HSPoseConfig, model: PoseNet9D,
                    tx: optax.GradientTransformation):
    """Returns jitted (state, batch, key) -> (state, metrics)."""

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], key: jax.Array
                ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        key = jax.random.fold_in(key, state.step)
        k_aug, k_pool, k_drop = jax.random.split(key, 3)
        rngs = {"augment": k_aug, "pool": k_pool, "dropout": k_drop}

        def loss_fn(params):
            return train_forward(cfg, model, params, state.batch_stats, rngs, batch)

        (total, (loss_dicts, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # NaN-skip (engine/train.py:99-103): keep the old state wholesale
        ok = jnp.isfinite(total)

        def pick(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new, old)

        state = TrainState(
            step=state.step + 1,
            params=pick(new_params, state.params),
            batch_stats=pick(new_stats, state.batch_stats),
            opt_state=pick(new_opt_state, state.opt_state),
        )

        metrics = {"total_loss": total, "skipped_nan": (~ok).astype(jnp.float32)}
        for fam, d in loss_dicts.items():
            for k, v in d.items():
                metrics[f"{fam}/{k}"] = v

        if cfg.train.debug_nan:
            # sanitizer mode (reference engine/train.py:22 set_detect_anomaly):
            # per-family finite flags so the faulting loss family is visible in
            # the metrics stream even when jax_debug_nans is unavailable
            for fam, d in loss_dicts.items():
                finite = jnp.all(jnp.stack([jnp.isfinite(v) for v in d.values()]))
                metrics[f"finite/{fam}"] = finite.astype(jnp.float32)
        return state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def build_train_step(cfg: HSPoseConfig, model: PoseNet9D, key: jax.Array):
    """Convenience: optimizer + state + jitted step in one call."""
    total_iters = cfg.train.train_steps * cfg.train.total_epoch // cfg.train.accumulate
    tx = build_optimizer(cfg.optim, total_iters)
    if cfg.train.accumulate > 1:
        # reference semantics: step the optimizer every `accumulate` micro-batches
        # (engine/train.py:105-113; grads averaged rather than summed)
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.train.accumulate)
    state = init_train_state(cfg, model, key, tx)
    return tx, state, make_train_step(cfg, model, tx)
