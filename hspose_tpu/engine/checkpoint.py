"""Orbax checkpointing of the full training state.

Reference equivalent: ``torch.save`` of {seed, epoch, model, scheduler, optimizer}
every ``save_every`` epochs (engine/train.py:120-129) and the resume path
(engine/train.py:26-34,53-58).  We checkpoint {params, batch_stats, opt_state,
step} plus {epoch, seed} metadata — the schedule needs no state because it is a
pure function of the step.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from hspose_tpu.engine.train_step import TrainState


def save_checkpoint(path: str, state: TrainState, epoch: int, seed: int) -> str:
    path = os.path.abspath(path)
    ckpt_dir = os.path.join(path, f"model_{epoch:03d}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(ckpt_dir, "state"), jax.device_get(state), force=True)
    with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
        json.dump({"epoch": epoch, "seed": seed}, f)
    return ckpt_dir


def restore_checkpoint(ckpt_dir: str, abstract_state: TrainState
                       ) -> Tuple[TrainState, int, int]:
    """Returns (state, epoch, seed)."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(ckpt_dir, "state"), abstract_state)
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = json.load(f)
    return state, meta["epoch"], meta["seed"]


def latest_checkpoint(path: str) -> Optional[str]:
    if not os.path.isdir(path):
        return None
    cands = sorted(d for d in os.listdir(path) if d.startswith("model_"))
    return os.path.join(path, cands[-1]) if cands else None
