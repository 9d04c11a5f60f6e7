"""Executed parity against the reference optimizer/scheduler.

Unlike tests/test_optimizer.py (which re-derives the update math), these tests
RUN the actual reference implementations — ``ranger2020.Ranger`` and
``lr_scheduler.flat_and_anneal_lr_scheduler`` from /root/reference — and
compare parameter / lr trajectories step by step against our optax chain.
A transcription error on either side cannot pass here.

Covers the hard parts SURVEY §7 names: the N_sma=5 rectified/unrectified
switch (crossed at t≈5 with beta2=0.999), the lookahead sync every k=6 steps,
and GC over both torch-layout and flax-layout (transposed "kernel") params.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

if os.path.isdir(REF):
    sys.path.insert(0, REF)
    import torch  # noqa: E402


def _optax_ranger(lr):
    """GC → rectified RAdam → lr → lookahead, exactly the Ranger composition
    (no clip: torch Ranger has none; the train loop owns clipping)."""
    import optax

    from hspose_tpu.engine.optimizer import (
        gradient_centralization,
        lookahead,
        radam_rectified,
    )

    return optax.chain(
        gradient_centralization(),
        radam_rectified(0.95, 0.999, 1e-5, 5, 0.0),
        optax.scale_by_learning_rate(lr),
        lookahead(6, 0.5),
    )


class TestRangerExecutedParity:
    def test_30_step_trajectory_matches_reference(self, rng):
        """30 Ranger steps with a fixed grad stream: parameter trajectories
        match the executed ranger2020.Ranger to f32 tolerance, through the
        rectification switch (t≈5) and five lookahead syncs (t=6,12,...)."""
        import jax.numpy as jnp
        from tools.torch_utils.solver.ranger2020 import Ranger

        shapes = {"weights": (8, 4), "directions": (3, 14), "bias": (16,)}
        kernel_shape = (6, 5)  # flax layout (in, out); torch side runs (out, in)
        init = {k: rng.normal(size=s).astype(np.float32)
                for k, s in shapes.items()}
        kernel_init = rng.normal(size=kernel_shape).astype(np.float32)
        n_steps = 30
        grads = [{k: rng.normal(size=s).astype(np.float32)
                  for k, s in shapes.items()} for _ in range(n_steps)]
        kernel_grads = [rng.normal(size=kernel_shape).astype(np.float32)
                        for _ in range(n_steps)]
        lr = 1e-2

        # --- reference: the real Ranger class --------------------------------
        t_params = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in init.items()}
        t_params["kernel"] = torch.nn.Parameter(torch.tensor(kernel_init.T.copy()))
        opt = Ranger(list(t_params.values()), lr=lr)
        ref_traj = []
        for t in range(n_steps):
            for k, p in t_params.items():
                g = kernel_grads[t].T.copy() if k == "kernel" else grads[t][k]
                p.grad = torch.tensor(g)
            opt.step()
            ref_traj.append({k: p.detach().numpy().copy()
                             for k, p in t_params.items()})

        # --- ours: the optax chain on identical params/grads ------------------
        j_params = {k: jnp.asarray(v) for k, v in init.items()}
        j_params["kernel"] = jnp.asarray(kernel_init)
        tx = _optax_ranger(lr)
        state = tx.init(j_params)
        import optax

        for t in range(n_steps):
            g = {k: jnp.asarray(v) for k, v in grads[t].items()}
            g["kernel"] = jnp.asarray(kernel_grads[t])
            updates, state = tx.update(g, state, j_params)
            j_params = optax.apply_updates(j_params, updates)

            ref = ref_traj[t]
            for k in j_params:
                ours = np.asarray(j_params[k])
                theirs = ref[k].T if k == "kernel" else ref[k]
                np.testing.assert_allclose(
                    ours, theirs, rtol=5e-5, atol=5e-6,
                    err_msg=f"param {k} diverged at step {t + 1}")

    def test_rectification_switch_step_matches(self, rng):
        """Both implementations flip from the plain-momentum branch to the
        adaptive branch at the same step (N_sma crosses 5 between t=5 and 6)."""
        from tools.torch_utils.solver.ranger2020 import Ranger

        # constant gradient: branch changes show up as update-magnitude breaks
        g = np.ones((4, 4), np.float32)
        p = torch.nn.Parameter(torch.zeros(4, 4))
        opt = Ranger([p], lr=1.0, use_gc=False)
        ref_updates = []
        prev = p.detach().numpy().copy()
        for t in range(8):
            p.grad = torch.tensor(g)
            opt.step()
            cur = p.detach().numpy().copy()
            ref_updates.append(float(np.abs(cur - prev).mean()))
            prev = cur

        import jax.numpy as jnp
        import optax

        from hspose_tpu.engine.optimizer import lookahead, radam_rectified

        tx = optax.chain(radam_rectified(0.95, 0.999, 1e-5, 5, 0.0),
                         optax.scale_by_learning_rate(1.0), lookahead(6, 0.5))
        jp = {"w": jnp.zeros((4, 4))}
        state = tx.init(jp)
        ours_updates = []
        prev_j = np.zeros((4, 4), np.float32)
        for t in range(8):
            updates, state = tx.update({"w": jnp.asarray(g)}, state, jp)
            jp = optax.apply_updates(jp, updates)
            cur = np.asarray(jp["w"])
            ours_updates.append(float(np.abs(cur - prev_j).mean()))
            prev_j = cur

        # per-step update magnitudes differ 30x between branches, so rtol 2e-4
        # (f32 rounding headroom) still pins the branch-switch step exactly
        np.testing.assert_allclose(ours_updates, ref_updates, rtol=2e-4,
                                   atol=1e-6)


class TestScheduleExecutedParity:
    def test_flat_and_anneal_executed_lr_curve(self):
        """Step the reference LambdaLR through a full schedule and compare the
        realized lr at every iteration with build_schedule's values."""
        from tools.torch_utils.solver.lr_scheduler import (
            flat_and_anneal_lr_scheduler,
        )

        from hspose_tpu.config import OptimConfig
        from hspose_tpu.engine.schedule import build_schedule

        total = 3000
        base_lr = 1e-4
        dummy = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
        sched = flat_and_anneal_lr_scheduler(
            dummy, total_iters=total, warmup_iters=1000, warmup_factor=1e-3,
            warmup_method="linear", anneal_point=0.72, anneal_method="cosine",
            target_lr_factor=0, poly_power=1.0, step_gamma=0.1)

        cfg = OptimConfig(lr=base_lr, lr_pose=1.0, warmup_iters=1000,
                          warmup_factor=1e-3, warmup_method="linear",
                          anneal_point=0.72, anneal_method="cosine",
                          lr_scheduler_name="flat_and_anneal")
        ours = build_schedule(cfg, total)

        for it in range(total):
            ref_lr = dummy.param_groups[0]["lr"]
            # rtol 5e-6: our factors evaluate in f32, the LambdaLR in f64.
            # atol 1e-10 (= base_lr * 1e-6) absorbs the 1+cos cancellation at
            # the extreme anneal tail where lr underflows toward 0
            np.testing.assert_allclose(float(ours(it)), ref_lr, rtol=5e-6,
                                       atol=1e-10,
                                       err_msg=f"lr diverged at iter {it}")
            sched.step()

    @pytest.mark.parametrize("method", ["linear", "poly", "exp"])
    def test_other_anneal_methods_executed(self, method):
        from tools.torch_utils.solver.lr_scheduler import (
            flat_and_anneal_lr_scheduler,
        )

        from hspose_tpu.config import OptimConfig
        from hspose_tpu.engine.schedule import build_schedule

        total = 500
        dummy = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
        sched = flat_and_anneal_lr_scheduler(
            dummy, total_iters=total, warmup_iters=100, warmup_factor=1e-3,
            anneal_point=0.5, anneal_method=method, poly_power=2.0)
        cfg = OptimConfig(lr=1.0, lr_pose=1.0, warmup_iters=100,
                          warmup_factor=1e-3, anneal_point=0.5,
                          anneal_method=method, poly_power=2.0,
                          lr_scheduler_name="flat_and_anneal")
        ours = build_schedule(cfg, total)
        for it in range(total):
            np.testing.assert_allclose(float(ours(it)),
                                       dummy.param_groups[0]["lr"], rtol=5e-6,
                                       atol=1e-12,
                                       err_msg=f"{method} diverged at iter {it}")
            sched.step()
