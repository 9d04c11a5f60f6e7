"""Training entry point.

Equivalent of ``python -m engine.train`` (engine/train.py:25-165): seed resolution
(incl. resume-from-checkpoint seed), model/optimizer/schedule build, resume restore,
the epoch × step loop with NaN-skip and periodic logging, checkpoints every
``save_every`` epochs.  The whole inner loop is one jitted ``train_step`` and the
batch is sharded over the device mesh (data parallelism, SURVEY.md §2.2).

Run:  python -m hspose_tpu.engine.train data.dataset_dir=/path/NOCS \
          train.batch_size=16 train.seed=1677330429
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import asdict

import jax
import numpy as np

import dataclasses

from hspose_tpu.config import HSPoseConfig, parse_overrides
from hspose_tpu.engine.checkpoint import restore_checkpoint, save_checkpoint
from hspose_tpu.engine.train_step import build_train_step
from hspose_tpu.models.hspose import build_model
from hspose_tpu.parallel.mesh import make_mesh, shard_batch, shard_state
from hspose_tpu.utils.logging import MetricWriter, setup_logger


def train(cfg: HSPoseConfig):
    logger = setup_logger("train_log", os.path.join(cfg.train.model_save, "log.txt"))
    logger.info("config: %s", asdict(cfg))

    seed = cfg.train.seed if cfg.train.seed != -1 else int(time.time())

    # validate the mesh request BEFORE any expensive work (model construction,
    # checkpoint restore, remote compiles) so an invalid config fails in
    # milliseconds, not minutes
    n_dev = len(jax.devices())
    mp = max(cfg.parallel.mp, 1)
    if mp > n_dev:
        raise ValueError(
            f"parallel.mp={mp} exceeds the {n_dev} available device(s)")
    if max(cfg.parallel.sp, 1) > 1:
        raise ValueError(
            "parallel.sp (point-axis sharding) is eval-only; training uses a "
            "(dp, mp) mesh")

    if cfg.train.debug_nan:
        # sanitizer mode: XLA re-runs the faulting computation eagerly and raises
        # FloatingPointError at the first NaN-producing primitive — the analog of
        # the reference's torch.autograd.set_detect_anomaly(True)
        # (engine/train.py:22)
        jax.config.update("jax_debug_nans", True)
        logger.info("debug_nan: jax_debug_nans enabled")

    model = build_model(cfg)
    tx, state, train_step = build_train_step(cfg, model, jax.random.key(seed))

    s_epoch = 0
    if cfg.train.resume and cfg.train.resume_model:
        state, last_epoch, seed = restore_checkpoint(cfg.train.resume_model, state)
        s_epoch = last_epoch + 1
        logger.info("resumed from %s at epoch %d (seed %d)",
                    cfg.train.resume_model, s_epoch, seed)

    # the data axis must divide the batch: use the largest qualifying mesh
    dp_req = cfg.parallel.dp if cfg.parallel.dp > 0 else n_dev // mp
    dp = dp_req
    while cfg.train.batch_size % dp != 0:
        dp -= 1
    if dp < dp_req:
        logger.warning(
            "data axis shrunk dp=%d -> dp=%d (batch %d not divisible by %d)",
            dp_req, dp, cfg.train.batch_size, dp_req)
    if dp * mp < n_dev:
        logger.warning(
            "mesh dp=%d x mp=%d uses %d of the %d available devices; the rest "
            "sit idle", dp, mp, dp * mp, n_dev)
    mesh = make_mesh(dataclasses.replace(cfg.parallel, dp=dp))
    logger.info("device mesh: %s", mesh)
    # place params/opt state on the mesh: replicated for pure DP, Dense output
    # channels sharded over the mp axis for a 2-D mesh (restored checkpoints
    # arrive committed to a single device, which conflicts with mesh-sharded
    # batches — hence the host round-trip)
    state = shard_state(mesh, jax.device_get(state))

    from hspose_tpu.data.dataset import (
        PoseTrainDataset,
        estimated_step_rate,
        make_worker_pool,
        resolve_num_workers,
    )

    dataset = PoseTrainDataset(cfg.data, mode="train",
                               sample_mode=cfg.data.sample_mode)
    logger.info("%d images found, %d models loaded", len(dataset),
                len(dataset.models))
    # loader worker processes (the reference's DataLoader workers,
    # engine/train.py:65-69) — one persistent pool for the whole run; threads
    # are GIL-bound below single-thread throughput on this pipeline.
    # num_workers=-1 auto-sizes from host cores and warns when the pool's
    # projected throughput would starve the measured device step rate.
    num_workers = resolve_num_workers(
        cfg.data.num_workers,
        estimated_step_rate(cfg.model.compute_dtype, dp), logger)
    logger.info("loader workers: %d", num_workers)
    pool = (make_worker_pool(cfg.data, "train", dataset.sample_mode,
                             num_workers)
            if num_workers > 0 else None)

    writer = MetricWriter(cfg.train.model_save)
    data_key = jax.random.key(seed)

    try:
        state = _train_loop(cfg, logger, writer, mesh, dataset, pool, state,
                            train_step, data_key, seed, s_epoch, num_workers)
    finally:
        # terminate the worker pool on error paths too (a debug_nan raise or a
        # checkpoint failure must not leak spawned processes)
        writer.close()
        if pool is not None:
            pool.terminate()
    return state


def _train_loop(cfg, logger, writer, mesh, dataset, pool, state, train_step,
                data_key, seed, s_epoch, num_workers):
    from hspose_tpu.data.dataset import train_batches

    for epoch in range(s_epoch, cfg.train.total_epoch):
        t0 = time.time()
        batches = train_batches(dataset, cfg.train.batch_size, cfg.train.train_steps,
                                seed=seed + epoch * 997, num_workers=num_workers,
                                prefetch=cfg.data.prefetch, pool=pool)
        profile_dir = os.environ.get("HSPOSE_PROFILE_DIR")
        for i, batch in enumerate(batches):
            # on-demand device tracing (SURVEY §5.1): steps 10-14 of each epoch
            if profile_dir and i == 10 and epoch == s_epoch:
                jax.profiler.start_trace(profile_dir)
            batch = shard_batch(mesh, batch)
            # per-step key at the loop level; the step additionally folds in
            # state.step, so per-step uniqueness survives either side being
            # reordered (deliberate redundancy, not an accident)
            step_key = jax.random.fold_in(data_key, epoch * cfg.train.train_steps + i)
            state, metrics = train_step(state, batch, step_key)
            if cfg.train.debug_nan:
                from hspose_tpu.engine.train_step import check_finite_metrics

                check_finite_metrics(jax.device_get(metrics))
            if profile_dir and i == 14 and epoch == s_epoch:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
            step = int(epoch) * cfg.train.train_steps + i
            if i % cfg.train.log_every == 0:
                host_metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
                writer.write(step, host_metrics)
                logger.info("epoch %d step %d total_loss %.4f", epoch, i,
                            host_metrics["total_loss"])

        logger.info("epoch %d done in %.1fs", epoch, time.time() - t0)
        if (epoch + 1) % cfg.train.save_every == 0 or (epoch + 1) == cfg.train.total_epoch:
            path = save_checkpoint(cfg.train.model_save, jax.device_get(state),
                                   epoch, seed)
            logger.info("checkpoint saved: %s", path)
    return state


def main(argv=None):
    from hspose_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    cfg = parse_overrides(sys.argv[1:] if argv is None else argv)
    os.makedirs(cfg.train.model_save, exist_ok=True)
    train(cfg)


if __name__ == "__main__":
    main()
