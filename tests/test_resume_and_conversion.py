"""Resume-from-checkpoint continuation, per-obj filtering, and evaluating straight
from a reference-format torch .pth checkpoint."""

import dataclasses
import os

import numpy as np
import pytest

from hspose_tpu.config import default_config

from test_data_pipeline import nocs_root, data_cfg  # noqa: F401


def test_resume_continues_from_epoch(data_cfg, tmp_path):
    import jax
    from hspose_tpu.engine.train import train

    cfg = default_config()
    cfg = cfg.replace(
        data=dataclasses.replace(data_cfg, num_points=128, num_workers=0),
        train=dataclasses.replace(cfg.train, batch_size=2, total_epoch=1,
                                  train_steps=2, save_every=1, log_every=10,
                                  seed=5, model_save=str(tmp_path / "run")))
    state = train(cfg)
    ckpts = sorted(d for d in os.listdir(cfg.train.model_save)
                   if d.startswith("model_"))
    assert ckpts == ["model_000"]

    # resume: epoch 1..2 continue with restored params/opt-state/seed
    cfg2 = cfg.replace(train=dataclasses.replace(
        cfg.train, total_epoch=2, resume=True,
        resume_model=os.path.join(cfg.train.model_save, "model_000")))
    state2 = train(cfg2)
    assert int(state2.step) == 4  # 2 steps epoch 0 + 2 steps epoch 1
    ckpts = sorted(d for d in os.listdir(cfg.train.model_save)
                   if d.startswith("model_"))
    assert "model_001" in ckpts


def test_per_obj_filtering(data_cfg, rng):
    from hspose_tpu.data.dataset import PoseTrainDataset

    cfg = dataclasses.replace(data_cfg, per_obj="bottle")
    ds = PoseTrainDataset(cfg)
    # fixture: image 0 has [bottle, mug]; image 1 has [bowl, can]
    assert len(ds) == 1
    for seed in range(5):
        s = ds.get_sample(0, np.random.default_rng(seed))
        assert int(s["cat_id"]) == 0  # always the bottle
    # cache file written
    assert os.path.exists(os.path.join(cfg.dataset_dir, "img_list",
                                       "bottle_Real_train_img_list.txt"))


REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not available")
def test_evaluate_from_torch_checkpoint(data_cfg, tmp_path):
    """Save a reference-format torch checkpoint and run our eval harness from it
    through the conversion bridge (incl. the legacy resconv rename)."""
    import sys
    sys.path.insert(0, REF)
    import torch
    import absl.flags as aflags
    if not aflags.FLAGS.is_parsed():
        import config.config  # noqa: F401
        aflags.FLAGS(["test"])
    aflags.FLAGS.train = 0
    from network.fs_net_repo.PoseNet9D import PoseNet9D as TorchPoseNet

    torch.manual_seed(1)
    tmodel = TorchPoseNet().eval()
    sd = {f"posenet.{k}": v for k, v in tmodel.state_dict().items()}
    # emulate a legacy checkpoint: STE_layer keys stored under the old name
    sd = {k.replace("STE_layer", "resconv"): v for k, v in sd.items()}
    ckpt_path = str(tmp_path / "legacy.pth")
    torch.save({"posenet_state_dict": sd, "seed": 1, "epoch": 0}, ckpt_path)

    from hspose_tpu.evaluation.evaluate import evaluate

    cfg = default_config()
    cfg = cfg.replace(
        data=dataclasses.replace(data_cfg, num_points=128, num_workers=1),
        train=dataclasses.replace(cfg.train, resume_model=ckpt_path,
                                  model_save=str(tmp_path / "out")),
        eval=dataclasses.replace(cfg.eval, eval_batch=4, eval_seed=2))
    results = evaluate(cfg)
    assert "IoU25" in results


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not available")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_torch_roundtrip_bit_identical(seed, tmp_path):
    """torch→JAX→torch round-trip fuzz on randomized weights (VERDICT r2 #7):
    every mapped key must come back bit-identical, and the reconstructed key set
    must equal the original's (minus BN num_batches_tracked, which flax does not
    model) — this guards both directions of the bridge against silent
    key-mapping drift (incl. the legacy resconv→STE_layer rename)."""
    import sys
    sys.path.insert(0, REF)
    import torch
    import absl.flags as aflags
    if not aflags.FLAGS.is_parsed():
        import config.config  # noqa: F401
        aflags.FLAGS(["test"])
    aflags.FLAGS.train = 1  # include the train-only heads in the fuzz
    from network.fs_net_repo.PoseNet9D import PoseNet9D as TorchPoseNet

    torch.manual_seed(seed)
    tmodel = TorchPoseNet().train()
    # randomize BN running stats too (fresh modules have trivial 0/1 stats)
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_()
                m.running_var.uniform_(0.5, 2.0)
    sd = {f"posenet.{k}": v for k, v in tmodel.state_dict().items()}
    if seed == 2:  # legacy naming variant
        sd = {k.replace("STE_layer", "resconv"): v for k, v in sd.items()}

    from hspose_tpu.utils.torch_convert import (
        convert_to_torch_state_dict,
        convert_torch_state_dict,
    )

    params, stats = convert_torch_state_dict(sd)
    back = convert_to_torch_state_dict(params, stats)

    expect = {k.replace("resconv", "STE_layer"): v for k, v in sd.items()
              if "num_batches_tracked" not in k}
    assert set(back) == set(expect), (
        sorted(set(back) ^ set(expect)))
    for k, v in expect.items():
        np.testing.assert_array_equal(back[k], v.numpy(), err_msg=k)
