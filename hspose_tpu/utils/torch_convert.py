"""torch→JAX checkpoint bridge.

Converts a reference HS-Pose checkpoint (``posenet_state_dict`` of
``torch.save({...})``, engine/train.py:120-129) into our flax param/batch-stat
trees, including the legacy key surgery of ``evaluation/evaluate.py:63-73``
(``resconv`` → ``STE_layer`` rename; train-only heads optional).

Layout rules:
* torch Conv1d(k=1) weight (out, in, 1)  → flax Dense kernel (in, out)
* torch Linear-like raw params (HS ``weights``/``directions``/``bias``) keep layout
* BatchNorm weight/bias → scale/bias;  running_mean/var → batch_stats mean/var
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv_kernel(w) -> np.ndarray:
    w = np.asarray(w)
    assert w.ndim == 3 and w.shape[-1] == 1, w.shape
    return w[..., 0].T.copy()  # (out, in) -> (in, out)


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value, np.float32)


def convert_torch_state_dict(state_dict: Dict[str, "np.ndarray"]
                             ) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats) nested dicts mirroring our flax tree.

    Accepts raw torch tensors or numpy arrays; keys with the ``posenet.`` prefix of
    the reference HSPose wrapper.
    """
    sd = {}
    for k, v in state_dict.items():
        if "resconv" in k:  # legacy rename (evaluation/evaluate.py:71-72)
            k = k.replace("resconv", "STE_layer")
        sd[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params: Dict = {}
    stats: Dict = {}

    def bn(src_prefix, dst_path):
        if src_prefix + ".weight" not in sd:
            return
        _set(params, dst_path + ("scale",), sd[src_prefix + ".weight"])
        _set(params, dst_path + ("bias",), sd[src_prefix + ".bias"])
        _set(stats, dst_path + ("mean",), sd[src_prefix + ".running_mean"])
        _set(stats, dst_path + ("var",), sd[src_prefix + ".running_var"])

    def dense(src_prefix, dst_path, bias=True):
        if src_prefix + ".weight" not in sd:
            return False
        _set(params, dst_path + ("kernel",), _conv_kernel(sd[src_prefix + ".weight"]))
        if bias and src_prefix + ".bias" in sd:
            _set(params, dst_path + ("bias",), sd[src_prefix + ".bias"])
        return True

    fr_src = "posenet.face_recon"
    fr = ("face_recon",)

    # HS layers
    _set(params, fr + ("conv_0", "directions"), sd[f"{fr_src}.conv_0.directions"])
    dense(f"{fr_src}.conv_0.STE_layer", fr + ("conv_0", "STE_layer"), bias=False)
    dense(f"{fr_src}.conv_0.conv2", fr + ("conv_0", "conv2"), bias=False)
    for name in ["conv_1", "conv_2", "conv_3", "conv_4"]:
        _set(params, fr + (name, "weights"), sd[f"{fr_src}.{name}.weights"])
        _set(params, fr + (name, "bias"), sd[f"{fr_src}.{name}.bias"])
        _set(params, fr + (name, "directions"), sd[f"{fr_src}.{name}.directions"])
        dense(f"{fr_src}.{name}.STE_layer", fr + (name, "STE_layer"), bias=False)
        dense(f"{fr_src}.{name}.conv2", fr + (name, "conv2"), bias=False)

    for i in (1, 2, 3):
        bn(f"{fr_src}.bn{i}", fr + (f"bn{i}",))

    # train-only heads (may be pruned in eval checkpoints, evaluate.py:63-67)
    head_maps = {
        "conv1d_block": {"0": "dense_0", "1": "bn_0", "3": "dense_1", "4": "bn_1",
                         "6": "dense_out", "7": "bn_out"},
        "recon_head": {"0": "dense_0", "1": "bn_0", "3": "dense_out"},
        "face_head": {"0": "dense_0", "1": "bn_0", "3": "dense_1", "4": "bn_1",
                      "6": "dense_2", "7": "bn_2", "9": "dense_out"},
    }
    for head, idx_map in head_maps.items():
        for idx, dst in idx_map.items():
            src = f"{fr_src}.{head}.{idx}"
            if dst.startswith("dense"):
                dense(src, fr + (head, dst))
            else:
                bn(src, fr + (head, dst))

    # pose heads
    for src_head, dst_head in [("rot_green", "rot_green"), ("rot_red", "rot_red"),
                               ("ts", "ts")]:
        base = f"posenet.{src_head}"
        for i in (1, 2, 3, 4):
            dense(f"{base}.conv{i}", (dst_head, "vec", f"conv{i}"))
        for i in (1, 2, 3):
            bn(f"{base}.bn{i}", (dst_head, "vec", f"bn{i}"))

    return params, stats


def convert_to_torch_state_dict(params: Dict, stats: Dict) -> Dict[str, np.ndarray]:
    """Inverse bridge: flax (params, batch_stats) trees → reference-format torch
    state dict (``posenet.`` prefix, modern ``STE_layer`` naming).

    Exact inverse of :func:`convert_torch_state_dict` for every key that bridge
    maps (torch BN ``num_batches_tracked`` buffers are not modelled on the flax
    side and are not emitted).  Exists so the round-trip
    torch→JAX→torch can be fuzz-tested — a silent key-mapping drift in either
    direction breaks bit-identity (tests/test_resume_and_conversion.py).
    """
    sd: Dict[str, np.ndarray] = {}

    def get(tree, path):
        node = tree
        for p in path:
            if node is None or p not in node:
                return None
            node = node[p]
        return np.asarray(node, np.float32)

    def put_dense(dst_prefix, src_path, bias=True):
        kernel = get(params, src_path + ("kernel",))
        if kernel is None:
            return
        sd[dst_prefix + ".weight"] = kernel.T[..., None].copy()  # (in,out)->(out,in,1)
        if bias:
            b = get(params, src_path + ("bias",))
            if b is not None:
                sd[dst_prefix + ".bias"] = b

    def put_bn(dst_prefix, src_path):
        scale = get(params, src_path + ("scale",))
        if scale is None:
            return
        sd[dst_prefix + ".weight"] = scale
        sd[dst_prefix + ".bias"] = get(params, src_path + ("bias",))
        sd[dst_prefix + ".running_mean"] = get(stats, src_path + ("mean",))
        sd[dst_prefix + ".running_var"] = get(stats, src_path + ("var",))

    fr_src = "posenet.face_recon"
    fr = ("face_recon",)

    sd[f"{fr_src}.conv_0.directions"] = get(params, fr + ("conv_0", "directions"))
    put_dense(f"{fr_src}.conv_0.STE_layer", fr + ("conv_0", "STE_layer"), bias=False)
    put_dense(f"{fr_src}.conv_0.conv2", fr + ("conv_0", "conv2"), bias=False)
    for name in ["conv_1", "conv_2", "conv_3", "conv_4"]:
        for leaf in ("weights", "bias", "directions"):
            sd[f"{fr_src}.{name}.{leaf}"] = get(params, fr + (name, leaf))
        put_dense(f"{fr_src}.{name}.STE_layer", fr + (name, "STE_layer"), bias=False)
        put_dense(f"{fr_src}.{name}.conv2", fr + (name, "conv2"), bias=False)

    for i in (1, 2, 3):
        put_bn(f"{fr_src}.bn{i}", fr + (f"bn{i}",))

    head_maps = {
        "conv1d_block": {"0": "dense_0", "1": "bn_0", "3": "dense_1", "4": "bn_1",
                         "6": "dense_out", "7": "bn_out"},
        "recon_head": {"0": "dense_0", "1": "bn_0", "3": "dense_out"},
        "face_head": {"0": "dense_0", "1": "bn_0", "3": "dense_1", "4": "bn_1",
                      "6": "dense_2", "7": "bn_2", "9": "dense_out"},
    }
    for head, idx_map in head_maps.items():
        for idx, src in idx_map.items():
            dst = f"{fr_src}.{head}.{idx}"
            if src.startswith("dense"):
                put_dense(dst, fr + (head, src))
            else:
                put_bn(dst, fr + (head, src))

    for src_head, dst_head in [("rot_green", "rot_green"), ("rot_red", "rot_red"),
                               ("ts", "ts")]:
        base = f"posenet.{dst_head}"
        for i in (1, 2, 3, 4):
            put_dense(f"{base}.conv{i}", (src_head, "vec", f"conv{i}"))
        for i in (1, 2, 3):
            put_bn(f"{base}.bn{i}", (src_head, "vec", f"bn{i}"))

    return {k: v for k, v in sd.items() if v is not None}


def merge_with_template(converted: Dict, template: Dict) -> Dict:
    """Fill keys missing from the checkpoint (e.g. pruned train heads) with the
    template's (freshly initialized) values; verify shapes elsewhere."""
    out = {}
    for k, tv in template.items():
        if isinstance(tv, dict):
            out[k] = merge_with_template(converted.get(k, {}), tv)
        else:
            cv = converted.get(k)
            if cv is None:
                out[k] = tv
            else:
                assert np.shape(cv) == np.shape(tv), (k, np.shape(cv), np.shape(tv))
                out[k] = cv
    return out
