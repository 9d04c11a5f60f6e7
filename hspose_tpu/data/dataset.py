"""NOCS train dataset (host pipeline).

Equivalent of ``datasets/load_data.PoseDataset`` (:21-299): image-list aggregation
over CAMERA/Real sources, per-category filtering, mug-handle visibility table,
sampling-with-replacement epochs (epoch = train_steps × batch_size draws), per-sample
crop/mask/label processing, and the 12-tensor sample dict.  Differences by design:

* explicit ``np.random.Generator`` everywhere (no global RNG);
* the depth→point-cloud back-projection + 1028-point sampling can run **on device**
  (``sample_mode='device'`` ships the 256² crops; ``'host'`` reproduces the
  reference's host-side path bit-for-bit in numpy);
* batching runs in worker **processes** (like the reference's 20 DataLoader
  workers, engine/train.py:65-69) via :func:`make_worker_pool` — measured:
  Python threads are GIL-bound *below* single-thread throughput on this
  pipeline — with a thread/sync fallback.  Batches derive from (seed, step)
  only, so every mode yields the identical stream.
"""

from __future__ import annotations

import multiprocessing
import os
import pickle
import queue
import threading
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional

import cv2
import numpy as np

from hspose_tpu.config import DataConfig
from hspose_tpu.data import image_utils as iu
from hspose_tpu.data import native_preproc as npp
from hspose_tpu.geometry import symmetry as sym_tab

CAMERA_INTRINSICS = np.array([[577.5, 0, 319.5], [0, 577.5, 239.5], [0, 0, 1]],
                             dtype=np.float32)
REAL_INTRINSICS = np.array([[591.0125, 0, 322.525], [0, 590.16775, 244.11084],
                            [0, 0, 1]], dtype=np.float32)


@dataclass
class SampleLists:
    img_list: List[str]
    subset_len: List[int]


def _read_img_lists(data_dir: str, source: str, mode: str) -> SampleLists:
    """Aggregate the per-source image lists (load_data.py:40-71)."""
    paths = {
        ("train",): {
            "CAMERA": ["CAMERA/train_list.txt"],
            "Real": ["Real/train_list.txt"],
            "CAMERA+Real": ["CAMERA/train_list.txt", "Real/train_list.txt"],
        },
        ("test",): {
            "CAMERA": ["CAMERA/val_list.txt"],
            "Real": ["Real/test_list.txt"],
            "CAMERA+Real": ["Real/test_list.txt"],
        },
    }[(mode,)][source]
    img_list: List[str] = []
    subset_len = []
    for p in paths:
        root = p.split("/")[0]
        with open(os.path.join(data_dir, p)) as f:
            img_list += [os.path.join(root, line.rstrip("\n")) for line in f]
        subset_len.append(len(img_list))
    if len(subset_len) == 2:
        subset_len = [subset_len[0], subset_len[1] - subset_len[0]]
    return SampleLists(img_list, subset_len)


def _model_files(source: str, mode: str) -> List[str]:
    return {
        ("train", "CAMERA"): ["obj_models/camera_train.pkl"],
        ("train", "Real"): ["obj_models/real_train.pkl"],
        ("train", "CAMERA+Real"): ["obj_models/camera_train.pkl",
                                   "obj_models/real_train.pkl"],
        ("test", "CAMERA"): ["obj_models/camera_val.pkl"],
        ("test", "Real"): ["obj_models/real_test.pkl"],
        ("test", "CAMERA+Real"): ["obj_models/real_test.pkl"],
    }[(mode, source)]


class PoseTrainDataset:
    """Training-sample factory over the NOCS directory tree."""

    def __init__(self, cfg: DataConfig, mode: str = "train",
                 sample_mode: str = "host"):
        assert cfg.dataset in ("CAMERA", "Real", "CAMERA+Real")
        assert sample_mode in ("host", "device")
        self.cfg = cfg
        self.mode = mode
        self.sample_mode = sample_mode
        self.data_dir = cfg.dataset_dir

        lists = _read_img_lists(self.data_dir, cfg.dataset, mode)
        self.img_list = lists.img_list
        self.subset_len = lists.subset_len
        self.length = len(self.img_list)

        self.models: Dict[str, np.ndarray] = {}
        for mf in _model_files(cfg.dataset, mode):
            with open(os.path.join(self.data_dir, mf), "rb") as f:
                self.models.update(pickle.load(f))

        self.id2cat_name = ({str(i + 1): n for i, n in enumerate(sym_tab.CAT_NAMES)}
                            if cfg.dataset != "CAMERA" else
                            {str(i + 1): sym_tab.SHAPENET_SYNSET[n]
                             for i, n in enumerate(sym_tab.CAT_NAMES)})

        mug_handle_path = os.path.join(self.data_dir, "Real/train/mug_handle.pkl")
        self.mug_sym = {}
        if os.path.exists(mug_handle_path):
            with open(mug_handle_path, "rb") as f:
                self.mug_sym = pickle.load(f)

        self.per_obj = cfg.per_obj
        self.per_obj_id = sym_tab.CAT_NAME2ID.get(cfg.per_obj)
        if self.per_obj_id is not None:
            self.img_list = self._filter_per_obj(self.img_list)
            self.length = len(self.img_list)

    def _filter_per_obj(self, img_list):
        """Keep only images containing the target category, with an on-disk cache
        (load_data.py:86-128)."""
        cache_dir = os.path.join(self.data_dir, "img_list")
        os.makedirs(cache_dir, exist_ok=True)
        cache = os.path.join(
            cache_dir, f"{self.per_obj}_{self.cfg.dataset}_{self.mode}_img_list.txt")
        if os.path.exists(cache):
            with open(cache) as f:
                return [line.rstrip("\n") for line in f]
        kept = []
        for rel in img_list:
            try:
                with open(os.path.join(self.data_dir, rel + "_label.pkl"), "rb") as f:
                    gts = pickle.load(f)
                if self.per_obj_id in gts["class_ids"]:
                    kept.append(rel)
            except Exception:
                continue
        with open(cache, "w") as f:
            f.writelines(k + "\n" for k in kept)
        return kept

    def __len__(self):
        return self.length

    def sample_index(self, rng: np.random.Generator) -> int:
        """Replacement sampling with the 75/25 CAMERA/Real mix (load_data.py:158-166)."""
        if self.cfg.dataset == "CAMERA+Real" and self.mode == "train":
            if rng.random() < 0.75:
                return int(rng.integers(0, self.subset_len[0]))
            return self.subset_len[0] + int(rng.integers(0, self.subset_len[1]))
        return int(rng.integers(0, self.length))

    def get_sample(self, index: int, rng: np.random.Generator,
                   _depth: int = 0) -> Optional[Dict[str, np.ndarray]]:
        """One training sample; walks forward on unreadable/degenerate data
        (load_data.py:169-277).  Returns None after too many consecutive failures."""
        if _depth > 32:
            return None
        img_path = os.path.join(self.data_dir, self.img_list[index])
        nxt = (index + 1) % self.length

        def retry():
            return self.get_sample(nxt, rng, _depth + 1)

        try:
            with open(img_path + "_label.pkl", "rb") as f:
                gts = pickle.load(f)
        except Exception:
            return retry()

        is_camera = "CAMERA" in img_path.split(os.sep)
        cam_k = CAMERA_INTRINSICS if is_camera else REAL_INTRINSICS

        if self.per_obj_id is not None:
            idx = list(gts["class_ids"]).index(self.per_obj_id)
        else:
            idx = int(rng.integers(0, len(gts["instance_ids"])))

        if gts["class_ids"][idx] == 6 and not is_camera and self.mug_sym:
            parts = img_path.split(os.sep)
            scene_label = parts[-2] + "_res"
            mug_handle = self.mug_sym.get(scene_label, {}).get(int(parts[-1]), 1)
        else:
            mug_handle = 1

        # the color PNG contributes only its existence + shape (the reference
        # decodes it just for im_H/im_W, load_data.py:219-227) — skip the
        # ~3 ms/sample pixel decode and take the shape from the mask.  NOCS
        # renders color/depth/mask co-registered at the same resolution, so
        # the mask shape IS im_H/im_W.  Integrity is still enforced to the
        # reference's accept/reject semantics (on BOTH the native and cv2
        # branches): png_color_valid walks every chunk and CRC-checks the
        # critical ones, so a truncated or bit-corrupted color file retry-
        # walks to the next index exactly like the reference's failed decode.
        if iu.png_color_valid(img_path + "_color.png") is None:
            return retry()
        # native fast path: defer the pixel decode to the fused C++ sample op
        # (bit-exact vs the cv2 path below — tests/test_native_preproc.py);
        # only the mask header is read here for im_h/im_w
        depth = mask = None
        dims = (npp.png_dims(img_path + "_mask.png")
                if self.cfg.native_preproc else None)
        if dims is not None:
            im_h, im_w = dims
        else:
            try:
                depth = iu.load_depth(img_path + "_depth.png")
            except Exception:
                return retry()
            mask = cv2.imread(img_path + "_mask.png")
            if mask is None:
                return retry()
            mask = mask[:, :, 2]
            im_h, im_w = mask.shape[:2]

        inst_id = gts["instance_ids"][idx]
        rmin, rmax, cmin, cmax = iu.get_bbox(gts["bboxes"][idx], im_h, im_w)
        bbox_xyxy = np.array([cmin, rmin, cmax, rmax])
        center, scale = iu.aug_bbox_dzi(rng, bbox_xyxy, im_h, im_w,
                                        self.cfg.dzi_pad_scale, self.cfg.dzi_scale_ratio,
                                        self.cfg.dzi_shift_ratio, self.cfg.dzi_type)

        s = self.cfg.img_size
        native = (npp.train_sample(img_path + "_depth.png", img_path + "_mask.png",
                                   int(inst_id), center, scale, s)
                  if dims is not None else None)
        if native is not None:
            roi_depth, roi_mask, roi_coord, n_depth, n_both = native
            if n_depth <= 1 or n_both <= 1:
                return retry()
        else:
            if depth is None:  # native decode declined — cv2 owns the retry walk
                try:
                    depth = iu.load_depth(img_path + "_depth.png")
                except Exception:
                    return retry()
                mask = cv2.imread(img_path + "_mask.png")
                if mask is None:
                    return retry()
                mask = mask[:, :, 2]
            coord_2d = iu.get_2d_coord(im_w, im_h)  # (2, H, W)
            roi_coord = iu.crop_resize_by_warp_affine(
                coord_2d.transpose(1, 2, 0), center, scale, s).transpose(2, 0, 1)
            mask_target = (mask == inst_id).astype(np.float32)
            roi_mask = iu.crop_resize_by_warp_affine(mask_target, center, scale, s)
            roi_depth = iu.crop_resize_by_warp_affine(depth.astype(np.float32),
                                                      center, scale, s)
            if np.sum(roi_depth > 0) <= 1:
                return retry()
            if np.sum((roi_mask > 0) & (roi_depth > 0)) <= 1:
                return retry()

        cat_id = int(gts["class_ids"][idx]) - 1  # 0-based
        model = self.models[gts["model_list"][idx]].astype(np.float32)
        nocs_scale = float(gts["scales"][idx])
        fsnet_scale, mean_shape = sym_tab.fs_net_scale(
            self.id2cat_name[str(cat_id + 1)], model, nocs_scale)
        rotation = np.asarray(gts["rotations"][idx], np.float32)
        translation = np.asarray(gts["translations"][idx], np.float32)

        roi_mask_def = iu.defor_2d_mask(rng, roi_mask, self.cfg.roi_mask_r,
                                        self.cfg.roi_mask_pro)

        sym_info = sym_tab.sym_info(self.id2cat_name[str(cat_id + 1)], mug_handle)
        aug_bb, aug_rt_t, aug_rt_r = generate_aug_parameters(rng)

        sample = {
            "cat_id": np.float32(cat_id),
            "rotation": rotation,
            "translation": translation,
            "fsnet_scale": fsnet_scale.astype(np.float32),
            "sym_info": sym_info.astype(np.float32),
            "mean_shape": mean_shape.astype(np.float32),
            "aug_bb": aug_bb,
            "aug_rt_t": aug_rt_t,
            "aug_rt_R": aug_rt_r,
            "model_point": model,
            "nocs_scale": np.float32(nocs_scale),
        }

        if self.sample_mode == "device":
            sample["roi_depth"] = roi_depth.astype(np.float32)
            sample["roi_mask"] = roi_mask_def.astype(np.float32)
            sample["roi_coord"] = roi_coord.astype(np.float32)
            sample["cam_k"] = cam_k
        else:
            pcl = host_depth_to_pcl(roi_depth, cam_k, roi_coord, roi_mask_def)
            if len(pcl) < 50:  # load_data.py:276-277
                return retry()
            sample["pcl_in"] = host_sample_points(rng, pcl / 1000.0,
                                                  self.cfg.num_points)
        return sample


def host_depth_to_pcl(roi_depth, cam_k, roi_coord, roi_mask) -> np.ndarray:
    """Host back-projection (load_data.py:322-333), output in mm.

    The native one-pass implementation (native/preproc.cpp::hsp_backproject) is
    bit-exact vs this numpy path (tests/test_native_preproc.py) and used when
    available; numpy is the fallback and the semantics reference."""
    pcl = npp.backproject(roi_depth, cam_k, roi_coord, roi_mask)
    if pcl is not None:
        return pcl
    fx, fy = cam_k[0, 0], cam_k[1, 1]
    cx, cy = cam_k[0, 2], cam_k[1, 2]
    depth = roi_depth.reshape(-1).astype(np.float64)
    valid = ((depth > 0) * roi_mask.reshape(-1)) > 0
    depth = depth[valid]
    x_map = roi_coord[0].reshape(-1)[valid]
    y_map = roi_coord[1].reshape(-1)[valid]
    real_x = (x_map - cx) * depth / fx
    real_y = (y_map - cy) * depth / fy
    return np.stack((real_x, real_y, depth), axis=-1).astype(np.float32)


def host_sample_points(rng: np.random.Generator, pcl: np.ndarray, n_pts: int):
    """Random down/up-sampling to a fixed count (load_data.py:307-320)."""
    total = pcl.shape[0]
    if total < n_pts:
        pcl = np.concatenate([np.tile(pcl, (n_pts // total, 1)),
                              pcl[:n_pts % total]], axis=0)
    elif total > n_pts:
        ids = rng.permutation(total)[:n_pts]
        pcl = pcl[ids]
    return pcl


def generate_aug_parameters(rng: np.random.Generator, s_range=(0.8, 1.2), ax=50,
                            ay=50, az=50, a=15.0):
    """Per-sample augmentation parameters (load_data.py:334-345): bb scales in
    [0.8, 1.2], ±15° Euler rotation, ±50 mm translation (metres out)."""
    lo, hi = s_range
    ex, ey, ez = rng.random(3) * (hi - lo) + lo
    angles = rng.uniform(-a, a, 3)
    Rm = euler_rotation(*angles)
    d = rng.random(3) * 2 * np.array([ax, ay, az]) - np.array([ax, ay, az])
    return (np.array([ex, ey, ez], np.float32), (d / 1000.0).astype(np.float32), Rm)


def euler_rotation(x_deg, y_deg, z_deg) -> np.ndarray:
    """R = Rz · Ry · Rx from degree angles (data_augmentation.get_rotation :192-208)."""
    x, y, z = np.deg2rad([x_deg, y_deg, z_deg])
    Rx = np.array([[1, 0, 0], [0, np.cos(x), -np.sin(x)], [0, np.sin(x), np.cos(x)]])
    Ry = np.array([[np.cos(y), 0, np.sin(y)], [0, 1, 0], [-np.sin(y), 0, np.cos(y)]])
    Rz = np.array([[np.cos(z), -np.sin(z), 0], [np.sin(z), np.cos(z), 0], [0, 0, 1]])
    return (Rz @ Ry @ Rx).astype(np.float32)


def _collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def _make_batch_from(dataset: PoseTrainDataset, seed: int, step: int,
                     batch_size: int) -> Dict[str, np.ndarray]:
    """The (seed, step) -> batch function every loader mode shares."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, step]))
    samples = []
    while len(samples) < batch_size:
        s = dataset.get_sample(dataset.sample_index(rng), rng)
        if s is not None:
            samples.append(s)
    return _collate(samples)


# Measured host-pipeline throughput per worker core (docs/PERFORMANCE.md
# "Host data pipeline": 5.4 ms/sample with the native fused preprocessing on
# this rig's core class ⇒ ~121 samples/s/core).  Used only for sizing
# heuristics and starvation warnings, never for correctness.
WORKER_SAMPLES_PER_SEC = 121.0

# Measured TPU train-step consumption rates (docs/PERFORMANCE.md training
# batch sweep — samples/s is ~flat in batch size on one chip)
_STEP_SAMPLES_PER_SEC = {"bfloat16": 468.0, "float32": 258.0, "f32x2": 258.0}


def estimated_step_rate(compute_dtype: str, n_chips: int = 1) -> float:
    """Projected device consumption in samples/s for the starvation check."""
    return _STEP_SAMPLES_PER_SEC.get(compute_dtype, 258.0) * max(n_chips, 1)


def resolve_num_workers(num_workers: int,
                        step_samples_per_sec: Optional[float] = None,
                        logger=None) -> int:
    """Resolve ``data.num_workers`` (-1 = auto-size from host cores).

    Auto mode uses ``os.cpu_count() - 1`` (one core stays with the main
    process for dispatch/collation), floored at 1 — the analog of the
    reference's hardcoded ``num_workers=20`` (engine/train.py:65-69) that
    actually fits the machine it runs on.  An explicit value is honored
    verbatim.  When ``step_samples_per_sec`` is given (the measured TPU step
    consumption), warns if the pool's projected throughput
    (workers × ~121 samples/s/core) cannot feed it.
    """
    if num_workers >= 0:
        resolved = num_workers
    else:
        cores = os.cpu_count() or 1
        resolved = max(cores - 1, 1)
    if step_samples_per_sec and logger is not None:
        projected = max(resolved, 1) * WORKER_SAMPLES_PER_SEC
        if projected < step_samples_per_sec:
            import math
            need = math.ceil(step_samples_per_sec / WORKER_SAMPLES_PER_SEC)
            logger.warning(
                "loader pool of %d worker(s) projects ~%.0f samples/s "
                "(~%.0f/s/core measured) but the device step consumes "
                "~%.0f samples/s — the host will starve the chip; need "
                "~%d workers (host has %s cores)",
                resolved, projected, WORKER_SAMPLES_PER_SEC,
                step_samples_per_sec, need, os.cpu_count())
    return resolved


_WORKER_DS: Optional[PoseTrainDataset] = None


def _worker_init(cfg: DataConfig, mode: str, sample_mode: str) -> None:
    global _WORKER_DS
    # workers never touch an accelerator; pin jax (imported transitively via the
    # package __init__) to CPU before any backend could initialize
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    _WORKER_DS = PoseTrainDataset(cfg, mode, sample_mode)


def _worker_make_batch(args):
    seed, step, batch_size = args
    return step, _make_batch_from(_WORKER_DS, seed, step, batch_size)


def make_worker_pool(cfg: DataConfig, mode: str = "train",
                     sample_mode: str = "host",
                     num_workers: Optional[int] = None):
    """Spawn the persistent data-loader worker pool (the reference's
    ``num_workers=20`` DataLoader processes, engine/train.py:65-69).

    Each worker builds its own ``PoseTrainDataset`` once and serves batches for
    the life of the pool (reuse it across epochs — spawn + dataset construction
    is paid once).  Close with ``pool.terminate()``.
    """
    n = resolve_num_workers(num_workers if num_workers is not None
                            else cfg.num_workers)
    ctx = multiprocessing.get_context("spawn")
    return ctx.Pool(max(n, 1), initializer=_worker_init,
                    initargs=(cfg, mode, sample_mode))


def pool_batches(pool, batch_size: int, steps: int, seed: int,
                 prefetch: int = 4,
                 batch_timeout: float = 300.0) -> Iterator[Dict[str, np.ndarray]]:
    """In-order batch stream from a :func:`make_worker_pool` pool, with a bounded
    window of in-flight batches.  Identical stream to the sync/thread modes.

    ``batch_timeout`` bounds the wait for any single batch: a worker that hangs
    (NFS stall, deadlocked decode) raises a TimeoutError naming the step
    instead of stalling a 150-epoch run silently; a worker that *dies* raises
    with the worker traceback attached (same as the reference DataLoader)."""
    window = prefetch + getattr(pool, "_processes", 4)
    pending: Dict[int, object] = {}
    submitted = 0
    for i in range(steps):
        while submitted < steps and (submitted - i) < window:
            pending[submitted] = pool.apply_async(
                _worker_make_batch, ((seed, submitted, batch_size),))
            submitted += 1
        try:
            step, batch = pending.pop(i).get(timeout=batch_timeout)
        except multiprocessing.TimeoutError as e:
            raise TimeoutError(
                f"data worker produced no batch for step {i} within "
                f"{batch_timeout:.0f}s (seed={seed}); the loader pool may be "
                f"wedged — check worker logs / data source") from e
        assert step == i
        yield batch


def train_batches(dataset: PoseTrainDataset, batch_size: int, steps: int,
                  seed: int, num_workers: int = 4,
                  prefetch: int = 4, pool=None) -> Iterator[Dict[str, np.ndarray]]:
    """Batch iterator with replacement sampling.

    Yields ``steps`` batches; per-batch RNG derives from (seed, batch index) so
    the stream is reproducible independent of loader mode and scheduling.
    Pass a :func:`make_worker_pool` ``pool`` for process workers (fastest, the
    train loop's default); ``num_workers>0`` uses prefetch threads;
    ``num_workers=0`` is fully synchronous.
    """
    if pool is not None:
        yield from pool_batches(pool, batch_size, steps, seed, prefetch)
        return

    def make_batch(step: int) -> Dict[str, np.ndarray]:
        return _make_batch_from(dataset, seed, step, batch_size)

    if num_workers <= 0:
        for i in range(steps):
            yield make_batch(i)
        return

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()
    idx_lock = threading.Lock()
    next_idx = [0]
    results: Dict[int, Dict[str, np.ndarray]] = {}
    results_lock = threading.Lock()
    results_cv = threading.Condition(results_lock)

    def worker():
        while not stop.is_set():
            with idx_lock:
                i = next_idx[0]
                if i >= steps:
                    return
                next_idx[0] = i + 1
            batch = make_batch(i)
            with results_cv:
                while len(results) >= prefetch + num_workers and not stop.is_set():
                    results_cv.wait(0.1)
                results[i] = batch
                results_cv.notify_all()

    threads = [threading.Thread(target=worker, daemon=True) for _ in range(num_workers)]
    for t in threads:
        t.start()
    try:
        for i in range(steps):
            with results_cv:
                while i not in results:
                    results_cv.wait(0.1)
                batch = results.pop(i)
                results_cv.notify_all()
            yield batch
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=1.0)
