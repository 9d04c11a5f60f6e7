"""Host-side image utilities for the NOCS data pipeline (numpy + cv2).

Covers the reference's ``tools/eval_utils.py`` (``load_depth`` :143-156, ``get_bbox``
:159-187), ``tools/dataset_utils.py`` (coordinate maps :4-22, DZI crop augmentation
:24-61, CenterNet-style warp-affine crop :80-136) and
``datasets/data_augmentation.defor_2D`` (:9-32).  Only PNG decode and the 2D crop
happen on host; back-projection and point sampling are jitted on device
(hspose_tpu.data.preprocess).
"""

from __future__ import annotations

import functools
from typing import Tuple

import cv2
import numpy as np


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_header_dims(path: str) -> Tuple[int, int] | None:
    """(height, width) from a PNG's IHDR header, or None if the file is
    missing/not a PNG/truncated before the header.  Pure-Python analog of the
    native hsp_png_dims — used to validate files whose pixels are never read
    (the color PNG contributes only existence + shape, load_data.py:219-227)
    without paying a full decode."""
    try:
        with open(path, "rb") as f:
            head = f.read(33)
    except OSError:
        return None
    if len(head) < 33 or head[:8] != _PNG_SIG or head[12:16] != b"IHDR":
        return None
    w = int.from_bytes(head[16:20], "big")
    h = int.from_bytes(head[20:24], "big")
    if w <= 0 or h <= 0:
        return None
    return h, w


def png_color_valid(path: str) -> Tuple[int, int] | None:
    """Full structural + CRC integrity validation of a PNG, without decoding.

    The reference fully cv2-decodes the color PNG only to read its shape and
    retry-walks on ANY unreadable file (load_data.py:219-227).  This walks
    every chunk to IEND and CRC-checks the critical ones (IHDR/PLTE/IDAT/IEND)
    — the set libpng hard-fails on (ancillary-chunk CRC errors are warnings in
    libpng's default config, so cv2 accepts those too).  Catches truncation,
    a missing IEND, and any bit corruption of the compressed image data, at
    crc32 speed (~0.1 ms for a VGA color PNG) instead of the ~3 ms inflate +
    defilter of a full decode.  Returns (height, width) or None.
    """
    import zlib

    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    n = len(data)
    # signature + first chunk must be IHDR (libpng errors otherwise)
    if n < 45 or data[:8] != _PNG_SIG or data[12:16] != b"IHDR":
        return None
    pos = 8
    dims = None
    saw_idat = saw_iend = False
    while pos + 12 <= n:
        length = int.from_bytes(data[pos:pos + 4], "big")
        ctype = data[pos + 4:pos + 8]
        end = pos + 8 + length
        if length > 0x7FFFFFFF or end + 4 > n:
            return None  # truncated chunk
        if (ctype[0] & 0x20) == 0:  # critical chunk: CRC must hold
            crc = int.from_bytes(data[end:end + 4], "big")
            if (zlib.crc32(data[pos + 4:end]) & 0xFFFFFFFF) != crc:
                return None
        if ctype == b"IHDR":
            if length != 13 or dims is not None:
                return None
            w = int.from_bytes(data[pos + 8:pos + 12], "big")
            h = int.from_bytes(data[pos + 12:pos + 16], "big")
            if w <= 0 or h <= 0:
                return None
            dims = (h, w)
        elif ctype == b"IDAT":
            saw_idat = True
        elif ctype == b"IEND":
            saw_iend = True
            break
        pos = end + 4
    if dims is None or not saw_idat or not saw_iend:
        return None
    return dims


def load_depth(depth_path: str) -> np.ndarray:
    """Decode a NOCS depth PNG: plain uint16, or RGB-encoded 256*G + B."""
    depth = cv2.imread(depth_path, -1)
    if depth is None:
        raise FileNotFoundError(depth_path)
    if depth.ndim == 3:
        depth16 = depth[:, :, 1].astype(np.int32) * 256 + depth[:, :, 2].astype(np.int32)
        depth16 = np.where(depth16 == 32001, 0, depth16).astype(np.uint16)
        return depth16
    if depth.ndim == 2 and depth.dtype == np.uint16:
        return depth
    raise ValueError(f"unsupported depth format in {depth_path}")


def get_bbox(bbox, img_h: int = 480, img_w: int = 640) -> Tuple[int, int, int, int]:
    """Square crop window snapped to the 40px grid, max 440, clamped to the image
    (tools/eval_utils.py:159-187).  bbox: (y1, x1, y2, x2)."""
    y1, x1, y2, x2 = bbox
    window_size = (max(y2 - y1, x2 - x1) // 40 + 1) * 40
    window_size = min(window_size, 440)
    center = [(y1 + y2) // 2, (x1 + x2) // 2]
    rmin = center[0] - int(window_size / 2)
    rmax = center[0] + int(window_size / 2)
    cmin = center[1] - int(window_size / 2)
    cmax = center[1] + int(window_size / 2)
    if rmin < 0:
        rmax += -rmin
        rmin = 0
    if cmin < 0:
        cmax += -cmin
        cmin = 0
    if rmax > img_h:
        rmin -= rmax - img_h
        rmax = img_h
    if cmax > img_w:
        cmin -= cmax - img_w
        cmax = img_w
    return rmin, rmax, cmin, cmax


@functools.lru_cache(maxsize=8)
def _get_2d_coord_cached(width: int, height: int) -> np.ndarray:
    x = np.linspace(0, width - 1, width, dtype=np.float32)
    y = np.linspace(0, height - 1, height, dtype=np.float32)
    arr = np.asarray(np.meshgrid(x, y))
    # the cached array is shared by every caller in the process: freeze it so an
    # accidental in-place write raises instead of corrupting the map globally
    arr.setflags(write=False)
    return arr


def get_2d_coord(width: int, height: int) -> np.ndarray:
    """(2, H, W) pixel coordinate map (tools/dataset_utils.py:4-22); static per
    image size, so cached (it was ~5% of the per-sample host cost)."""
    return _get_2d_coord_cached(int(width), int(height))


def aug_bbox_dzi(rng: np.random.Generator, bbox_xyxy: np.ndarray, im_h: int, im_w: int,
                 pad_scale: float = 1.5, scale_ratio: float = 0.25,
                 shift_ratio: float = 0.25, dzi_type: str = "uniform"):
    """Dynamic-zoom-in square crop jitter (tools/dataset_utils.py:24-61).
    Returns (center (2,), scale float)."""
    x1, y1, x2, y2 = [float(v) for v in bbox_xyxy]
    cx, cy = 0.5 * (x1 + x2), 0.5 * (y1 + y2)
    bh, bw = y2 - y1, x2 - x1
    if dzi_type.lower() == "uniform":
        s_ratio = 1 + scale_ratio * (2 * rng.random() - 1)
        sh = shift_ratio * (2 * rng.random(2) - 1)
        center = np.array([cx + bw * sh[0], cy + bh * sh[1]])
        scale = max(y2 - y1, x2 - x1) * s_ratio * pad_scale
    elif dzi_type.lower() == "roi10d":
        # shift each box edge by up to ±15% (tools/dataset_utils.py:42-55)
        x1 += bw * rng.uniform(-0.15, 0.15)
        x2 += bw * rng.uniform(-0.15, 0.15)
        y1 += bh * rng.uniform(-0.15, 0.15)
        y2 += bh * rng.uniform(-0.15, 0.15)
        x1 = min(max(x1, 0), im_w)
        x2 = min(max(x2, 0), im_w)
        y1 = min(max(y1, 0), im_h)
        y2 = min(max(y2, 0), im_h)
        center = np.array([0.5 * (x1 + x2), 0.5 * (y1 + y2)])
        scale = max(y2 - y1, x2 - x1) * pad_scale
    else:
        center = np.array([cx, cy])
        scale = max(y2 - y1, x2 - x1)
    scale = min(scale, max(im_h, im_w)) * 1.0
    return center, scale


def bbox_center_scale_eval(bbox_xyxy: np.ndarray, im_h: int, im_w: int):
    """Deterministic eval crop (evaluation/load_data_eval.py:222-228)."""
    x1, y1, x2, y2 = [float(v) for v in bbox_xyxy]
    center = np.array([0.5 * (x1 + x2), 0.5 * (y1 + y2)])
    scale = min(max(y2 - y1, x2 - x1), max(im_h, im_w)) * 1.0
    return center, scale


def _get_affine_transform(center, scale, output_size: int) -> np.ndarray:
    """CenterNet-style source→destination affine (tools/dataset_utils.py:98-136,
    rot=0 specialisation)."""
    center = np.asarray(center, np.float32)
    scale = np.array([scale, scale], np.float32)
    src_dir = np.array([0, scale[0] * -0.5], np.float32)
    dst_dir = np.array([0, output_size * -0.5], np.float32)

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], np.float32)

    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center
    src[1] = center + src_dir
    dst[0] = [output_size * 0.5, output_size * 0.5]
    dst[1] = dst[0] + dst_dir
    src[2] = third(src[0], src[1])
    dst[2] = third(dst[0], dst[1])
    return cv2.getAffineTransform(src, dst)


def crop_resize_by_warp_affine(img: np.ndarray, center, scale, output_size: int,
                               interpolation=cv2.INTER_NEAREST) -> np.ndarray:
    """Square ROI crop via warp-affine (tools/dataset_utils.py:80-96)."""
    trans = _get_affine_transform(center, scale, output_size)
    return cv2.warpAffine(img, trans, (output_size, output_size), flags=interpolation)


def defor_2d_mask(rng: np.random.Generator, roi_mask: np.ndarray, rand_r: int = 3,
                  rand_pro: float = 0.5) -> np.ndarray:
    """Mask boundary noise (datasets/data_augmentation.defor_2D :9-32): with
    probability ``rand_pro``, randomly keep/drop half of the pixels in the
    erode-dilate boundary band."""
    roi_mask = np.squeeze(roi_mask.copy())
    if rng.random() > rand_pro:
        return roi_mask
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2, 2))
    mask = roi_mask.copy()
    mask_erode = cv2.erode(mask, kernel, rand_r)
    mask_dilate = cv2.dilate(mask, kernel, rand_r)
    band = mask_erode != mask_dilate
    n = int(band.sum())
    if n < 1:
        return roi_mask
    change = np.ones(n, dtype=roi_mask.dtype)
    choose = rng.choice(n, n // 2, replace=False)
    change[choose] = 0.0
    roi_mask[band] = change
    roi_mask[roi_mask > 0.0] = 1.0
    return roi_mask
