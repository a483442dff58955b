"""Host-side video decode (OpenCV/FFmpeg) — the role PyAV played for the reference.

The reference vendored torchvision's PyAV reader (reference
dataset/video/video_utils.py) and paid two costs the packer here eliminates:
(a) UCF101Video decoded EVERY video end-to-end at construction just to learn its
length (reference dataset/ucf101new.py:59-67), and (b) every __getitem__ re-decoded
a random window through FFmpeg. Decode is host-CPU work in both worlds; here it
happens exactly once, offline, into packed uint8 shards the samplers mmap.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import cv2  # OpenCV ships an FFmpeg-backed VideoCapture

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def _require_cv2():
    if not _HAS_CV2:
        raise RuntimeError(
            "video decode requires OpenCV (cv2); install opencv-python or "
            "pre-pack your dataset on a machine that has it")


def probe_length(path: str) -> int:
    """Frame count without decoding (container metadata) — replaces the
    reference's full-decode length probe."""
    _require_cv2()
    cap = cv2.VideoCapture(path)
    try:
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()
    return max(n, 0)


def read_video(path: str, start: int = 0, end: Optional[int] = None) -> np.ndarray:
    """Decode frames [start, end] inclusive -> (T, H, W, C) uint8 RGB.

    Mirrors the reference's read_video frame-index semantics
    (dataset/ucf101new.py:88-90 passes inclusive end frames).
    """
    _require_cv2()
    cap = cv2.VideoCapture(path)
    frames = []
    try:
        if start > 0:
            cap.set(cv2.CAP_PROP_POS_FRAMES, start)
        idx = start
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            idx += 1
            if end is not None and idx > end:
                break
    finally:
        cap.release()
    if not frames:
        return np.zeros((0, 0, 0, 3), np.uint8)
    return np.stack(frames)


def resize_crop(video: np.ndarray, image_size: int = 64,
                resize_hw: Tuple[int, int] = (64, 85), x_offset: int = 10) -> np.ndarray:
    """Bicubic resize to (64, 85) then crop x[10 : 10+64] -> (T, 64, 64, C),
    matching the reference's spatial pipeline (dataset/ucf101new.py:31,73-78)."""
    _require_cv2()
    h, w = resize_hw
    out = np.empty((video.shape[0], h, w, video.shape[-1]), video.dtype)
    for t in range(video.shape[0]):
        out[t] = cv2.resize(video[t], (w, h), interpolation=cv2.INTER_CUBIC)
    return out[:, :, x_offset:x_offset + image_size, :]
