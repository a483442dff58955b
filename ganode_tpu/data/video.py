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


def default_resize_geometry(image_size: int) -> Tuple[Tuple[int, int], int]:
    """Scale the reference's 64 -> resize(64, 85) + x-crop[10:74] recipe
    (reference dataset/ucf101new.py:31,73-78) proportionally to any output size:
    128 -> resize(128, 170) + x-crop[20:148]. Returns ((h, w), x_offset)."""
    w = int(round(image_size * 85 / 64))
    x_offset = int(round(image_size * 10 / 64))
    if x_offset + image_size > w:  # guard tiny sizes against rounding
        x_offset = w - image_size
    return (image_size, w), x_offset


def resize_crop(video: np.ndarray, image_size: int = 64,
                resize_hw: Optional[Tuple[int, int]] = None,
                x_offset: Optional[int] = None) -> np.ndarray:
    """Bicubic resize then x-crop -> (T, image_size, image_size, C).

    Geometry defaults to the reference's spatial pipeline scaled to
    ``image_size`` (see default_resize_geometry); at 64 this is exactly the
    reference's resize(64, 85) + crop x[10:74] (dataset/ucf101new.py:31,73-78).
    """
    _require_cv2()
    default_hw, default_x = default_resize_geometry(image_size)
    h, w = resize_hw if resize_hw is not None else default_hw
    if x_offset is None:
        x_offset = default_x
    if x_offset + image_size > w or h < image_size:
        raise ValueError(
            f"resize geometry (h={h}, w={w}, x_offset={x_offset}) cannot "
            f"produce a {image_size}x{image_size} crop")
    out = np.empty((video.shape[0], h, w, video.shape[-1]), video.dtype)
    for t in range(video.shape[0]):
        out[t] = cv2.resize(video[t], (w, h), interpolation=cv2.INTER_CUBIC)
    return out[:, :, x_offset:x_offset + image_size, :]


def read_video_timestamps(path: str) -> Tuple[np.ndarray, float]:
    """Per-frame presentation timestamps in SECONDS + container fps.

    The pts surface of the reference's vendored reader (reference
    dataset/video/video_utils.py:201-210 pts_convert, :296-315 parallel
    timestamp scan): its VideoClips needed real pts to window variable-
    frame-rate videos. Here timestamps come from FFmpeg via OpenCV's
    CAP_PROP_POS_MSEC after each ``grab()`` (container demux only, no pixel
    decode), so VFR files report their true, non-uniform pts rather than a
    frame_index/fps approximation.
    """
    _require_cv2()
    cap = cv2.VideoCapture(path)
    pts = []
    try:
        fps = float(cap.get(cv2.CAP_PROP_FPS))
        while cap.grab():
            pts.append(cap.get(cv2.CAP_PROP_POS_MSEC) / 1000.0)
    finally:
        cap.release()
    fps = fps if np.isfinite(fps) and fps > 0 else 0.0
    out = np.asarray(pts, np.float64)
    # some containers report POS_MSEC of the NEXT frame or 0 for the first;
    # normalize so pts[0] == 0 like the reference's start-offset handling
    if out.size and out[0] > 0:
        out = out - out[0]
    return out, fps


def read_video_with_info(path: str, start: int = 0,
                         end: Optional[int] = None):
    """(video, audio, info) with the reference reader's return contract
    (reference dataset/video/video_utils.py:117-198 read_video returns video
    frames, audio samples, and an info dict with video_fps/audio_fps).

    video: (T, H, W, C) uint8 RGB frames [start, end] inclusive.
    audio: (0, 0) float32 — ALWAYS empty: this environment has no audio
        decode backend at all (no PyAV, no ffmpeg CLI, no torchaudio;
        OpenCV's VideoCapture is video-only), and no GAN pipeline here or in
        the reference consumes audio. The empty array keeps the tuple shape
        of the reference API; ``info['audio_fps'] is None`` marks the stream
        as absent rather than silent.
    info: {'video_fps': float, 'audio_fps': None,
           'pts': per-returned-frame presentation timestamps (seconds)}.
    """
    video = read_video(path, start, end)
    pts, fps = read_video_timestamps(path)
    stop = start + video.shape[0]
    frame_pts = pts[start:stop]
    if frame_pts.shape[0] != video.shape[0] or (
            frame_pts.size > 1 and np.all(frame_pts[1:] == 0.0)):
        # keep the documented one-pts-per-returned-frame contract even when
        # the demux pass (grab) and the decode pass (read) disagree on frame
        # count (corrupt tail), or when the container doesn't support
        # POS_MSEC (all-zero pts): degrade to frame-index/fps timestamps
        # instead of returning a misaligned or degenerate array
        step = 1.0 / fps if fps > 0 else 1.0
        frame_pts = (start + np.arange(video.shape[0], dtype=np.float64)) * step
    info = {
        "video_fps": fps,
        "audio_fps": None,
        "pts": frame_pts,
    }
    return video, np.zeros((0, 0), np.float32), info


def probe_fps(path: str) -> float:
    """Container-reported frames-per-second (0.0 when unknown)."""
    _require_cv2()
    cap = cv2.VideoCapture(path)
    try:
        fps = float(cap.get(cv2.CAP_PROP_FPS))
    finally:
        cap.release()
    return fps if np.isfinite(fps) and fps > 0 else 0.0


def resample_frame_indices(n_frames: int, original_fps: float,
                           target_fps: Optional[float]) -> np.ndarray:
    """Frame indices that resample an n_frames clip to target_fps.

    Matches the semantics of the reference's VideoClips resampling
    (reference dataset/video/video_utils.py:350-388): the output has
    floor(n_frames * target/original) frames; an integer fps ratio becomes a
    pure stride, otherwise indices are floor(arange(m) * original/target).
    No resampling (target None/<=0 or unknown source fps) is the identity.
    """
    if not target_fps or target_fps <= 0 or not original_fps or original_fps <= 0:
        return np.arange(n_frames, dtype=np.int64)
    step = original_fps / target_fps
    m = int(np.floor(n_frames * target_fps / original_fps))
    m = max(m, 1) if n_frames > 0 else 0
    if float(step).is_integer():
        return np.arange(0, n_frames, int(step), dtype=np.int64)[:m]
    idx = np.floor(np.arange(m, dtype=np.float64) * step).astype(np.int64)
    return np.minimum(idx, max(n_frames - 1, 0))
