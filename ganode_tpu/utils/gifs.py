"""Qualitative sampling: the n x n animated GIF grid, the reference's primary
training signal (reference mnist_moco_ode.py:31-48 genSamples via skvideo).
PIL-backed — no FFmpeg dependency on the training host.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def video_grid(videos: np.ndarray, n: Optional[int] = None) -> np.ndarray:
    """(n*n, T, H, W, C) in [-1, 1] -> (T, n*H, n*W, C) uint8 grid."""
    videos = np.asarray(videos)
    count, t, h, w, c = videos.shape
    n = n or int(np.sqrt(count))
    assert n * n <= count
    grid = np.zeros((t, n * h, n * w, c), videos.dtype)
    for j in range(n):
        for k in range(n):
            grid[:, h * j:h * (j + 1), w * k:w * (k + 1), :] = videos[j * n + k]
    grid = (grid + 1.0) / 2.0 * 255.0
    return np.clip(grid, 0, 255).astype(np.uint8)


def write_gif(path: str, frames: np.ndarray, *, fps: int = 8):
    """frames: (T, H, W, C) uint8 (C in {1, 3})."""
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if frames.shape[-1] == 1:
        frames = np.repeat(frames, 3, axis=-1)
    images = [Image.fromarray(f) for f in frames]
    images[0].save(
        path, save_all=True, append_images=images[1:],
        duration=int(1000 / fps), loop=0,
    )
    return path


def save_sample_grid(path: str, videos, n: Optional[int] = None, fps: int = 8):
    """One call matching the reference genSamples layout: 8x8 grid GIF."""
    return write_gif(path, video_grid(np.asarray(videos), n), fps=fps)
