"""Clip-consistent augmentation: one random draw shared by every frame of a clip.

The reference implements this as a ``randomize_parameters()`` protocol on torch
transforms (reference dataset/transform/spatial_transforms.py:33-35,249-253,
336-340 and temporal_transforms.py) — call it once per clip, then apply the same
parameters to all frames. Here the same idea is a *keyed* pure function: each clip
gets one PRNG key; every frame sees parameters derived from that key. Batched via
vmap, jit-compatible, deterministic.

All transforms take/return channels-last arrays; videos are (T, H, W, C).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------- spatial ----

def random_horizontal_flip(key, clip, p: float = 0.5):
    """Flip all frames of the clip together with probability p
    (reference spatial_transforms.py RandomHorizontalFlip)."""
    flip = jax.random.bernoulli(key, p)
    return jnp.where(flip, clip[..., :, ::-1, :], clip)


def center_crop(clip, size: int):
    h, w = clip.shape[-3], clip.shape[-2]
    y0 = (h - size) // 2
    x0 = (w - size) // 2
    return clip[..., y0:y0 + size, x0:x0 + size, :]


def random_crop(key, clip, size: int):
    """One crop window for the whole clip."""
    h, w = clip.shape[-3], clip.shape[-2]
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, h - size + 1)
    x0 = jax.random.randint(kx, (), 0, w - size + 1)
    return jax.lax.dynamic_slice(
        clip,
        (0,) * (clip.ndim - 3) + (y0, x0, 0),
        clip.shape[:-3] + (size, size, clip.shape[-1]),
    )


_CORNER_POSITIONS = ("c", "tl", "tr", "bl", "br")


def corner_crop(clip, size: int, position: str):
    """Deterministic corner/center crop (reference CornerCrop)."""
    h, w = clip.shape[-3], clip.shape[-2]
    coords = {
        "c": ((h - size) // 2, (w - size) // 2),
        "tl": (0, 0),
        "tr": (0, w - size),
        "bl": (h - size, 0),
        "br": (h - size, w - size),
    }
    y0, x0 = coords[position]
    return clip[..., y0:y0 + size, x0:x0 + size, :]


def multi_scale_corner_crop(key, clip, size: int,
                            scales: Sequence[float] = (1.0, 0.84, 0.71, 0.59, 0.5),
                            positions: Sequence[str] = _CORNER_POSITIONS):
    """Pick one (scale, corner) pair for the whole clip, crop, resize to ``size``
    (reference MultiScaleCornerCrop, spatial_transforms.py:300-340)."""
    k_scale, k_pos = jax.random.split(key)
    h, w = clip.shape[-3], clip.shape[-2]
    min_side = min(h, w)
    s_idx = jax.random.randint(k_scale, (), 0, len(scales))
    p_idx = jax.random.randint(k_pos, (), 0, len(positions))

    def branch(scale, pos):
        def run(c):
            crop = int(min_side * scale)
            cropped = corner_crop(c, crop, pos)
            t = cropped.shape[0]
            return jax.image.resize(
                cropped, (t, size, size, cropped.shape[-1]), method="bilinear")
        return run

    def scale_branch(scale):
        return lambda c: jax.lax.switch(
            p_idx, [branch(scale, p) for p in positions], c)

    return jax.lax.switch(s_idx, [scale_branch(s) for s in scales], clip)


def multi_scale_random_crop(key, clip, size: int,
                            scales: Sequence[float] = (1.0, 0.84, 0.71, 0.59, 0.5)):
    """Pick one scale for the clip, crop a random window of that scale, resize to
    ``size`` (reference MultiScaleRandomCrop semantics, bilinear)."""
    k_scale, k_pos = jax.random.split(key)
    h, w = clip.shape[-3], clip.shape[-2]
    min_side = min(h, w)
    idx = jax.random.randint(k_scale, (), 0, len(scales))

    def branch(scale):
        def run(c):
            crop = int(min_side * scale)
            cropped = random_crop(k_pos, c, crop)
            t = cropped.shape[0]
            return jax.image.resize(
                cropped, (t, size, size, cropped.shape[-1]), method="bilinear")
        return run

    return jax.lax.switch(idx, [branch(s) for s in scales], clip)


def normalize(clip, mean, std):
    mean = jnp.asarray(mean).reshape((1,) * (clip.ndim - 1) + (-1,))
    std = jnp.asarray(std).reshape((1,) * (clip.ndim - 1) + (-1,))
    return (clip - mean) / std


# ---------------------------------------------------------------- temporal ----

def loop_padding(clip, size: int):
    """Tile the clip until it has ``size`` frames (reference LoopPadding)."""
    t = clip.shape[0]
    reps = -(-size // t)
    return jnp.tile(clip, (reps,) + (1,) * (clip.ndim - 1))[:size]


def temporal_begin_crop(clip, size: int):
    return loop_padding(clip[:size], size)


def temporal_center_crop(clip, size: int):
    t = clip.shape[0]
    start = max(0, t // 2 - size // 2)
    return loop_padding(clip[start:start + size], size)


def temporal_random_crop(key, clip, size: int):
    """Random window with loop padding for short clips (reference
    TemporalRandomCrop, dataset/transform/temporal_transforms.py:84-112)."""
    t = clip.shape[0]
    max_start = max(0, t - size)
    start = jax.random.randint(key, (), 0, max_start + 1)
    window = jax.lax.dynamic_slice_in_dim(clip, start, min(size, t), axis=0)
    return loop_padding(window, size)


# ---------------------------------------------------------------- pipeline ----

def per_clip(transform: Callable, key, batch):
    """Apply a keyed clip transform independently per batch element — the batch
    analog of 'randomize once per clip'."""
    keys = jax.random.split(key, batch.shape[0])
    return jax.vmap(transform)(keys, batch)


# ------------------------------------------------------------------ targets ----
# Target transforms select fields from a per-sample annotation dict — the
# reference's dataset/transform/target_transforms.py:17-27 verbatim semantics
# (labels in this library are usually served directly by the keyed samplers;
# these cover the reference's loader-protocol parity surface).

def class_label(target: dict):
    """-> target['label'] (reference target_transforms.py ClassLabel)."""
    return target["label"]


def video_id(target: dict):
    """-> target['video_id'] (reference target_transforms.py VideoID)."""
    return target["video_id"]


def compose_targets(*transforms: Callable):
    """Apply several target transforms, returning a list of their results
    (reference target_transforms.py Compose)."""
    def apply(target):
        return [t(target) for t in transforms]
    return apply
