"""Layout converters between TPU-native channels-last and the reference's torch
channels-first contracts.

Internal compute is NHWC / NTHWC (what XLA:TPU tiles best); the reference API
speaks images (B, C, H, W) and videos (B, C, T, H, W)
(reference models/mocogan.py:271-295, dataset/mnist_rotation.py:28-32).
"""
from __future__ import annotations

import jax.numpy as jnp


def video_to_torch(v):
    """(B, T, H, W, C) -> (B, C, T, H, W)"""
    return jnp.transpose(v, (0, 4, 1, 2, 3))


def video_from_torch(v):
    """(B, C, T, H, W) -> (B, T, H, W, C)"""
    return jnp.transpose(v, (0, 2, 3, 4, 1))


def video_from_tchw(v):
    """(B, T, C, H, W) -> (B, T, H, W, C) — the dataset clip layout."""
    return jnp.transpose(v, (0, 1, 3, 4, 2))


def image_to_torch(x):
    """(B, H, W, C) -> (B, C, H, W)"""
    return jnp.transpose(x, (0, 3, 1, 2))


def image_from_torch(x):
    """(B, C, H, W) -> (B, H, W, C)"""
    return jnp.transpose(x, (0, 2, 3, 1))
