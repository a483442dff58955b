"""Rotated-MNIST video builder and samplers.

Rebuilds the reference's offline data prep (reference utils/images.py:101-173) and
its torch Dataset loaders (reference dataset/mnist_rotation.py) as pure-numpy
builders plus infinite, PRNG-keyed batch samplers that feed the device directly.

Builder semantics matched:
* K rotation frames per digit; three modes (reference utils/images.py:107-136):
  - 'normal':   angles linspace(0, 359.99, K) — one full clockwise turn
  - 'rand-end': random end angle in ±(90..360), start at 0
  - 'rsre':     random start in ±90 and random end in ±270
* rotation via scipy.ndimage.rotate(reshape=False, cval=background) on images in
  [-0.5, 0.5] (background -0.5), then per-frame min-max renormalization to [0, 1]
  (reference utils/images.py:166-167).
* output X: (N, K, 784) float, Y: (N,) digit labels; stored as .npz (and loadable
  from the reference's .mat interchange format via scipy.io).

Loader semantics matched (reference dataset/mnist_rotation.py:18-23,57-63):
* train split = first N videos (default 500), test = the rest;
* video sampler yields whole clips, image sampler yields one uniformly-random
  frame per video;
* values stay in [0, 1] exactly as the reference feeds them (a reference quirk:
  real data is [0,1] while the generator emits tanh [-1,1]); pass
  ``value_range=(-1, 1)`` to rescale.
"""
from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import jax
import numpy as np
from scipy import ndimage


def rotate_videos(
    images: np.ndarray,
    labels: np.ndarray,
    *,
    num_frames: int = 16,
    mode: str = "normal",
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """images: (N, 28, 28) float in [-0.5, 0.5] (MNIST rescaled); labels: (N,).

    Returns X (N, K, 784) in [0, 1], Y (N,).
    """
    if mode not in ("normal", "rand-end", "rsre"):
        raise ValueError(f"mode must be normal|rand-end|rsre, got {mode!r}")
    rng = np.random.RandomState(seed)
    n = len(images)
    K = num_frames
    X = np.zeros((n, K, 784), np.float32)
    bg = -0.5

    base_angles = np.linspace(0, 359.99, K)
    for i, img in enumerate(images):
        if mode == "rand-end":
            end = rng.uniform(-269.99, 269.99)
            end = end - 90 if end < 0 else end + 90
            angles = np.linspace(0, end, K)
        elif mode == "rsre":
            start = rng.uniform(-89.99, 89.99)
            end = rng.uniform(-269.99, 269.99)
            angles = np.linspace(start, end, K)
        else:
            angles = base_angles
        for k, angle in enumerate(angles):
            frame = ndimage.rotate(img, angle, reshape=False, cval=bg)
            X[i, k] = frame.reshape(784)

    # per-frame min-max renormalization to [0, 1] (utils/images.py:166-167)
    span = X.max(axis=2, keepdims=True) - X.min(axis=2, keepdims=True)
    X = X / np.maximum(span, 1e-12)
    X = X - X.min(axis=2, keepdims=True)
    return X, np.asarray(labels).reshape(-1)


def load_mnist_idx(data_dir: str, split: str = "train", num: Optional[int] = None):
    """Read raw MNIST idx.gz files (the format the reference downloads,
    utils/images.py:64-94). Returns (images (N,28,28) in [-0.5, 0.5], labels)."""
    import gzip

    prefix = "train" if split == "train" else "t10k"
    img_path = os.path.join(data_dir, f"{prefix}-images-idx3-ubyte.gz")
    lbl_path = os.path.join(data_dir, f"{prefix}-labels-idx1-ubyte.gz")
    with gzip.open(img_path) as f:
        f.read(16)
        data = np.frombuffer(f.read(), np.uint8).astype(np.float32)
    images = (data - 127.5) / 255.0
    images = images.reshape(-1, 28, 28)
    with gzip.open(lbl_path) as f:
        f.read(8)
        labels = np.frombuffer(f.read(), np.uint8).astype(np.int64)
    if num is not None:
        images, labels = images[:num], labels[:num]
    return images, labels


def load_sklearn_digits(num: Optional[int] = None, seed: int = 0):
    """Real handwritten digits without network access: scikit-learn's bundled
    8x8 scans (1797 of them), bicubic-upscaled to MNIST's 28x28 geometry.

    The closest offline stand-in for the MNIST file the reference downloads
    (reference utils/images.py:44-54) — quality metrics computed on datasets
    built from these exercise genuine digit shapes. Returns (images
    (N, 28, 28) float32 in [-0.5, 0.5], labels (N,) int64), shuffled by
    ``seed`` so class order is mixed like true MNIST.
    """
    from sklearn.datasets import load_digits

    d = load_digits()
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(d.images))
    if num is not None and num < len(order):
        order = order[:num]
    small = d.images[order] / 16.0  # (N, 8, 8) in [0, 1]
    labels = d.target[order].astype(np.int64)
    images = np.stack([
        ndimage.zoom(img, 28 / 8, order=3) for img in small
    ]).astype(np.float32)
    return np.clip(images, 0.0, 1.0) - 0.5, labels


def build_rotmnist(
    out_path: str,
    images: np.ndarray,
    labels: np.ndarray,
    *,
    num_frames: int = 16,
    mode: str = "normal",
    seed: int = 0,
    digits: Optional[Tuple[int, ...]] = None,
):
    """Build and save a rotated-MNIST video dataset.

    ``digits`` filters to specific classes (the reference's 3s-only variant,
    rot-mnist-3s.mat, mnist_moco_ode_wgan.py:30 == digits=(3,)).
    """
    labels = np.asarray(labels).reshape(-1)
    if digits is not None:
        keep = np.isin(labels, digits)
        images, labels = images[keep], labels[keep]
    X, Y = rotate_videos(images, labels, num_frames=num_frames, mode=mode, seed=seed)
    np.savez_compressed(out_path, X=X, Y=Y)
    return out_path


def load_rotmnist(path: str, *, train: bool = True, split: int = 500,
                  num_frames: int = 16,
                  digits: Optional[Tuple[int, ...]] = None,
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Load .npz (ours) or .mat (the reference's interchange format). Returns
    videos (N, T, 28, 28, 1) float32 and labels (N,).

    ``digits`` filters to specific classes before the train/test split — a
    mixed-digit file with digits=(3,) behaves exactly like the reference's
    pre-filtered rot-mnist-3s.mat (mnist_moco_ode_wgan.py:30)."""
    if path.endswith(".mat"):
        from scipy.io import loadmat
        data = loadmat(path)
        X = np.asarray(data["X"]).squeeze()
        Y = np.asarray(data["Y"]).squeeze()
    else:
        data = np.load(path)
        X, Y = data["X"], data["Y"]
    X = X.reshape(-1, num_frames, 28, 28, 1).astype(np.float32)
    Y = Y.reshape(-1).astype(np.int64)
    if digits is not None:
        keep = np.isin(Y, digits)
        X, Y = X[keep], Y[keep]
        if len(X) == 0:
            raise ValueError(f"no videos with digits {digits} in {path}")
    if train:
        return X[:split], Y[:split]
    return X[split:], Y[split:]


class RotMNISTVideos:
    """Infinite keyed batch sampler: whole clips (B, T, 28, 28, 1)."""

    def __init__(self, videos: np.ndarray, labels: np.ndarray, batch_size: int,
                 *, value_range: Tuple[float, float] = (0.0, 1.0)):
        self.videos = np.asarray(videos, np.float32)
        self.labels = np.asarray(labels)
        self.batch_size = batch_size
        lo, hi = value_range
        if (lo, hi) != (0.0, 1.0):
            self.videos = self.videos * (hi - lo) + lo

    def sample(self, key) -> Tuple[np.ndarray, np.ndarray]:
        idx = jax.random.randint(key, (self.batch_size,), 0, len(self.videos))
        idx = np.asarray(idx)
        return self.videos[idx], self.labels[idx]

    def iterate(self, key) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        i = 0
        while True:
            yield self.sample(jax.random.fold_in(key, i))
            i += 1


class RotMNISTImages:
    """Infinite keyed batch sampler: one random frame per clip (B, 28, 28, 1)
    (reference dataset/mnist_rotation.py:57-63)."""

    def __init__(self, videos: np.ndarray, labels: np.ndarray, batch_size: int,
                 *, value_range: Tuple[float, float] = (0.0, 1.0)):
        self.videos = np.asarray(videos, np.float32)
        self.labels = np.asarray(labels)
        self.batch_size = batch_size
        lo, hi = value_range
        if (lo, hi) != (0.0, 1.0):
            self.videos = self.videos * (hi - lo) + lo
        self.T = self.videos.shape[1]

    def sample(self, key) -> Tuple[np.ndarray, np.ndarray]:
        k_vid, k_frame = jax.random.split(key)
        idx = np.asarray(jax.random.randint(k_vid, (self.batch_size,), 0,
                                            len(self.videos)))
        frames = np.asarray(jax.random.randint(k_frame, (self.batch_size,), 0,
                                               self.T))
        return self.videos[idx, frames], self.labels[idx]

    def iterate(self, key) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        i = 0
        while True:
            yield self.sample(jax.random.fold_in(key, i))
            i += 1
