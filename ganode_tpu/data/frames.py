"""Frame-folder datasets: UCF101-style directories of extracted JPEGs, and
generic image-folder sampling.

Covers the reference's legacy loaders (SURVEY.md §2.3 #17, #20):
* ``FrameFolderVideos`` — the reference's first-generation UCF101 loader read
  ``image_{:05d}.jpg`` frames plus an ``n_frames`` count file per video directory
  (reference dataset/ucf101.py:45-56,102-185). Same directory contract here,
  decoded with PIL, served as keyed clip batches.
* ``ImageFolderSampler`` — the reference's generic LSUN/ImageNet/CelebA image
  loader (reference dataset/data_loader.py:28-69): class-per-subdirectory image
  tree -> keyed resized batches in [-1, 1].

Also exposes the ActivityNet/Kinetics normalization constants the reference kept
in dataset/mean.py (SURVEY.md §2.3 #21).
"""
from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import jax
import numpy as np


def get_mean(norm_value: float = 255.0, dataset: str = "activitynet") -> List[float]:
    """Channel means (reference dataset/mean.py:1-14)."""
    if dataset == "activitynet":
        return [114.7748 / norm_value, 107.7354 / norm_value, 99.4750 / norm_value]
    if dataset == "kinetics":
        return [110.63666788 / norm_value, 103.16065604 / norm_value,
                96.29023126 / norm_value]
    raise ValueError(f"unknown dataset {dataset!r}")


def get_std(norm_value: float = 255.0) -> List[float]:
    """Kinetics channel stds (reference dataset/mean.py:17-21)."""
    return [38.7568578 / norm_value, 37.88248729 / norm_value,
            40.02898126 / norm_value]


def _load_image(path: str, size: Optional[int] = None) -> np.ndarray:
    from PIL import Image

    im = Image.open(path).convert("RGB")
    if size is not None:
        im = im.resize((size, size), Image.BICUBIC)
    return np.asarray(im, np.uint8)


class FrameFolderVideos:
    """Dataset of video directories containing image_{:05d}.jpg frames.

    Layout (the reference's jpg-extraction layout, dataset/ucf101.py:102-135):
      root/<class>/<video_id>/image_00001.jpg ...
      root/<class>/<video_id>/n_frames            (one integer)
    """

    def __init__(self, root: str, batch_size: int, *, n_frame: int = 16,
                 image_size: Optional[int] = None, frame_tmpl: str = "image_{:05d}.jpg"):
        self.root = root
        self.batch_size = batch_size
        self.n_frame = n_frame
        self.image_size = image_size
        self.frame_tmpl = frame_tmpl
        self.samples: List[Tuple[str, int, int]] = []  # (dir, n_frames, label)
        self.classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
        for label, cls in enumerate(self.classes):
            cls_dir = os.path.join(root, cls)
            for vid in sorted(os.listdir(cls_dir)):
                vdir = os.path.join(cls_dir, vid)
                nf_file = os.path.join(vdir, "n_frames")
                if os.path.isfile(nf_file):
                    n = int(open(nf_file).read().strip())
                else:
                    n = len([f for f in os.listdir(vdir)
                             if f.startswith("image_") and f.endswith(".jpg")])
                if n >= n_frame:
                    self.samples.append((vdir, n, label))
        if not self.samples:
            raise ValueError(f"no video dirs with >= {n_frame} frames under {root}")

    def _clip(self, vdir: str, start: int) -> np.ndarray:
        frames = [
            _load_image(os.path.join(vdir, self.frame_tmpl.format(start + 1 + i)),
                        self.image_size)
            for i in range(self.n_frame)
        ]
        return np.stack(frames)

    def sample(self, key) -> Tuple[np.ndarray, np.ndarray]:
        k_vid, k_start = jax.random.split(key)
        pick = np.asarray(jax.random.randint(k_vid, (self.batch_size,), 0,
                                             len(self.samples)))
        u = np.asarray(jax.random.uniform(k_start, (self.batch_size,)))
        clips, labels = [], []
        for j, p in enumerate(pick):
            vdir, n, label = self.samples[int(p)]
            start = int(u[j] * (n - self.n_frame + 1))
            clips.append(self._clip(vdir, start))
            labels.append(label)
        clips = np.stack(clips).astype(np.float32)
        return (clips - 128.0) / 128.0, np.asarray(labels)

    def iterate(self, key) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        i = 0
        while True:
            yield self.sample(jax.random.fold_in(key, i))
            i += 1


class ImageFolderSampler:
    """Generic class-per-subdirectory image dataset -> keyed batches in [-1, 1]
    (reference dataset/data_loader.py served LSUN/ImageNet/CelebA this way)."""

    EXTS = (".jpg", ".jpeg", ".png", ".bmp")

    def __init__(self, root: str, batch_size: int, *, image_size: int = 64):
        self.batch_size = batch_size
        self.image_size = image_size
        self.paths: List[str] = []
        self.labels: List[int] = []
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
        if classes:
            for label, cls in enumerate(classes):
                for f in sorted(os.listdir(os.path.join(root, cls))):
                    if f.lower().endswith(self.EXTS):
                        self.paths.append(os.path.join(root, cls, f))
                        self.labels.append(label)
        else:  # flat directory of images
            for f in sorted(os.listdir(root)):
                if f.lower().endswith(self.EXTS):
                    self.paths.append(os.path.join(root, f))
                    self.labels.append(0)
        if not self.paths:
            raise ValueError(f"no images under {root}")
        self.labels = np.asarray(self.labels)

    def sample(self, key) -> Tuple[np.ndarray, np.ndarray]:
        pick = np.asarray(jax.random.randint(key, (self.batch_size,), 0,
                                             len(self.paths)))
        imgs = np.stack([_load_image(self.paths[int(p)], self.image_size)
                         for p in pick]).astype(np.float32)
        return (imgs - 128.0) / 128.0, self.labels[pick]

    def iterate(self, key) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        i = 0
        while True:
            yield self.sample(jax.random.fold_in(key, i))
            i += 1
